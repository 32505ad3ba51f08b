"""BSMR column reordering: per-panel dense/sparse column split.

Reference: src/colReordering.cu:244-404 (colReordering_cpu +
analysisDescendingOrderColSegment).  Per 16-row panel of the reordered
rows: count nnz per column, order the nonzero columns by descending count,
pad to a multiple of 16 with a sentinel column (= N), then classify each
16-column group as *dense* iff its nnz sum >= ceil(delta * 256).  Because
counts are descending, dense groups form a prefix.  Remaining columns with
nnz > 0 form the *sparse residual* set (the reference's sparse list can
additionally carry zero-count sentinel padding columns — we drop those;
they carry no data).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from sddmm_tpu import config
from sddmm_tpu.data.sparse import CSR


@dataclasses.dataclass
class ColReorderResult:
    num_row_panels: int
    dense_cols: np.ndarray           # concatenated per-panel dense cols (sentinel = n)
    dense_col_offsets: np.ndarray    # (num_panels+1,)
    sparse_cols: np.ndarray          # concatenated per-panel sparse cols
    sparse_col_offsets: np.ndarray   # (num_panels+1,)
    sparse_data_offsets: np.ndarray  # (num_panels+1,) nnz counts in sparse part


def col_reordering(csr: CSR, reordered_rows: np.ndarray,
                   delta: float = config.DEFAULT_DELTA) -> ColReorderResult:
    panel = config.ROW_PANEL_SIZE
    bcol = config.BLOCK_COL_SIZE
    n = csr.n
    num_panels = (len(reordered_rows) + panel - 1) // panel
    threshold = int(math.ceil(delta * config.BLOCK_SIZE))

    dense_lists, sparse_lists = [], []
    dense_counts = np.zeros(num_panels, dtype=np.int64)
    sparse_counts = np.zeros(num_panels, dtype=np.int64)
    sparse_data = np.zeros(num_panels, dtype=np.int64)

    row_ptr, col_idx = csr.row_ptr, csr.col_idx
    for p in range(num_panels):
        rows = reordered_rows[p * panel:(p + 1) * panel]
        segs = [col_idx[row_ptr[r]:row_ptr[r + 1]] for r in rows]
        cols = np.concatenate(segs) if segs else np.zeros(0, dtype=np.int32)
        if len(cols) == 0:
            dense_lists.append(np.zeros(0, dtype=np.int64))
            sparse_lists.append(np.zeros(0, dtype=np.int64))
            continue
        uniq_cols, counts = np.unique(cols, return_counts=True)
        # descending by count, stable with ascending col id as tiebreak
        order = np.lexsort((uniq_cols, -counts))
        uniq_cols = uniq_cols[order].astype(np.int64)
        counts = counts[order]
        # pad to a multiple of BLOCK_COL_SIZE with sentinel col = n, count 0
        pad = (-len(uniq_cols)) % bcol
        if pad:
            uniq_cols = np.concatenate(
                [uniq_cols, np.full(pad, n, dtype=np.int64)])
            counts = np.concatenate([counts, np.zeros(pad, dtype=counts.dtype)])
        group_sums = counts.reshape(-1, bcol).sum(axis=1)
        dense_groups = int(np.count_nonzero(group_sums >= threshold))
        nd = dense_groups * bcol
        dense_lists.append(uniq_cols[:nd])
        rest_cols = uniq_cols[nd:]
        rest_counts = counts[nd:]
        keep = rest_counts > 0
        sparse_lists.append(rest_cols[keep])
        dense_counts[p] = nd
        sparse_counts[p] = int(keep.sum())
        sparse_data[p] = int(rest_counts[keep].sum())

    def offsets(c):
        out = np.zeros(num_panels + 1, dtype=np.int64)
        np.cumsum(c, out=out[1:])
        return out

    return ColReorderResult(
        num_row_panels=num_panels,
        dense_cols=(np.concatenate(dense_lists)
                    if dense_lists else np.zeros(0, dtype=np.int64)),
        dense_col_offsets=offsets(dense_counts),
        sparse_cols=(np.concatenate(sparse_lists)
                     if sparse_lists else np.zeros(0, dtype=np.int64)),
        sparse_col_offsets=offsets(sparse_counts),
        sparse_data_offsets=offsets(sparse_data),
    )
