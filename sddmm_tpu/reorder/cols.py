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
    """Fully vectorized: one global (panel, col) -> count histogram, one
    lexsort, and segment arithmetic — no per-panel Python loop (the
    reference parallelizes the same loop with OpenMP,
    src/colReordering.cu:292)."""
    panel = config.ROW_PANEL_SIZE
    bcol = config.BLOCK_COL_SIZE
    n = csr.n
    reordered_rows = np.asarray(reordered_rows, dtype=np.int64)
    num_panels = (len(reordered_rows) + panel - 1) // panel
    threshold = int(math.ceil(delta * config.BLOCK_SIZE))

    def offsets(c):
        out = np.zeros(num_panels + 1, dtype=np.int64)
        np.cumsum(c, out=out[1:])
        return out

    if num_panels == 0 or csr.nnz == 0:
        z = np.zeros(0, dtype=np.int64)
        return ColReorderResult(num_panels, z, offsets([]), z,
                                offsets([]), offsets([]))

    # (panel, col) histogram over the entries of the reordered rows.
    row_panel = np.full(csr.m, -1, dtype=np.int64)
    row_panel[reordered_rows] = np.arange(len(reordered_rows)) // panel
    entry_panel = row_panel[csr.row_indices().astype(np.int64)]
    keep = entry_panel >= 0  # rows not in the reordering contribute nothing
    keys = entry_panel[keep] * np.int64(n) + csr.col_idx[keep]
    uniq, counts = np.unique(keys, return_counts=True)
    u_panel = uniq // n
    u_col = uniq % n

    # Per panel: descending count, ascending col as tiebreak.
    order = np.lexsort((u_col, -counts, u_panel))
    u_panel = u_panel[order]
    u_col = u_col[order]
    counts = counts[order]

    # Position of each (panel, col) within its panel.
    cols_per_panel = np.bincount(u_panel, minlength=num_panels).astype(
        np.int64)
    panel_start = offsets(cols_per_panel)
    pos = np.arange(len(u_col), dtype=np.int64) - panel_start[u_panel]

    # 16-col group sums per panel (trailing partial group = zero-padded).
    group_id = u_panel * ((n // bcol) + 1) + pos // bcol
    uniq_g, g_inv = np.unique(group_id, return_inverse=True)
    g_sums = np.bincount(g_inv, weights=counts.astype(np.float64))
    g_panel = (uniq_g // ((n // bcol) + 1)).astype(np.int64)
    g_dense = g_sums >= threshold
    dense_groups_per_panel = np.bincount(
        g_panel[g_dense], minlength=num_panels).astype(np.int64)
    nd_per_panel = dense_groups_per_panel * bcol  # incl sentinel padding

    is_dense = pos < nd_per_panel[u_panel]
    sparse_counts = np.bincount(u_panel[~is_dense],
                                minlength=num_panels).astype(np.int64)
    sparse_data = np.bincount(
        u_panel[~is_dense], weights=counts[~is_dense].astype(np.float64),
        minlength=num_panels).astype(np.int64)

    dense_off = offsets(nd_per_panel)
    sparse_off = offsets(sparse_counts)
    dense_cols = np.full(int(dense_off[-1]), n, dtype=np.int64)
    dense_cols[dense_off[u_panel[is_dense]] + pos[is_dense]] = \
        u_col[is_dense]
    sparse_pos = pos[~is_dense] - nd_per_panel[u_panel[~is_dense]]
    sparse_cols = np.empty(int(sparse_off[-1]), dtype=np.int64)
    sparse_cols[sparse_off[u_panel[~is_dense]] + sparse_pos] = \
        u_col[~is_dense]

    return ColReorderResult(
        num_row_panels=num_panels,
        dense_cols=dense_cols,
        dense_col_offsets=dense_off,
        sparse_cols=sparse_cols,
        sparse_col_offsets=sparse_off,
        sparse_data_offsets=offsets(sparse_data),
    )
