"""Device packing: the TPU-native equivalent of the reference's RPHM
("Row-Panel Hybrid Matrix", src/BSMR.cpp:83-265, include/BSMR.hpp:79-159).

The reference packs dense blocks as a BELL-style ``blockValues`` array of
CSR-value indices and scatters WMMA accumulator fragments through it.  On
TPU we invert the data flow so the hot path has **no scatter at all**:

- dense tiles are computed as a batched (16, K) x (K, 16) matmul over
  gathered A-panels and B-columns,
- the residual is a per-nnz gather-dot,
- the final CSR-ordered value vector is produced by ONE gather through a
  precomputed inverse permutation ``inv_idx`` (every CSR index appears in
  exactly one packed slot — the same invariant the reference's check_rphm
  verifies, src/BSMR.cpp:639-824 — so the inverse mapping is a plain
  permutation extended with dense-tile padding slots).

All arrays are static-shaped int32 jax.Arrays; sentinel indices point to an
appended zero row of A / B^T so no masking is needed in the compute path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from sddmm_tpu import config
from sddmm_tpu.data.sparse import CSR
from sddmm_tpu.reorder.bsmr import BSMR


@dataclasses.dataclass
class PackedMatrix:
    """Packed BSMR matrix ready for the hybrid TPU SDDMM."""

    m: int
    n: int
    k_hint: int  # informational; packing is K-independent
    nnz: int
    num_panels: int
    num_blocks: int

    # (num_panels * 16,) original row id per reordered slot; sentinel = m.
    a_row_gather: np.ndarray
    # (num_blocks,) panel id of each dense block.
    block_panel: np.ndarray
    # (num_blocks, 16) original column ids; sentinel = n.
    block_cols: np.ndarray
    # (num_blocks, 16, 16) CSR value index per tile cell; sentinel = -1.
    block_csr: np.ndarray
    # Residual COO (panel-relative rows are not needed on TPU; absolute ids).
    res_rows: np.ndarray   # (nnz_res,) original row ids
    res_cols: np.ndarray   # (nnz_res,) original col ids
    res_csr: np.ndarray    # (nnz_res,) CSR value index
    # (nnz,) position of each CSR entry in concat([tiles.ravel(), residual]).
    inv_idx: np.ndarray

    @property
    def nnz_dense(self) -> int:
        return self.nnz - len(self.res_rows)

    @property
    def nnz_res(self) -> int:
        return int(len(self.res_rows))

    @property
    def average_block_density(self) -> float:
        cells = self.num_blocks * config.BLOCK_SIZE
        return self.nnz_dense / cells if cells else 0.0

    def block_densities(self) -> np.ndarray:
        return (self.block_csr >= 0).reshape(
            self.num_blocks, -1).mean(axis=1)


def pack(csr: CSR, bsmr: BSMR, k_hint: int = 0) -> PackedMatrix:
    panel_sz = config.ROW_PANEL_SIZE
    bcol = config.BLOCK_COL_SIZE
    m, n = csr.shape
    reordered = bsmr.reordered_rows
    num_panels = bsmr.num_row_panels
    dco = bsmr.dense_col_offsets

    # Reordered row slots, padded with sentinel m.
    a_row_gather = np.full(num_panels * panel_sz, m, dtype=np.int32)
    a_row_gather[:len(reordered)] = reordered

    blocks_per_panel = (np.diff(dco) // bcol).astype(np.int64)
    num_blocks = int(blocks_per_panel.sum())
    block_base = np.zeros(num_panels + 1, dtype=np.int64)
    np.cumsum(blocks_per_panel, out=block_base[1:])

    block_panel = np.repeat(np.arange(num_panels, dtype=np.int32),
                            blocks_per_panel)
    block_cols = (bsmr.dense_cols.reshape(num_blocks, bcol)
                  .astype(np.int32) if num_blocks else
                  np.zeros((0, bcol), dtype=np.int32))

    block_csr = np.full((num_blocks, panel_sz, bcol), config.NULL_INDEX,
                        dtype=np.int64)
    res_rows_l, res_cols_l, res_csr_l = [], [], []

    row_ptr, col_idx = csr.row_ptr, csr.col_idx
    colpos = np.full(n + 1, -1, dtype=np.int64)  # slot n absorbs sentinels
    for p in range(num_panels):
        rows = reordered[p * panel_sz:(p + 1) * panel_sz]
        pd_cols = bsmr.dense_cols[dco[p]:dco[p + 1]]
        real = pd_cols != n
        colpos[pd_cols[real]] = np.nonzero(real)[0]
        base = block_base[p]
        for local, r in enumerate(rows):
            s, e = row_ptr[r], row_ptr[r + 1]
            cols_r = col_idx[s:e].astype(np.int64)
            idx_r = np.arange(s, e, dtype=np.int64)
            pos = colpos[cols_r]
            dense_mask = pos >= 0
            dpos = pos[dense_mask]
            block_csr[base + dpos // bcol, local, dpos % bcol] = \
                idx_r[dense_mask]
            if np.any(~dense_mask):
                res_rows_l.append(np.full(int((~dense_mask).sum()), r,
                                          dtype=np.int64))
                res_cols_l.append(cols_r[~dense_mask])
                res_csr_l.append(idx_r[~dense_mask])
        colpos[pd_cols[real]] = -1  # reset for next panel

    res_rows = (np.concatenate(res_rows_l) if res_rows_l
                else np.zeros(0, dtype=np.int64))
    res_cols = (np.concatenate(res_cols_l) if res_cols_l
                else np.zeros(0, dtype=np.int64))
    res_csr = (np.concatenate(res_csr_l) if res_csr_l
               else np.zeros(0, dtype=np.int64))

    # Inverse permutation: CSR entry -> packed slot.
    inv_idx = np.full(csr.nnz, -1, dtype=np.int64)
    flat = block_csr.reshape(-1)
    valid = flat >= 0
    inv_idx[flat[valid]] = np.nonzero(valid)[0]
    inv_idx[res_csr] = num_blocks * config.BLOCK_SIZE + \
        np.arange(len(res_csr), dtype=np.int64)
    if np.any(inv_idx < 0):
        missing = int(np.count_nonzero(inv_idx < 0))
        raise AssertionError(
            f"packing lost {missing} CSR entries (invariant violation)")

    return PackedMatrix(
        m=m, n=n, k_hint=k_hint, nnz=csr.nnz,
        num_panels=num_panels, num_blocks=num_blocks,
        a_row_gather=a_row_gather,
        block_panel=block_panel,
        block_cols=block_cols,
        block_csr=block_csr.astype(np.int64),
        res_rows=res_rows, res_cols=res_cols, res_csr=res_csr,
        inv_idx=inv_idx,
    )
