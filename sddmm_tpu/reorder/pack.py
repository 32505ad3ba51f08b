"""Device packing: the TPU-native equivalent of the reference's RPHM
("Row-Panel Hybrid Matrix", src/BSMR.cpp:83-265, include/BSMR.hpp:79-159).

The reference packs dense blocks as a BELL-style ``blockValues`` array of
CSR-value indices and scatters WMMA accumulator fragments through it.  On
TPU we invert the data flow so the hot path has **no scatter at all**, and
we pack at MXU/VPU lane granularity:

- the 16x16 logical dense blocks of each row panel are fused, 8 at a time,
  into (16, 128) *groups* — 128 = the TPU lane width — so the dense path
  is a batched (16,K)x(K,128) matmul over gathered A-panel rows and B
  columns (per-panel tail blocks are padded with sentinel columns);
- the residual is a per-nnz gather-dot;
- the framework's native output layout ("packed order") is the flat
  vector [group tiles raveled ++ residual]; CSR entry order is an explicit
  conversion through a precomputed permutation (every CSR index appears in
  exactly one packed slot — the same invariant the reference's check_rphm
  verifies, src/BSMR.cpp:639-824).

All index arrays are static-shaped int32; sentinel indices point to an
appended zero row of A / B^T so no masking is needed in the compute path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from sddmm_tpu import config
from sddmm_tpu.data.sparse import CSR
from sddmm_tpu.reorder.bsmr import BSMR

GROUP_LANES = config.DENSE_GROUP_BLOCKS * config.BLOCK_COL_SIZE  # 128
GROUP_CELLS = config.ROW_PANEL_SIZE * GROUP_LANES                # 2048


@dataclasses.dataclass
class PackedMatrix:
    """Packed BSMR matrix ready for the hybrid TPU SDDMM."""

    m: int
    n: int
    k_hint: int  # informational; packing is K-independent
    nnz: int
    num_panels: int
    num_blocks: int   # real (unpadded) 16x16 dense blocks, for stats
    num_groups: int   # (16, 128) dense groups (panel-padded)

    # (num_panels * 16,) original row id per reordered slot; sentinel = m.
    a_row_gather: np.ndarray
    # (num_groups,) panel id of each dense group.
    group_panel: np.ndarray
    # (num_groups, 16) original row ids of the group's panel (sentinel m) —
    # direct gather rows for A, avoiding the panel indirection on device.
    group_rows: np.ndarray
    # (num_groups, 128) original column ids; sentinel = n.
    group_cols: np.ndarray
    # (num_groups, 16, 128) CSR value index per tile cell; sentinel = -1.
    group_csr: np.ndarray
    # Residual COO (absolute ids).
    res_rows: np.ndarray   # (nnz_res,) original row ids
    res_cols: np.ndarray   # (nnz_res,) original col ids
    res_csr: np.ndarray    # (nnz_res,) CSR value index
    # (nnz,) position of each CSR entry in the packed flat vector
    # [group tiles raveled ++ residual].
    inv_idx: np.ndarray
    # Packed-order metadata over the flat vector of length
    # F = num_groups*2048 + nnz_res: original (row, col) per slot with
    # sentinels (m, n) on padding / non-nnz cells, and each slot's CSR
    # destination (non-nnz slots spill to keys nnz..F-1) for sort-based
    # CSR export.
    packed_rows: np.ndarray  # (F,) int32
    packed_cols: np.ndarray  # (F,) int32
    csr_dest: np.ndarray     # (F,) int64

    @property
    def packed_size(self) -> int:
        return self.num_groups * GROUP_CELLS + self.nnz_res

    @property
    def nnz_dense(self) -> int:
        return self.nnz - len(self.res_rows)

    @property
    def nnz_res(self) -> int:
        return int(len(self.res_rows))

    @property
    def average_block_density(self) -> float:
        """nnz density over the real 16x16 dense blocks (reference metric,
        src/BSMR.cpp:334-442)."""
        cells = self.num_blocks * config.BLOCK_SIZE
        return self.nnz_dense / cells if cells else 0.0

    @property
    def group_fill(self) -> float:
        """Fraction of group lanes holding real (non-padding) columns."""
        lanes = self.num_groups * GROUP_LANES
        return (self.num_blocks * config.BLOCK_COL_SIZE / lanes
                if lanes else 0.0)

    def block_densities(self) -> np.ndarray:
        """Per real 16x16 block nnz density, reconstructed from groups."""
        occ = (self.group_csr >= 0).reshape(
            self.num_groups, config.ROW_PANEL_SIZE,
            config.DENSE_GROUP_BLOCKS, config.BLOCK_COL_SIZE)
        per_block = occ.sum(axis=(1, 3)).reshape(-1)  # (nG*8,)
        real = (self.group_cols.reshape(
            self.num_groups, config.DENSE_GROUP_BLOCKS,
            config.BLOCK_COL_SIZE) != self.n).any(axis=2).reshape(-1)
        return per_block[real] / config.BLOCK_SIZE


def pack(csr: CSR, bsmr: BSMR, k_hint: int = 0) -> PackedMatrix:
    panel_sz = config.ROW_PANEL_SIZE
    m, n = csr.shape
    reordered = bsmr.reordered_rows
    num_panels = bsmr.num_row_panels
    dco = bsmr.dense_col_offsets

    # Reordered row slots, padded with sentinel m.
    a_row_gather = np.full(num_panels * panel_sz, m, dtype=np.int32)
    a_row_gather[:len(reordered)] = reordered

    dense_cols_per_panel = np.diff(dco).astype(np.int64)
    num_blocks = int(dense_cols_per_panel.sum() // config.BLOCK_COL_SIZE)
    groups_per_panel = (dense_cols_per_panel + GROUP_LANES - 1) // GROUP_LANES
    num_groups = int(groups_per_panel.sum())
    group_base = np.zeros(num_panels + 1, dtype=np.int64)
    np.cumsum(groups_per_panel, out=group_base[1:])

    group_panel = np.repeat(np.arange(num_panels, dtype=np.int32),
                            groups_per_panel)
    group_cols = np.full((num_groups, GROUP_LANES), n, dtype=np.int32)
    group_rows = a_row_gather.reshape(num_panels, panel_sz)[
        group_panel.astype(np.int64)]
    group_csr = np.full((num_groups, panel_sz, GROUP_LANES),
                        config.NULL_INDEX, dtype=np.int64)
    res_rows_l, res_cols_l, res_csr_l = [], [], []

    row_ptr, col_idx = csr.row_ptr, csr.col_idx
    colpos = np.full(n + 1, -1, dtype=np.int64)  # slot n absorbs sentinels
    for p in range(num_panels):
        rows = reordered[p * panel_sz:(p + 1) * panel_sz]
        pd_cols = bsmr.dense_cols[dco[p]:dco[p + 1]]
        real = pd_cols != n
        colpos[pd_cols[real]] = np.nonzero(real)[0]
        gbase = group_base[p]
        # write this panel's real dense cols into its group lane slots
        pos_all = np.arange(len(pd_cols), dtype=np.int64)
        group_cols[gbase + pos_all // GROUP_LANES,
                   pos_all % GROUP_LANES] = pd_cols
        for local, r in enumerate(rows):
            s, e = row_ptr[r], row_ptr[r + 1]
            cols_r = col_idx[s:e].astype(np.int64)
            idx_r = np.arange(s, e, dtype=np.int64)
            pos = colpos[cols_r]
            dense_mask = pos >= 0
            dpos = pos[dense_mask]
            group_csr[gbase + dpos // GROUP_LANES, local,
                      dpos % GROUP_LANES] = idx_r[dense_mask]
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
    flat = group_csr.reshape(-1)
    valid = flat >= 0
    inv_idx[flat[valid]] = np.nonzero(valid)[0]
    dense_slots = num_groups * GROUP_CELLS
    inv_idx[res_csr] = dense_slots + np.arange(len(res_csr), dtype=np.int64)
    if np.any(inv_idx < 0):
        missing = int(np.count_nonzero(inv_idx < 0))
        raise AssertionError(
            f"packing lost {missing} CSR entries (invariant violation)")

    # Packed-order metadata.
    valid3 = group_csr >= 0  # (nG, 16, 128)
    slot_rows = np.broadcast_to(group_rows[:, :, None], group_csr.shape)
    slot_cols = np.broadcast_to(group_cols[:, None, :], group_csr.shape)
    packed_rows = np.concatenate([
        np.where(valid3, slot_rows, m).reshape(-1), res_rows])
    packed_cols = np.concatenate([
        np.where(valid3, slot_cols, n).reshape(-1), res_cols])
    F = dense_slots + len(res_csr)
    csr_dest = np.full(F, -1, dtype=np.int64)
    csr_dest[inv_idx] = np.arange(csr.nnz)
    spill = csr_dest < 0
    csr_dest[spill] = csr.nnz + np.arange(int(spill.sum()))

    return PackedMatrix(
        m=m, n=n, k_hint=k_hint, nnz=csr.nnz,
        num_panels=num_panels, num_blocks=num_blocks, num_groups=num_groups,
        a_row_gather=a_row_gather,
        group_panel=group_panel,
        group_rows=group_rows.astype(np.int32),
        group_cols=group_cols,
        group_csr=group_csr,
        res_rows=res_rows, res_cols=res_cols, res_csr=res_csr,
        inv_idx=inv_idx,
        packed_rows=packed_rows.astype(np.int32),
        packed_cols=packed_cols.astype(np.int32),
        csr_dest=csr_dest,
    )
