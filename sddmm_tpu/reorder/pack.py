"""Device packing: the TPU-native equivalent of the reference's RPHM
("Row-Panel Hybrid Matrix", src/BSMR.cpp:83-265, include/BSMR.hpp:79-159).

The reference packs dense blocks as a BELL-style ``blockValues`` array of
CSR-value indices and scatters WMMA accumulator fragments through it.  On
TPU we invert the data flow so the hot path has **no scatter at all**, and
we pack at MXU/VPU lane granularity into up to three tile families:

- **Supertiles (128 x 128)**: aligned runs of 8 row panels whose dense
  column sets overlap strongly (they are adjacent in *cluster order*, so
  BSMR's own clustering creates this overlap) are merged into 128-row
  tiles over the *union* of their dense columns, chunked 128 columns at a
  time.  Each B column is then gathered once per 128 rows instead of once
  per 16 — the TPU counterpart of the L2-cache reuse GPUs get for free.
  Entries whose column is in the union but was residual for their own
  sub-panel ride along in the tile for free.  A byte-cost model decides
  per run whether merging pays off.
- **Groups (16 x 128)**: unmerged panels pack their 16x16 logical dense
  blocks 8-at-a-time into lane-width tiles.
- **Residual**: per-nnz gather-dot COO.

The framework's native output layout ("packed order") is the flat vector
[supertiles ++ group tiles ++ residual]; CSR entry order is an explicit
conversion through a precomputed permutation (every CSR index appears in
exactly one packed slot — the invariant the reference's check_rphm
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
SUPER_ROWS = 128
SUPER_CELLS = SUPER_ROWS * GROUP_LANES                           # 16384
PANELS_PER_SUPER = SUPER_ROWS // config.ROW_PANEL_SIZE           # 8

# Byte-cost-per-128-column-chunk of each family (B gather + A gather +
# output write, fp32): supertile = (128+128+128)*512B/col-chunk, group =
# (128+16+16)*... — expressed per column: super 1536 B/col, group 640 B/col.
_COST_SUPER_PER_COL = (128 + 128 + 128) * 4
_COST_GROUP_PER_COL = (128 + 16 + 16) * 4


@dataclasses.dataclass
class PackedMatrix:
    """Packed BSMR matrix ready for the hybrid TPU SDDMM."""

    m: int
    n: int
    k_hint: int  # informational; packing is K-independent
    nnz: int
    num_panels: int
    num_blocks: int   # real (unpadded) 16x16 dense blocks, for stats
    num_super: int    # (128, 128) supertiles
    num_groups: int   # (16, 128) dense groups

    # (num_panels * 16,) original row id per reordered slot; sentinel = m.
    a_row_gather: np.ndarray
    # Supertile family.
    super_rows: np.ndarray   # (nS, 128) original row ids (sentinel m)
    super_cols: np.ndarray   # (nS, 128) original col ids (sentinel n)
    super_csr: np.ndarray    # (nS, 128, 128) CSR index or -1
    # Group family.
    group_rows: np.ndarray   # (nG, 16) original row ids (sentinel m)
    group_cols: np.ndarray   # (nG, 128) original col ids (sentinel n)
    group_csr: np.ndarray    # (nG, 16, 128) CSR index or -1
    # Residual COO (absolute ids).
    res_rows: np.ndarray   # (nnz_res,) original row ids
    res_cols: np.ndarray   # (nnz_res,) original col ids
    res_csr: np.ndarray    # (nnz_res,) CSR value index
    # (nnz,) position of each CSR entry in the packed flat vector.
    inv_idx: np.ndarray
    # Packed-order metadata over the flat vector (see module docstring).
    packed_rows: np.ndarray  # (F,) int32
    packed_cols: np.ndarray  # (F,) int32
    csr_dest: np.ndarray     # (F,) int64

    @property
    def packed_size(self) -> int:
        return (self.num_super * SUPER_CELLS
                + self.num_groups * GROUP_CELLS + self.nnz_res)

    @property
    def nnz_dense(self) -> int:
        return self.nnz - len(self.res_rows)

    @property
    def nnz_res(self) -> int:
        return int(len(self.res_rows))

    @property
    def average_block_density(self) -> float:
        """nnz density over dense tile cells (reference metric analogue,
        src/BSMR.cpp:334-442)."""
        cells = self.num_super * SUPER_CELLS + self.num_groups * GROUP_CELLS
        return self.nnz_dense / cells if cells else 0.0


def _pad_cols(cols: np.ndarray, n: int, multiple: int) -> np.ndarray:
    pad = (-len(cols)) % multiple
    if pad:
        return np.concatenate([cols, np.full(pad, n, dtype=cols.dtype)])
    return cols


def pack(csr: CSR, bsmr: BSMR, k_hint: int = 0,
         merge_superpanels: bool = True) -> PackedMatrix:
    panel_sz = config.ROW_PANEL_SIZE
    m, n = csr.shape
    reordered = bsmr.reordered_rows
    num_panels = bsmr.num_row_panels
    dco = bsmr.dense_col_offsets
    row_ptr, col_idx = csr.row_ptr, csr.col_idx

    # Reordered row slots, padded with sentinel m.
    a_row_gather = np.full(num_panels * panel_sz, m, dtype=np.int32)
    a_row_gather[:len(reordered)] = reordered

    num_blocks = int(
        np.diff(dco).astype(np.int64).sum() // config.BLOCK_COL_SIZE)

    # Per-panel real dense column lists.
    panel_dense: list[np.ndarray] = []
    for p in range(num_panels):
        pd = bsmr.dense_cols[dco[p]:dco[p + 1]]
        panel_dense.append(pd[pd != n].astype(np.int64))

    # Decide which aligned 8-panel runs merge into supertiles.
    num_runs = (num_panels + PANELS_PER_SUPER - 1) // PANELS_PER_SUPER
    merged_run = np.zeros(num_runs, dtype=bool)
    unions: list[Optional[np.ndarray]] = [None] * num_runs
    if merge_superpanels:
        for run in range(num_runs):
            ps = range(run * PANELS_PER_SUPER,
                       min((run + 1) * PANELS_PER_SUPER, num_panels))
            lists = [panel_dense[p] for p in ps]
            total = sum(len(c) for c in lists)
            if total == 0:
                continue
            union = np.unique(np.concatenate(lists))
            cu_pad = -(-len(union) // GROUP_LANES) * GROUP_LANES
            sum_cp_pad = sum(
                -(-len(c) // GROUP_LANES) * GROUP_LANES for c in lists
                if len(c))
            if (_COST_SUPER_PER_COL * cu_pad
                    < _COST_GROUP_PER_COL * sum_cp_pad):
                merged_run[run] = True
                unions[run] = union

    # --- Supertile family ---
    super_chunks = []  # (run, chunk_cols) per 128-col chunk
    for run in np.nonzero(merged_run)[0]:
        u = _pad_cols(unions[run], n, GROUP_LANES)
        for c0 in range(0, len(u), GROUP_LANES):
            super_chunks.append((run, u[c0:c0 + GROUP_LANES]))
    num_super = len(super_chunks)
    super_rows = np.full((num_super, SUPER_ROWS), m, dtype=np.int64)
    super_cols = np.full((num_super, GROUP_LANES), n, dtype=np.int64)
    super_csr = np.full((num_super, SUPER_ROWS, GROUP_LANES),
                        config.NULL_INDEX, dtype=np.int64)
    run_super_base = {}  # run -> first supertile index
    for s, (run, chunk) in enumerate(super_chunks):
        if run not in run_super_base:
            run_super_base[run] = s
        r0 = run * SUPER_ROWS
        rows = a_row_gather[r0:r0 + SUPER_ROWS]
        super_rows[s, :len(rows)] = rows
        super_cols[s] = chunk

    # --- Group family (unmerged panels) ---
    group_panels = []  # (panel, chunk_cols)
    panel_group_base = {}  # panel -> first group index
    for p in range(num_panels):
        if merged_run[p // PANELS_PER_SUPER]:
            continue
        pd = _pad_cols(panel_dense[p], n, GROUP_LANES)
        if len(pd):
            panel_group_base[p] = len(group_panels)
        for c0 in range(0, len(pd), GROUP_LANES):
            group_panels.append((p, pd[c0:c0 + GROUP_LANES]))
    num_groups = len(group_panels)
    group_rows = np.full((num_groups, panel_sz), m, dtype=np.int64)
    group_cols = np.full((num_groups, GROUP_LANES), n, dtype=np.int64)
    group_csr = np.full((num_groups, panel_sz, GROUP_LANES),
                        config.NULL_INDEX, dtype=np.int64)
    for g, (p, chunk) in enumerate(group_panels):
        rows = a_row_gather[p * panel_sz:(p + 1) * panel_sz]
        group_rows[g, :len(rows)] = rows
        group_cols[g] = chunk

    # --- Fill CSR indices; collect residual (vectorized sort-join) ---
    # Each nnz entry is looked up in its container's column table: merged
    # entries join on (run, col) against the union lists, unmerged on
    # (panel, col) against the per-panel dense lists.  Containers share one
    # key space: run ids [0, num_runs) then num_runs + panel.
    dense_slots_super = num_super * SUPER_CELLS

    # Column table: (container, col) -> (tile_index, lane).
    tab_cont_l, tab_col_l, tab_tile_l, tab_lane_l = [], [], [], []
    for run in np.nonzero(merged_run)[0]:
        u = unions[run]
        pos = np.arange(len(u), dtype=np.int64)
        tab_cont_l.append(np.full(len(u), run, dtype=np.int64))
        tab_col_l.append(u)
        tab_tile_l.append(run_super_base[run] + pos // GROUP_LANES)
        tab_lane_l.append(pos % GROUP_LANES)
    for p, gbase in panel_group_base.items():
        pd = panel_dense[p]
        pos = np.arange(len(pd), dtype=np.int64)
        tab_cont_l.append(np.full(len(pd), num_runs + p, dtype=np.int64))
        tab_col_l.append(pd)
        tab_tile_l.append(gbase + pos // GROUP_LANES)
        tab_lane_l.append(pos % GROUP_LANES)

    def cat(parts, dtype=np.int64):
        return (np.concatenate(parts).astype(dtype) if parts
                else np.zeros(0, dtype=dtype))

    tab_cont = cat(tab_cont_l)
    tab_col = cat(tab_col_l)
    tab_tile = cat(tab_tile_l)
    tab_lane = cat(tab_lane_l)
    tab_key = tab_cont * (n + 1) + tab_col
    order_t = np.argsort(tab_key)
    tab_key = tab_key[order_t]
    tab_tile = tab_tile[order_t]
    tab_lane = tab_lane[order_t]

    # Per-entry container / local coordinates.
    rpos = np.full(m, -1, dtype=np.int64)
    rpos[reordered] = np.arange(len(reordered))
    entry_rows = csr.row_indices().astype(np.int64)
    er = rpos[entry_rows]
    panel_e = er // panel_sz
    local_e = er % panel_sz
    run_e = panel_e // PANELS_PER_SUPER
    merged_e = merged_run[run_e] if num_runs else np.zeros(0, dtype=bool)
    cont_e = np.where(merged_e, run_e, num_runs + panel_e)
    ekey = cont_e * (n + 1) + col_idx.astype(np.int64)

    if len(tab_key):
        j = np.searchsorted(tab_key, ekey)
        j_clip = np.minimum(j, len(tab_key) - 1)
        matched = tab_key[j_clip] == ekey
        tile_e = tab_tile[j_clip]
        lane_e = tab_lane[j_clip]
    else:
        matched = np.zeros(csr.nnz, dtype=bool)
        tile_e = np.zeros(csr.nnz, dtype=np.int64)
        lane_e = np.zeros(csr.nnz, dtype=np.int64)

    local128 = (panel_e % PANELS_PER_SUPER) * panel_sz + local_e
    slot = np.where(
        merged_e,
        tile_e * SUPER_CELLS + local128 * GROUP_LANES + lane_e,
        dense_slots_super + tile_e * GROUP_CELLS
        + local_e * GROUP_LANES + lane_e)

    entry_idx = np.arange(csr.nnz, dtype=np.int64)
    sm = matched & merged_e
    gm = matched & ~merged_e
    super_csr.reshape(-1)[slot[sm]] = entry_idx[sm]
    group_csr.reshape(-1)[slot[gm] - dense_slots_super] = entry_idx[gm]

    rest = ~matched
    res_rows = entry_rows[rest]
    res_cols = col_idx[rest].astype(np.int64)
    res_csr = entry_idx[rest]

    # Inverse permutation: CSR entry -> packed slot.
    inv_idx = np.full(csr.nnz, -1, dtype=np.int64)
    sflat = super_csr.reshape(-1)
    svalid = sflat >= 0
    inv_idx[sflat[svalid]] = np.nonzero(svalid)[0]
    gflat = group_csr.reshape(-1)
    gvalid = gflat >= 0
    inv_idx[gflat[gvalid]] = dense_slots_super + np.nonzero(gvalid)[0]
    dense_slots = dense_slots_super + num_groups * GROUP_CELLS
    inv_idx[res_csr] = dense_slots + np.arange(len(res_csr), dtype=np.int64)
    if np.any(inv_idx < 0):
        missing = int(np.count_nonzero(inv_idx < 0))
        raise AssertionError(
            f"packing lost {missing} CSR entries (invariant violation)")

    # Packed-order metadata.
    def family_meta(csr_arr, rows_arr, cols_arr):
        valid3 = csr_arr >= 0
        slot_rows = np.broadcast_to(rows_arr[:, :, None], csr_arr.shape)
        slot_cols = np.broadcast_to(cols_arr[:, None, :], csr_arr.shape)
        return (np.where(valid3, slot_rows, m).reshape(-1),
                np.where(valid3, slot_cols, n).reshape(-1))

    sr, sc = family_meta(super_csr, super_rows, super_cols)
    gr, gc = family_meta(group_csr, group_rows, group_cols)
    packed_rows = np.concatenate([sr, gr, res_rows])
    packed_cols = np.concatenate([sc, gc, res_cols])
    F = dense_slots + len(res_csr)
    csr_dest = np.full(F, -1, dtype=np.int64)
    csr_dest[inv_idx] = np.arange(csr.nnz)
    spill = csr_dest < 0
    csr_dest[spill] = csr.nnz + np.arange(int(spill.sum()))

    return PackedMatrix(
        m=m, n=n, k_hint=k_hint, nnz=csr.nnz,
        num_panels=num_panels, num_blocks=num_blocks,
        num_super=num_super, num_groups=num_groups,
        a_row_gather=a_row_gather,
        super_rows=super_rows, super_cols=super_cols, super_csr=super_csr,
        group_rows=group_rows.astype(np.int32),
        group_cols=group_cols,
        group_csr=group_csr,
        res_rows=res_rows, res_cols=res_cols, res_csr=res_csr,
        inv_idx=inv_idx,
        packed_rows=packed_rows.astype(np.int32),
        packed_cols=packed_cols.astype(np.int32),
        csr_dest=csr_dest,
    )
