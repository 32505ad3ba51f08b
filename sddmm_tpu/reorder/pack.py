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
  per 16 — the TPU counterpart of the L2-cache reuse GPUs get for free —
  and the batched matmul runs at full MXU height (measured ~5-9x the
  throughput of 16-row tiles at fp32 multi-pass precision).
- **Groups (16 x 128)**: unmerged panels pack their dense columns
  lane-width tiles of 128 columns.
- **Residual**: per-nnz gather-dot COO.

**Gather groups (G)**: columns are optionally pre-clustered by similarity
(reorder/cols.py cluster_columns) and the packing then works in *physical
groups* of G rank-adjacent columns.  The grouped B^T device layout stores
one group per physical row, so one gather descriptor fetches G columns —
this is what makes small-K SDDMM descriptor-rate-viable on TPU (a (1, 32)
fp32 row is a 128-byte descriptor; the gather engine runs ~6x faster on
512-byte ones; see docs/performance.md).

**Residual absorption**: sentinel (padding) lanes in the last column-chunk
of every tile are re-purposed to fetch the panel's highest-count residual
column groups, turning residual nnz (~2*K*4 B each on the gather-dot path)
into free riders on MXU lanes that were already paid for.  Entries whose
column group is fetched by their container for any other reason ride along
automatically.

The framework's native output layout ("packed order") is the flat vector
[supertiles ++ group tiles ++ residual]; CSR entry order is an explicit
conversion through a precomputed permutation (every CSR index appears in
exactly one packed slot — the invariant the reference's check_rphm
verifies, src/BSMR.cpp:639-824).

All index arrays are static-shaped int32; sentinel indices point to an
appended zero row of A / grouped-B^T so no masking is needed in the
compute path.
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
# output write, fp32), expressed per column: super 1536 B/col, group
# 640 B/col — used only for the merge decision inside pack(); the full
# runtime model lives in reorder/autotune.py.
_COST_SUPER_PER_COL = (128 + 128 + 128) * 4
_COST_GROUP_PER_COL = (128 + 16 + 16) * 4
# Measured (TPU v5e): 128-row-tile batched matmuls are ~6x cheaper per
# 16-row group than 16-row tiles at multi-pass fp32 precision, so merging
# is additionally credited with the matmul saving.
_MXU_GROUP16_NS = 87.0     # 16-row tile, fp32 HIGH (11.5 M groups16/s)
_MXU_SUPER16_NS = 18.4     # per 16-row slice of a 128-row tile (54 M/s)


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

    # Gather-group geometry.
    group_size: int          # G: columns per gather descriptor
    num_col_groups: int      # NG: physical rows of the grouped B^T layout
    # (NG*G,) column id stored at each physical slot (sentinel = n); the
    # host builds bt_phys rows from this (reorder/pack.py docstring).
    col_order: np.ndarray

    # (num_panels * 16,) original row id per reordered slot; sentinel = m.
    a_row_gather: np.ndarray
    # Supertile family.
    super_rows: np.ndarray   # (nS, 128) original row ids (sentinel m)
    super_cols: np.ndarray   # (nS, 128) original col ids (sentinel n)
    super_gids: np.ndarray   # (nS, 128/G) physical group row ids (sent NG)
    super_csr: np.ndarray    # (nS, 128, 128) CSR index or -1
    # Group family.
    group_rows: np.ndarray   # (nG, 16) original row ids (sentinel m)
    group_cols: np.ndarray   # (nG, 128) original col ids (sentinel n)
    group_gids: np.ndarray   # (nG, 128/G) physical group row ids (sent NG)
    group_csr: np.ndarray    # (nG, 16, 128) CSR index or -1
    # Residual COO (absolute ids).
    res_rows: np.ndarray     # (nnz_res,) original row ids
    res_cols: np.ndarray     # (nnz_res,) original col ids
    res_gids: np.ndarray     # (nnz_res,) physical group row id of the col
    res_member: np.ndarray   # (nnz_res,) member index of the col in group
    res_csr: np.ndarray      # (nnz_res,) CSR value index
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


def _panel_group_lists(bsmr: BSMR, n: int, num_panels: int):
    """Per-panel dense group-id lists derived from bsmr.dense_cols."""
    G = bsmr.group_size
    dco = bsmr.dense_col_offsets
    out = []
    for p in range(num_panels):
        dc = bsmr.dense_cols[dco[p]:dco[p + 1]]
        if G == 1:
            out.append(dc[dc != n].astype(np.int64))
        else:
            runs = dc.reshape(-1, G)
            real = runs != n
            # every dense group has >= 1 real member; derive its id from
            # the first real member's rank
            first = np.argmax(real, axis=1)
            members = runs[np.arange(len(runs)), first]
            out.append(bsmr.col_rank[members] // G)
    return out


def pack(csr: CSR, bsmr: BSMR, k_hint: int = 0,
         merge_superpanels: bool = True,
         absorb_residual: bool = True) -> PackedMatrix:
    panel_sz = config.ROW_PANEL_SIZE
    m, n = csr.shape
    G = int(bsmr.group_size)
    LG = GROUP_LANES // G            # groups per 128-lane tile chunk
    reordered = bsmr.reordered_rows
    num_panels = bsmr.num_row_panels
    row_ptr, col_idx = csr.row_ptr, csr.col_idx
    NG = (n + G - 1) // G if G > 1 else n

    # Physical column layout: slot g*G+j holds the column with rank g*G+j.
    if G == 1 and bsmr.col_rank is None:
        col_order = np.arange(n, dtype=np.int64)
        col_rank = None
    else:
        col_rank = (bsmr.col_rank if bsmr.col_rank is not None
                    else np.arange(n, dtype=np.int64))
        col_order = np.full(NG * G, n, dtype=np.int64)
        col_order[col_rank] = np.arange(n, dtype=np.int64)

    def gid_of(cols):
        if col_rank is None:
            return cols
        return col_rank[cols] // G

    def member_of(cols):
        if col_rank is None:
            return np.zeros(len(cols), dtype=np.int64)
        return col_rank[cols] % G

    def cols_of_groups(gids):
        """(k, G) member column ids of each group id (sentinel n)."""
        gids = np.asarray(gids, dtype=np.int64)
        if col_rank is None:
            out = np.full((len(gids), 1), n, dtype=np.int64)
            real = gids < n
            out[real, 0] = gids[real]
            return out
        slots = gids[:, None] * G + np.arange(G, dtype=np.int64)[None, :]
        out = np.full(slots.shape, n, dtype=np.int64)
        real = gids < NG
        out[real] = col_order[slots[real]]
        return out

    # Reordered row slots, padded with sentinel m.
    a_row_gather = np.full(num_panels * panel_sz, m, dtype=np.int32)
    a_row_gather[:len(reordered)] = reordered

    num_blocks = int(np.count_nonzero(bsmr.dense_cols != n)
                     // max(config.BLOCK_COL_SIZE, 1))

    panel_groups = _panel_group_lists(bsmr, n, num_panels)

    # --- residual candidates per (panel, group) for absorption ---
    rpos = np.full(m, -1, dtype=np.int64)
    rpos[reordered] = np.arange(len(reordered))
    entry_rows = csr.row_indices().astype(np.int64)
    er = rpos[entry_rows]
    panel_e = np.where(er >= 0, er // panel_sz, -1)
    local_e = np.where(er >= 0, er % panel_sz, 0)
    entry_gid = gid_of(col_idx.astype(np.int64))
    entry_member = member_of(col_idx.astype(np.int64))

    # --- Decide which aligned 8-panel runs merge into supertiles ---
    num_runs = (num_panels + PANELS_PER_SUPER - 1) // PANELS_PER_SUPER
    merged_run = np.zeros(num_runs, dtype=bool)
    unions: list[Optional[np.ndarray]] = [None] * num_runs
    if merge_superpanels:
        for run in range(num_runs):
            ps = range(run * PANELS_PER_SUPER,
                       min((run + 1) * PANELS_PER_SUPER, num_panels))
            lists = [panel_groups[p] for p in ps]
            total = sum(len(c) for c in lists)
            if total == 0:
                continue
            union = np.unique(np.concatenate(lists))
            cu_pad = -(-len(union) // LG) * LG
            sum_cp_pad = sum(-(-len(c) // LG) * LG for c in lists if len(c))
            cost_super = (_COST_SUPER_PER_COL * G * cu_pad
                          + _MXU_SUPER16_NS * 8 * (cu_pad / LG) * 0.8)
            cost_group = (_COST_GROUP_PER_COL * G * sum_cp_pad
                          + _MXU_GROUP16_NS * (sum_cp_pad / LG) * 0.8)
            if cost_super < cost_group:
                merged_run[run] = True
                unions[run] = union

    # --- Absorption bookkeeping: residual (container, gid) counts ---
    # Containers share one key space: run ids [0, num_runs), then
    # num_runs + panel for unmerged panels.
    run_e = np.where(panel_e >= 0, panel_e // PANELS_PER_SUPER, -1)
    merged_e = (merged_run[run_e] & (run_e >= 0)) if num_runs \
        else np.zeros(len(entry_rows), dtype=bool)
    cont_e = np.where(merged_e, run_e, num_runs + panel_e)
    cont_e = np.where(panel_e >= 0, cont_e, -1)

    if absorb_residual:
        # Entries NOT covered by their container's dense groups.
        cont_tables = {}
        for run in np.nonzero(merged_run)[0]:
            cont_tables[run] = unions[run]
        for p in range(num_panels):
            if not (num_runs and merged_run[p // PANELS_PER_SUPER]):
                cont_tables[num_runs + p] = panel_groups[p]
        ckeys = cont_e * np.int64(NG + 1) + entry_gid
        flat_cont, flat_gid = [], []
        for c, arr in cont_tables.items():
            flat_cont.append(np.full(len(arr), c, dtype=np.int64))
            flat_gid.append(np.asarray(arr, dtype=np.int64))
        covered = np.zeros(len(entry_rows), dtype=bool)
        if flat_cont:
            tk = np.concatenate(flat_cont) * np.int64(NG + 1) + \
                np.concatenate(flat_gid)
            tk = np.sort(tk)
            if len(tk):
                j = np.minimum(np.searchsorted(tk, ckeys), len(tk) - 1)
                covered = (tk[j] == ckeys) & (cont_e >= 0)
        miss = (~covered) & (cont_e >= 0)
        mkeys = ckeys[miss]
        uk, ucnt = np.unique(mkeys, return_counts=True)
        u_cont = uk // (NG + 1)
        u_gid = uk % (NG + 1)
        # Per container: sentinel slots available in the last chunk.
        order_ = np.lexsort((-ucnt, u_cont))
        u_cont, u_gid, ucnt = u_cont[order_], u_gid[order_], ucnt[order_]
        start = np.searchsorted(u_cont, np.arange(num_runs + num_panels))
        end = np.searchsorted(u_cont, np.arange(num_runs + num_panels),
                              side="right")
        for c, table in cont_tables.items():
            nreal = len(table)
            if nreal == 0:
                continue  # no tile exists; nothing to absorb into
            free = (-(-nreal // LG)) * LG - nreal
            if free <= 0:
                continue
            s, e = start[c], end[c]
            pick = u_gid[s:e][:free]
            if len(pick):
                if c < num_runs:
                    unions[c] = np.sort(np.concatenate([unions[c], pick]))
                else:
                    panel_groups[c - num_runs] = np.concatenate(
                        [panel_groups[c - num_runs], pick])

    # --- Supertile family ---
    def pad_groups(g: np.ndarray) -> np.ndarray:
        pad = (-len(g)) % LG
        if pad:
            return np.concatenate([g, np.full(pad, NG, dtype=np.int64)])
        return g

    super_chunks = []  # (run, chunk group ids) per 128-lane chunk
    for run in np.nonzero(merged_run)[0]:
        u = pad_groups(unions[run])
        for c0 in range(0, len(u), LG):
            super_chunks.append((run, u[c0:c0 + LG]))
    num_super = len(super_chunks)
    super_rows = np.full((num_super, SUPER_ROWS), m, dtype=np.int64)
    super_gids = np.full((num_super, LG), NG, dtype=np.int64)
    run_super_base = {}
    for s, (run, chunk) in enumerate(super_chunks):
        if run not in run_super_base:
            run_super_base[run] = s
        r0 = run * SUPER_ROWS
        rows = a_row_gather[r0:r0 + SUPER_ROWS]
        super_rows[s, :len(rows)] = rows
        super_gids[s] = chunk
    super_cols = cols_of_groups(super_gids.reshape(-1)).reshape(
        num_super, GROUP_LANES)

    # --- Group family (unmerged panels) ---
    group_panels = []
    panel_group_base = {}
    for p in range(num_panels):
        if num_runs and merged_run[p // PANELS_PER_SUPER]:
            continue
        pg = pad_groups(panel_groups[p])
        if len(pg):
            panel_group_base[p] = len(group_panels)
        for c0 in range(0, len(pg), LG):
            group_panels.append((p, pg[c0:c0 + LG]))
    num_groups = len(group_panels)
    group_rows = np.full((num_groups, panel_sz), m, dtype=np.int64)
    group_gids = np.full((num_groups, LG), NG, dtype=np.int64)
    for g, (p, chunk) in enumerate(group_panels):
        rows = a_row_gather[p * panel_sz:(p + 1) * panel_sz]
        group_rows[g, :len(rows)] = rows
        group_gids[g] = chunk
    group_cols = cols_of_groups(group_gids.reshape(-1)).reshape(
        num_groups, GROUP_LANES)

    # --- Join each nnz entry against its container's group table ---
    dense_slots_super = num_super * SUPER_CELLS
    super_csr = np.full((num_super, SUPER_ROWS, GROUP_LANES),
                        config.NULL_INDEX, dtype=np.int64)
    group_csr = np.full((num_groups, panel_sz, GROUP_LANES),
                        config.NULL_INDEX, dtype=np.int64)

    tab_cont_l, tab_gid_l, tab_tile_l, tab_lgrp_l = [], [], [], []
    for run in np.nonzero(merged_run)[0]:
        u = pad_groups(unions[run])
        real = u < NG
        pos = np.arange(len(u), dtype=np.int64)
        tab_cont_l.append(np.full(int(real.sum()), run, dtype=np.int64))
        tab_gid_l.append(u[real])
        tab_tile_l.append(run_super_base[run] + pos[real] // LG)
        tab_lgrp_l.append(pos[real] % LG)
    for p, gbase in panel_group_base.items():
        pg = pad_groups(panel_groups[p])
        real = pg < NG
        pos = np.arange(len(pg), dtype=np.int64)
        tab_cont_l.append(np.full(int(real.sum()), num_runs + p,
                                  dtype=np.int64))
        tab_gid_l.append(pg[real])
        tab_tile_l.append(gbase + pos[real] // LG)
        tab_lgrp_l.append(pos[real] % LG)

    def cat(parts):
        return (np.concatenate(parts) if parts
                else np.zeros(0, dtype=np.int64))

    tab_cont = cat(tab_cont_l)
    tab_gid = cat(tab_gid_l)
    tab_tile = cat(tab_tile_l)
    tab_lgrp = cat(tab_lgrp_l)
    tab_key = tab_cont * np.int64(NG + 1) + tab_gid
    order_t = np.argsort(tab_key)
    tab_key = tab_key[order_t]
    tab_tile = tab_tile[order_t]
    tab_lgrp = tab_lgrp[order_t]

    ekey = cont_e * np.int64(NG + 1) + entry_gid
    if len(tab_key):
        j = np.searchsorted(tab_key, ekey)
        j_clip = np.minimum(j, len(tab_key) - 1)
        matched = (tab_key[j_clip] == ekey) & (cont_e >= 0)
        tile_e = tab_tile[j_clip]
        lane_e = tab_lgrp[j_clip] * G + entry_member
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
    res_gids_arr = entry_gid[rest]
    res_member_arr = entry_member[rest]
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
        group_size=G, num_col_groups=NG,
        col_order=col_order,
        a_row_gather=a_row_gather,
        super_rows=super_rows, super_cols=super_cols,
        super_gids=super_gids.astype(np.int32), super_csr=super_csr,
        group_rows=group_rows.astype(np.int32),
        group_cols=group_cols,
        group_gids=group_gids.astype(np.int32),
        group_csr=group_csr,
        res_rows=res_rows, res_cols=res_cols,
        res_gids=res_gids_arr.astype(np.int32),
        res_member=res_member_arr.astype(np.int32),
        res_csr=res_csr,
        inv_idx=inv_idx,
        packed_rows=packed_rows.astype(np.int32),
        packed_cols=packed_cols.astype(np.int32),
        csr_dest=csr_dest,
    )
