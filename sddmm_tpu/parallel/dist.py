"""Multi-chip hybrid SDDMM via GSPMD sharding annotations.

New capability vs the reference (single-GPU, SURVEY.md §2.3).  Strategy —
the TPU-idiomatic recipe: pick a mesh, annotate shardings, let XLA insert
the collectives over ICI:

- dense blocks, residual nnz, and the inverse-permutation index are
  padded to the mesh's 'rows' axis size and sharded along it — this is
  row-panel/block data-parallelism over S;
- A and B^T are sharded along the feature axis K on the mesh's 'feat'
  axis (tensor parallelism of the contraction dim: each device holds a
  K-slice, XLA reduces partial dot products with a psum);
- the final CSR-order gather runs on the sharded flat value vector; XLA
  inserts the all-gather where needed.

Padding uses the sentinel rows of A/B^T, so padded blocks/nnz compute
zeros and are dropped by the inverse gather (their slots are never read).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sddmm_tpu import config
from sddmm_tpu.reorder.pack import PackedMatrix
from sddmm_tpu.ops.hybrid import _PRECISION, _storage_dtype


def _pad_to(x: np.ndarray, multiple: int, fill) -> np.ndarray:
    pad = (-x.shape[0]) % multiple
    if not pad:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths, constant_values=fill)


from sddmm_tpu.reorder.pack import (GROUP_CELLS, PAIR_CELLS, QUAD_CELLS,
                                    SUPER_CELLS)


@dataclasses.dataclass
class ShardedPack:
    """Device-ready padded/sharded index arrays."""
    super_rows: jax.Array     # ('rows', None) sharded over supertiles
    super_cols: jax.Array     # ('rows', None)
    quad_rows: jax.Array      # ('rows', None) sharded over quad tiles
    quad_cols: jax.Array      # ('rows', None)
    pair_rows: jax.Array      # ('rows', None) sharded over pair tiles
    pair_cols: jax.Array      # ('rows', None)
    group_rows: jax.Array     # ('rows', None) sharded over groups
    group_cols: jax.Array     # ('rows', None)
    res_rows: jax.Array       # ('rows',)
    res_cols: jax.Array       # ('rows',)
    inv_idx: jax.Array        # ('rows',) positions into the *padded* flat
    num_super_padded: int
    num_quads_padded: int
    num_pairs_padded: int
    num_groups_padded: int
    num_res_padded: int


def shard_packed(packed: PackedMatrix, mesh: Mesh) -> ShardedPack:
    n_rows = mesh.shape["rows"]

    super_rows = _pad_to(packed.super_rows.astype(np.int32), n_rows,
                         packed.m)
    super_cols = _pad_to(packed.super_cols.astype(np.int32), n_rows,
                         packed.n)
    quad_rows = _pad_to(packed.quad_rows.astype(np.int32), n_rows,
                        packed.m)
    quad_cols = _pad_to(packed.quad_cols.astype(np.int32), n_rows,
                        packed.n)
    pair_rows = _pad_to(packed.pair_rows.astype(np.int32), n_rows,
                        packed.m)
    pair_cols = _pad_to(packed.pair_cols.astype(np.int32), n_rows,
                        packed.n)
    group_rows = _pad_to(packed.group_rows.astype(np.int32), n_rows,
                         packed.m)
    group_cols = _pad_to(packed.group_cols.astype(np.int32), n_rows,
                         packed.n)
    res_rows = _pad_to(packed.res_rows.astype(np.int32), n_rows, packed.m)
    res_cols = _pad_to(packed.res_cols.astype(np.int32), n_rows, packed.n)

    ns_pad = super_rows.shape[0]
    nq_pad = quad_rows.shape[0]
    np_pad = pair_rows.shape[0]
    ng_pad = group_rows.shape[0]
    nr_pad = res_rows.shape[0]
    # Build the inverse index for the *tile-major* padded flat layout
    # [ns_pad supertiles][np_pad pairs][ng_pad group tiles][nr_pad res]
    # from the tile-major csr arrays (the single-chip path uses the
    # run-major bucketed layout instead; see reorder/pack.py).
    inv = np.full(packed.nnz, -1, dtype=np.int64)
    base = 0
    for csr_arr, n_tiles_pad, cells in (
            (packed.super_csr, ns_pad, SUPER_CELLS),
            (packed.quad_csr, nq_pad, QUAD_CELLS),
            (packed.pair_csr, np_pad, PAIR_CELLS),
            (packed.group_csr, ng_pad, GROUP_CELLS)):
        if len(csr_arr):
            flat = csr_arr.reshape(len(csr_arr), -1)
            t, pos = np.nonzero(flat >= 0)
            inv[flat[t, pos]] = base + t * cells + pos
        base += n_tiles_pad * cells
    inv[packed.res_csr] = base + np.arange(len(packed.res_csr))
    assert np.all(inv >= 0), "distributed inverse index incomplete"
    inv = _pad_to(inv, n_rows, 0)

    shard1 = NamedSharding(mesh, P("rows"))
    shard2 = NamedSharding(mesh, P("rows", None))
    return ShardedPack(
        super_rows=jax.device_put(jnp.asarray(super_rows), shard2),
        super_cols=jax.device_put(jnp.asarray(super_cols), shard2),
        quad_rows=jax.device_put(jnp.asarray(quad_rows), shard2),
        quad_cols=jax.device_put(jnp.asarray(quad_cols), shard2),
        pair_rows=jax.device_put(jnp.asarray(pair_rows), shard2),
        pair_cols=jax.device_put(jnp.asarray(pair_cols), shard2),
        group_rows=jax.device_put(jnp.asarray(group_rows), shard2),
        group_cols=jax.device_put(jnp.asarray(group_cols), shard2),
        res_rows=jax.device_put(jnp.asarray(res_rows), shard1),
        res_cols=jax.device_put(jnp.asarray(res_cols), shard1),
        inv_idx=jax.device_put(jnp.asarray(inv), shard1),
        num_super_padded=ns_pad,
        num_quads_padded=nq_pad,
        num_pairs_padded=np_pad,
        num_groups_padded=ng_pad,
        num_res_padded=nr_pad,
    )


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _dist_hybrid_jit(a_pad, bt_pad, super_rows, super_cols, quad_rows,
                     quad_cols, pair_rows, pair_cols, group_rows,
                     group_cols, res_rows, res_cols, inv_idx,
                     compute_dtype="float32"):
    cdtype = _storage_dtype(compute_dtype)
    precision = _PRECISION[compute_dtype]
    if cdtype != a_pad.dtype:
        a_pad = a_pad.astype(cdtype)
        bt_pad = bt_pad.astype(cdtype)

    def tiles_of(rows, cols):
        ag = jnp.take(a_pad, rows, axis=0)
        bg = jnp.take(bt_pad, cols, axis=0)
        return jax.lax.dot_general(
            ag, bg, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision)

    s_tiles = tiles_of(super_rows, super_cols)
    q_tiles = tiles_of(quad_rows, quad_cols)
    p_tiles = tiles_of(pair_rows, pair_cols)
    g_tiles = tiles_of(group_rows, group_cols)

    ar = jnp.take(a_pad, res_rows, axis=0)
    br = jnp.take(bt_pad, res_cols, axis=0)
    res = jnp.sum(ar.astype(jnp.float32) * br.astype(jnp.float32), axis=-1)

    flat = jnp.concatenate(
        [s_tiles.reshape(-1), q_tiles.reshape(-1), p_tiles.reshape(-1),
         g_tiles.reshape(-1), res])
    return jnp.take(flat, inv_idx)


class DistributedHybridSDDMM:
    """Hybrid SDDMM sharded over a mesh; call with full (unsharded) host
    operands or pre-placed device arrays."""

    def __init__(self, packed: PackedMatrix, mesh: Mesh,
                 compute_dtype: str = "float32"):
        self.packed = packed
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.sharded = shard_packed(packed, mesh)
        # Operands: K on the 'feat' axis (row dim replicated so any device
        # can gather any A row / B column it needs).
        self._a_sharding = NamedSharding(mesh, P(None, "feat"))
        self._bt_sharding = NamedSharding(mesh, P(None, "feat"))

    def prepare_operands(self, a, b=None, bt=None):
        a = np.asarray(a)
        if bt is None:
            bt = np.ascontiguousarray(np.asarray(b).T)
        else:
            bt = np.asarray(bt)
        a_pad = np.concatenate([a, np.zeros((1, a.shape[1]), a.dtype)])
        bt_pad = np.concatenate([bt, np.zeros((1, bt.shape[1]), bt.dtype)])
        return (jax.device_put(jnp.asarray(a_pad), self._a_sharding),
                jax.device_put(jnp.asarray(bt_pad), self._bt_sharding))

    def run_padded(self, a_pad, bt_pad):
        s = self.sharded
        vals = _dist_hybrid_jit(
            a_pad, bt_pad, s.super_rows, s.super_cols,
            s.quad_rows, s.quad_cols,
            s.pair_rows, s.pair_cols,
            s.group_rows, s.group_cols,
            s.res_rows, s.res_cols, s.inv_idx,
            compute_dtype=self.compute_dtype)
        return vals[:self.packed.nnz]

    def __call__(self, a, b=None, bt=None):
        a_pad, bt_pad = self.prepare_operands(a, b=b, bt=bt)
        return self.run_padded(a_pad, bt_pad)
