"""Fast CSR-entry-order delivery of the packed flat value vector.

The reference's kernels scatter accumulator fragments straight to
``matrixP[csrIdx]`` (src/sddmmKernel.cu:213-355) — free on a GPU, where
random HBM scatters run near bandwidth.  On TPU both obvious routes are
descriptor-rate-bound catastrophes (measured, BENCH_r03
``per_matrix_csr_order``): a per-entry ``take`` issues nnz scalar
descriptors (~150 M/s) and the key-value sort is worse (30-150x the
kernel itself).

This module replaces them with a two-stage *window plan*, exploiting
that the packed->CSR permutation is STATIC per packing:

1.  Host side (once per packing): view the flat vector as 128-cell
    *atoms*.  For each 128-entry block of CSR output, list the unique
    atoms its sources live in (``win_idx``, padded to the plan's
    ``s_pad``) and each entry's offset into that concatenated window
    (``off_full``).  Packed layout locality keeps the atom count small:
    a CSR row's dense-path cells are CONTIGUOUS in flat (one container
    row slice), its hub cells are contiguous in the slab, and ~3-5
    consecutive rows share an output block.
2.  Device side (per call): ONE row gather of the window atoms
    (``nb * s_pad`` descriptors of 512 B — roughly ``nnz * s_pad/128``
    descriptors, 10-40x fewer than per-entry) followed by an exact
    one-hot select over the window on the VPU (multiply by 0/1 in
    fp32 — bit-exact, no precision loss).

Blocks are bucketed by window size so a few atom-rich blocks (hub-heavy
rows) don't pad every block to their width; each bucket runs the same
jitted select at its own ``s_pad``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 128   # CSR output entries per block = flat cells per atom


@dataclasses.dataclass
class WindowPlan:
    """Static routing of one packed->CSR permutation (see module doc).

    Buckets partition the output blocks by window size; bucket arrays:
    ``win_idx[b]``: (nb_b, s_pad_b) int32 atom ids into the padded
    flat128 view; ``off_full[b]``: (nb_b, 128) int32 offset of each
    output entry into its block's concatenated (s_pad_b * 128) window;
    ``block_ids[b]``: (nb_b,) int32 output block index of each row.
    """
    buckets: list          # [(s_pad, win_idx, off_full, block_ids)]
    nnz: int
    num_blocks: int
    max_s: int
    mean_s: float
    #: (num_blocks,) row of the bucket-concatenated output holding each
    #: output block — reassembly is ONE static row gather, not a scatter
    inv_block_order: np.ndarray = None

    def device_arrays(self):
        """Bucket arrays as device-resident jnp arrays (for jit args)."""
        return ([(s, jnp.asarray(w), jnp.asarray(o))
                 for s, w, o, _ in self.buckets],
                (None if self.inv_block_order is None
                 else jnp.asarray(self.inv_block_order)))


def build_window_plan(inv_idx: np.ndarray, flat_size: int,
                      bucket_sizes=(2, 4, 8, 16, 32, 64)) -> WindowPlan:
    """Precompute the window plan for ``out[i] = flat[inv_idx[i]]``.

    ``inv_idx``: (nnz,) packed slot of CSR entry i (reorder/pack.py);
    ``flat_size``: length of the packed flat vector.  Pure NumPy, runs
    once per packing (vectorized: no per-block Python loop).
    """
    inv_idx = np.asarray(inv_idx, dtype=np.int64)
    nnz = int(inv_idx.shape[0])
    nb = -(-nnz // _BLOCK)
    # pad the tail block by repeating the last source (sliced off later)
    src = np.full(nb * _BLOCK, inv_idx[-1] if nnz else 0, dtype=np.int64)
    src[:nnz] = inv_idx
    src = src.reshape(nb, _BLOCK)
    atoms = src // _BLOCK                       # (nb, 128)
    lanes = (src % _BLOCK).astype(np.int32)

    # per-block unique atoms + each entry's rank among them, vectorized:
    # sort atoms within the block, flag firsts, cumsum -> rank in sorted
    # order, scatter ranks back to entry positions.
    order = np.argsort(atoms, axis=1, kind="stable")
    satoms = np.take_along_axis(atoms, order, axis=1)
    first = np.ones_like(satoms, dtype=bool)
    first[:, 1:] = satoms[:, 1:] != satoms[:, :-1]
    rank_sorted = np.cumsum(first, axis=1) - 1  # (nb, 128)
    s_per_block = rank_sorted[:, -1] + 1
    rank = np.empty_like(rank_sorted)
    np.put_along_axis(rank, order, rank_sorted, axis=1)
    off_full_all = (rank * _BLOCK + lanes).astype(np.int32)

    max_s = int(s_per_block.max()) if nb else 1
    mean_s = float(s_per_block.mean()) if nb else 0.0
    sizes = [s for s in bucket_sizes if s < max_s] + [max(max_s, 1)]

    buckets = []
    lo = 0
    all_ids = np.arange(nb, dtype=np.int32)
    for s_pad in sizes:
        sel = (s_per_block > lo) & (s_per_block <= s_pad)
        lo = s_pad
        if not sel.any():
            continue
        ids = all_ids[sel]
        # scatter each block's sorted unique atoms into (nb_b, s_pad);
        # pad slots point at atom 0 (never selected: off_full only
        # addresses real window positions)
        win = np.zeros((len(ids), s_pad), dtype=np.int32)
        bsel = np.broadcast_to(np.arange(len(ids))[:, None],
                               (len(ids), _BLOCK))
        win[bsel[first[sel]], rank_sorted[sel][first[sel]]] = \
            satoms[sel][first[sel]].astype(np.int32)
        buckets.append((int(s_pad), win, off_full_all[sel], ids))
    cat_order = (np.concatenate([b[3] for b in buckets])
                 if buckets else np.zeros(0, np.int32))
    if np.array_equal(cat_order, np.arange(nb, dtype=np.int32)):
        inv_block_order = None   # single in-order bucket: no reassembly
        return WindowPlan(buckets=buckets, nnz=nnz, num_blocks=nb,
                          max_s=max_s, mean_s=mean_s)
    inv_block_order = np.empty(nb, dtype=np.int32)
    inv_block_order[cat_order] = np.arange(nb, dtype=np.int32)
    return WindowPlan(buckets=buckets, nnz=nnz, num_blocks=nb,
                      max_s=max_s, mean_s=mean_s,
                      inv_block_order=inv_block_order)


@functools.partial(jax.jit, static_argnames=("s_pad",))
def _bucket_select(f128, win_idx, off_full, s_pad: int):
    """out[j, d] = window_j[off_full[j, d]] for one s_pad bucket."""
    nb_b = win_idx.shape[0]
    win = jnp.take(f128, win_idx, axis=0)            # (nb_b, S, 128)
    win2 = win.reshape(nb_b, s_pad * _BLOCK)
    iota = jnp.arange(s_pad * _BLOCK, dtype=jnp.int32)
    oh = off_full[:, :, None] == iota[None, None, :]
    return jnp.sum(jnp.where(oh, win2[:, None, :], jnp.float32(0.0)),
                   axis=-1)                          # (nb_b, 128)


@functools.partial(jax.jit, static_argnames=("s_pad",))
def _bucket_select_mxu(f128, win_idx, off_full, s_pad: int):
    """MXU variant of the bucket select (round 4).

    The VPU one-hot above compares every output entry against the full
    ``s_pad * 128`` window — ``nb * 128 * s_pad * 128`` vector ops,
    measured ~1.9 ms of the 2.1 ms clustered16 conversion.  Factor the
    window offset ``off = hi * 16 + lo``: ONE bf16 batched matmul
    contracts an ``(s_pad * 8)``-wide hi one-hot against the window
    viewed as ``(nb, s_pad * 8, 16)``, then a 16-way fp32 lo select
    runs on the VPU (nb * 128 * 16 ops — negligible).

    Exactness: the one-hot is exactly representable in bf16 and each
    output entry receives exactly ONE nonzero product, accumulated in
    fp32 on the MXU.  The window values ride as a bf16 hi/lo split
    concatenated along the lo axis and recombined AFTER the dot, behind
    an optimization_barrier (without it XLA splits the concat into two
    dots and merges those into dot(oh, hi + lo) with a collapsing bf16
    add — the docs/performance.md hi/lo trap).  Residual error is the
    fp32->bf16x2 split (rel ~2^-17), two orders of magnitude inside
    the reference's rel 1e-3 contract (the hybrid kernel's own
    tf32-class dots already sit at rel ~1.1e-5).
    """
    nb_b = win_idx.shape[0]
    s8 = s_pad * 8
    win = jnp.take(f128, win_idx, axis=0)            # (nb_b, S, 128)
    win_r = win.reshape(nb_b, s8, 16)
    # the barrier on w_hi is load-bearing: TPU XLA's excess-precision
    # rewrite otherwise elides the f32->bf16->f32 pair and w_lo becomes
    # exactly zero (measured: plain-bf16 3.9e-3 error signature)
    w_hi = jax.lax.optimization_barrier(win_r.astype(jnp.bfloat16))
    w_lo = (win_r - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    wcat = jnp.concatenate([w_hi, w_lo], axis=-1)    # (nb_b, s8, 32)
    hi = off_full >> 4
    lo = off_full & 15
    oh = (hi[:, :, None] == jnp.arange(s8, dtype=jnp.int32)
          ).astype(jnp.bfloat16)                     # (nb_b, 128, s8)
    t2 = jax.lax.dot_general(
        oh, wcat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (nb_b, 128, 32)
    # barrier the halves: XLA otherwise splits the concat back into
    # dot(oh, hi) + dot(oh, lo) and merges THAT into dot(oh, hi + lo)
    # with a collapsing bf16 add (measured: max_rel 3.9e-3 = plain
    # bf16 — the docs/performance.md hi/lo trap, one rewrite removed)
    t_hi, t_lo = jax.lax.optimization_barrier(
        (t2[..., :16], t2[..., 16:]))
    t = t_hi + t_lo                                  # exact recombine
    lo_oh = (lo[:, :, None] == jnp.arange(16, dtype=jnp.int32)
             ).astype(jnp.float32)
    return jnp.sum(t * lo_oh, axis=-1)               # (nb_b, 128)


_SELECTS = {"window": _bucket_select, "mxu": _bucket_select_mxu}


def window_select(flat: jax.Array, plan_dev, nnz: int,
                  select: str = "window") -> jax.Array:
    """Apply a device-resident WindowPlan (``plan.device_arrays()``).

    ``select``: "window" = exact VPU one-hot; "mxu" = factored bf16
    MXU one-hot (see _bucket_select_mxu) — ~5x cheaper on block
    regimes, error bounded by the bf16x2 split.
    """
    bucket_select = _SELECTS[select]
    bucket_arrays, inv_block_order = plan_dev
    pad = (-flat.shape[0]) % _BLOCK
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    f128 = flat.reshape(-1, _BLOCK)
    parts = [bucket_select(f128, win_idx, off_full, s_pad)
             for (s_pad, win_idx, off_full) in bucket_arrays]
    cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    if inv_block_order is not None:                # static row gather
        cat = jnp.take(cat, inv_block_order, axis=0)
    return cat.reshape(-1)[:nnz]
