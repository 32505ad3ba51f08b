"""Pallas MXU kernel for the batched tile dots of the hybrid SDDMM.

The hybrid path's dense tiles are batched matmuls ``(nT, R, K) x
(nT, 128, K) -> (nT, R, 128)`` with R in {16, 32, 128}.  At tf32-class
precision XLA lowers these through a generic multi-pass emulation that
measures pathologically slow for small R (11.5 M 16-row groups/s at R=16
— docs/performance.md), an order of magnitude under the MXU's potential.

This kernel implements the same 3-pass bfloat16 product (the tf32-class
scheme: ``a_hi@b_hi + a_hi@b_lo + a_lo@b_hi`` with fp32 accumulation)
explicitly: operands are split into high/low bfloat16 halves in VMEM and
the three passes run as native bf16 MXU dots.  Several tiles are
processed per grid step so the pipeline amortizes and the batched dots
keep the MXU busy.

Reference counterpart: the WMMA tf32 m16n16k8 dense-block kernels
(src/sddmmKernel.cu:213-355) — same "demote fp32 inputs to a faster MXU
format, accumulate fp32" contract, same 16-row logical tile, re-designed
around the 128x128 MXU and Pallas's grid pipeline instead of warps and
shared memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tile_dot_kernel(a_ref, b_ref, o_ref):
    """One grid step: (T, R, K) x (T, L, K) -> (T, R, L), 3-pass bf16."""
    a = a_ref[:]
    b = b_ref[:]
    ah, al = _split_hi_lo(a)
    bh, bl = _split_hi_lo(b)
    dims = (((2,), (2,)), ((0,), (0,)))

    def dot(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    o_ref[:] = dot(ah, bh) + dot(ah, bl) + dot(al, bh)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_dot_tf32(a_tiles: jax.Array, b_tiles: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Batched tile dot at tf32-class precision on the MXU.

    a_tiles: (nT, R, K) float32, R in {8,16,32,64,128}.
    b_tiles: (nT, L, K) float32, L typically 128.
    Returns (nT, R, L) float32.  nT must be a multiple of the internal
    tiles-per-step (pad with zero tiles if needed — see tile_dot_padded).
    """
    nT, R, K = a_tiles.shape
    L = b_tiles.shape[1]
    # Tiles per grid step: target ~128 A rows per step so the batched
    # bf16 dots run near full MXU height.
    tps = max(1, min(nT, 128 // R))
    while nT % tps:
        tps //= 2
    grid = (nT // tps,)
    return pl.pallas_call(
        _tile_dot_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tps, R, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, L, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tps, R, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nT, R, L), jnp.float32),
        interpret=interpret,
    )(a_tiles, b_tiles)


def tile_dot_padded(a_tiles: jax.Array, b_tiles: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """tile_dot_tf32 with automatic zero-tile padding of the batch."""
    nT, R, K = a_tiles.shape
    if nT == 0:
        return jnp.zeros((0, R, b_tiles.shape[1]), jnp.float32)
    tps = max(1, min(nT, 128 // R))
    pad = (-nT) % tps
    if pad:
        a_tiles = jnp.concatenate(
            [a_tiles, jnp.zeros((pad,) + a_tiles.shape[1:],
                                a_tiles.dtype)])
        b_tiles = jnp.concatenate(
            [b_tiles, jnp.zeros((pad,) + b_tiles.shape[1:],
                                b_tiles.dtype)])
    out = tile_dot_tf32(a_tiles, b_tiles, interpret=interpret)
    return out[:nT] if pad else out
