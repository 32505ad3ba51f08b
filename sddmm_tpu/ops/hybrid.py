"""Hybrid dense-block + sparse-residual SDDMM — the flagship TPU path.

Reference counterpart: the two concurrently-streamed CUDA kernels
(src/sddmmKernel.cu:2540-2663 — WMMA dense blocks at :213/:355 and the
2-thread-per-nnz residual at :1994/:2109).  TPU-native re-design:

- The dense path is ONE batched matmul over gathered operands:
  ``tiles[b] = A[rows(panel(b))] @ B[:, cols(b)]`` expressed as an einsum
  ``bik,bjk->bij`` on (numBlocks, 16, K) gathers of A and B^T.  XLA maps
  it onto the MXU; at 16x16 logical blocks the op is HBM-bound, so the
  roofline is gather bandwidth, not FLOPs.
- The residual path is a per-nnz gather-dot on the VPU.
- Both fuse into one jitted program — XLA's async scheduler overlaps them,
  which is the reference's dual-stream design "for free".
- Results land in CSR order via ONE inverse-permutation gather (see
  reorder/pack.py) — no scatter, no atomics.

Precision: ``compute_dtype`` bfloat16 uses the MXU's native input type with
float32 accumulation (the TPU analogue of the reference's fp32->tf32
demotion, src/sddmmKernel.cu:317-325); float32 runs full precision.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sddmm_tpu import config
from sddmm_tpu.data.sparse import CSR
from sddmm_tpu.reorder.bsmr import BSMR
from sddmm_tpu.reorder.pack import PackedMatrix, pack


# MXU precision per compute dtype.  "float32" runs exact fp32 (6-pass MXU);
# "tf32" approximates the reference's fp32->tf32 demotion with the 3-pass
# bfloat16 algorithm; "bfloat16" uses native bf16 inputs, fp32 accumulate.
_PRECISION = {
    "float32": jax.lax.Precision.HIGHEST,
    "tf32": jax.lax.Precision.HIGH,
    "bfloat16": jax.lax.Precision.DEFAULT,
}


def _storage_dtype(compute_dtype: str):
    return jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _hybrid_sddmm_jit(a_pad, bt_pad, a_row_gather, block_panel, block_cols,
                      res_rows, res_cols, inv_idx, compute_dtype="float32"):
    """a_pad: (M+1, K) with zero sentinel row; bt_pad: (N+1, K) likewise."""
    cdtype = _storage_dtype(compute_dtype)
    precision = _PRECISION[compute_dtype]
    panel = config.ROW_PANEL_SIZE

    # Dense path: (numPanels, 16, K) A panels -> (numBlocks, 16, K) per block.
    a_panels = jnp.take(a_pad, a_row_gather, axis=0).reshape(
        -1, panel, a_pad.shape[1])
    ag = jnp.take(a_panels, block_panel, axis=0).astype(cdtype)
    bg = jnp.take(bt_pad, block_cols, axis=0).astype(cdtype)  # (nB, 16, K)
    tiles = jax.lax.dot_general(
        ag, bg,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (nB, 16, 16) fp32

    # Residual path: per-nnz gather-dot.
    ar = jnp.take(a_pad, res_rows, axis=0).astype(cdtype)
    br = jnp.take(bt_pad, res_cols, axis=0).astype(cdtype)
    res = jnp.sum(ar.astype(jnp.float32) * br.astype(jnp.float32), axis=-1)

    flat = jnp.concatenate([tiles.reshape(-1), res])
    return jnp.take(flat, inv_idx)


def sddmm_hybrid(a, b, packed: PackedMatrix,
                 compute_dtype: str = "float32") -> np.ndarray:
    """One-shot host convenience wrapper (numpy in / numpy out)."""
    runner = HybridSDDMM(packed, compute_dtype=compute_dtype)
    return np.asarray(runner(a, b))


class HybridSDDMM:
    """Reusable jitted hybrid SDDMM for a fixed sparsity packing.

    Keeps the packed index arrays resident on device so repeated calls
    (benchmark iterations, training steps) only ship A and B.
    """

    def __init__(self, packed: PackedMatrix, compute_dtype: str = "float32",
                 device=None):
        self.packed = packed
        self.compute_dtype = compute_dtype
        put = functools.partial(jax.device_put, device=device)
        self._a_row_gather = put(jnp.asarray(packed.a_row_gather,
                                             dtype=jnp.int32))
        self._block_panel = put(jnp.asarray(packed.block_panel,
                                            dtype=jnp.int32))
        self._block_cols = put(jnp.asarray(packed.block_cols,
                                           dtype=jnp.int32))
        self._res_rows = put(jnp.asarray(packed.res_rows, dtype=jnp.int32))
        self._res_cols = put(jnp.asarray(packed.res_cols, dtype=jnp.int32))
        self._inv_idx = put(jnp.asarray(packed.inv_idx, dtype=jnp.int32))

    def prepare_operands(self, a, b=None, bt=None):
        """Pad A (M,K)->(M+1,K) and B^T (N,K)->(N+1,K) with zero sentinel
        rows, as device arrays."""
        a = np.asarray(a)
        if bt is None:
            bt = np.ascontiguousarray(np.asarray(b).T)
        else:
            bt = np.asarray(bt)
        a_pad = np.concatenate([a, np.zeros((1, a.shape[1]), a.dtype)])
        bt_pad = np.concatenate([bt, np.zeros((1, bt.shape[1]), bt.dtype)])
        return jnp.asarray(a_pad), jnp.asarray(bt_pad)

    def __call__(self, a, b=None, bt=None):
        a_pad, bt_pad = self.prepare_operands(a, b=b, bt=bt)
        return self.run_padded(a_pad, bt_pad)

    def run_padded(self, a_pad: jax.Array, bt_pad: jax.Array) -> jax.Array:
        """Device-resident fast path: operands already padded."""
        return _hybrid_sddmm_jit(
            a_pad, bt_pad, self._a_row_gather, self._block_panel,
            self._block_cols, self._res_rows, self._res_cols, self._inv_idx,
            compute_dtype=self.compute_dtype)

    @staticmethod
    def from_csr(csr: CSR, alpha: float = config.DEFAULT_ALPHA,
                 delta: float = config.DEFAULT_DELTA,
                 compute_dtype: str = "float32",
                 method: str = "auto") -> "HybridSDDMM":
        bsmr = BSMR(alpha, delta, csr, method=method)
        return HybridSDDMM(pack(csr, bsmr), compute_dtype=compute_dtype)
