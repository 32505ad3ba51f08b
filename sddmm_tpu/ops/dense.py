"""Dense-masked SDDMM baseline: compute the full A@B product on the MXU
and gather the nnz positions.

This is the third comparison point of the harness (alongside the pure-JAX
CSR gather-dot path, ops/csr_sddmm.py, and the hybrid BSMR path) and the
dispatch winner for *low-sparsity* matrices: its cost is the dense matmul
2*M*N*K plus one nnz gather, with zero per-tile index traffic.  The
reference has no equivalent (its densest baseline is cuSPARSE); on TPU the
MXU is fast enough that below ~85-90% sparsity this wins outright.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sddmm_tpu.data.sparse import CSR
from sddmm_tpu.ops.hybrid import _PRECISION


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _dense_masked_jit(a, b, rows, cols, compute_dtype="tf32"):
    """2-D (row, col) gather of the full product — no flattened index, so
    m*n >= 2**31 cannot overflow int32 (JAX silently downcasts int64
    arrays unless x64 is enabled)."""
    from sddmm_tpu.ops.hybrid import (_dot3, _split_bf16,
                                      _storage_dtypes)
    adt, bdt = _storage_dtypes(compute_dtype)
    dn = (((1,), (0,)), ((), ()))
    if compute_dtype == "float16":
        full = _dot3(a.astype(adt), b.astype(bdt), dimension_numbers=dn)
    elif compute_dtype == "mixed":
        # fp32 A split to bf16 hi/lo x bf16 B — same 2-pass scheme as
        # the hybrid path (A must NOT be demoted to bf16)
        ah, al = _split_bf16(a.astype(adt))
        bb = b.astype(bdt)

        def d(x):
            return jax.lax.dot_general(
                x, bb, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        h, l = jax.lax.optimization_barrier((d(ah), d(al)))
        full = h + l
    else:
        full = jnp.dot(a.astype(adt), b.astype(bdt),
                       preferred_element_type=jnp.float32,
                       precision=_PRECISION[compute_dtype])
    return full[rows, cols]


def dense_masked_sddmm(a, b, s: CSR,
                       compute_dtype: str = "tf32") -> np.ndarray:
    """(nnz,) values in CSR entry order via full dense product + gather."""
    rows = jnp.asarray(s.row_indices(), dtype=jnp.int32)
    cols = jnp.asarray(s.col_idx, dtype=jnp.int32)
    out = _dense_masked_jit(jnp.asarray(a), jnp.asarray(b), rows, cols,
                            compute_dtype=compute_dtype)
    return np.asarray(out)
