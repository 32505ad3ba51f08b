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
    from sddmm_tpu.ops.hybrid import _dot3, _storage_dtype
    dt = _storage_dtype(compute_dtype)
    if compute_dtype == "float16":
        full = _dot3(a.astype(dt), b.astype(dt),
                     dimension_numbers=(((1,), (0,)), ((), ())))
    else:
        full = jnp.dot(a.astype(dt), b.astype(dt),
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
