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


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _dense_full_jit(a, bt, compute_dtype="tf32"):
    """Full (M, N) product A @ B^T in the framework's compute modes."""
    from sddmm_tpu.ops.hybrid import _dot3, _split_bf16
    dn = (((1,), (1,)), ((), ()))
    if compute_dtype == "float16":
        return _dot3(a, bt, dimension_numbers=dn)
    if compute_dtype == "mixed":
        ah, al = _split_bf16(a)

        def d(x):
            return jax.lax.dot_general(
                x, bt, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        h, l = jax.lax.optimization_barrier((d(ah), d(al)))
        return h + l
    return jax.lax.dot_general(
        a, bt, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PRECISION.get(compute_dtype,
                                 jax.lax.Precision.DEFAULT))


class DenseSDDMM:
    """Dense-tiling SDDMM strategy for high-density matrices — the true
    DLMC regime (pruned-ML weights, density 0.1-0.5; the reference's DLMC
    corpus, scripts/exclude_invalid_dataset.py:46-49 keeps them).

    At this density the BSMR packing covers the matrix almost entirely
    with full 128x128 super tiles, so the hybrid kernel degenerates into
    a dense blocked product executed through per-tile descriptor gathers.
    This runner drops the indices entirely: ONE MXU dot A @ B^T whose
    (M, N) output is the native layout — the value of CSR entry (r, c)
    sits at slot r*N + c, zero gathers to deliver.  CSR-entry order
    (``order="csr"``) costs one flat take (2-D gather when M*N would
    overflow int32).

    The reference has no counterpart (it always runs BSMR; its densest
    baseline is cuSPARSE) — this is a dispatch class the TPU design adds
    because the MXU's dense rate at d >= ~0.1 beats any gather-fed
    kernel; see scripts/probe_dense_dlmc.py for the measured decision.

    Interface-compatible with HybridSDDMM for the bench/probe harness:
    ``prepare_operands`` -> ``run_padded`` / ``measure_kernel_ms``.
    """

    def __init__(self, m: int, n: int, compute_dtype: str = "tf32",
                 csr: CSR | None = None):
        self.m, self.n = int(m), int(n)
        self.compute_dtype = compute_dtype
        self._csr = csr
        self._flat_idx = None
        self._rows_cols = None
        self._window_plan_dev = None
        #: CSR-order strategy: None = auto (window plan + MXU select on
        #: TPU, per-entry take on CPU); "take" | "window" | "mxu"
        self.csr_strategy = None

    @staticmethod
    def from_csr(csr: CSR, compute_dtype: str = "tf32") -> "DenseSDDMM":
        return DenseSDDMM(csr.m, csr.n, compute_dtype=compute_dtype,
                          csr=csr)

    def prepare_operands(self, a, b=None, bt=None):
        """Device A (M, K) and B^T (N, K) in the storage dtypes (the
        analogue of HybridSDDMM.prepare_operands; no index arrays)."""
        from sddmm_tpu.ops.hybrid import _storage_dtypes
        a = np.asarray(a)
        if bt is None:
            bt = np.ascontiguousarray(np.asarray(b).T)
        else:
            bt = np.asarray(bt)
        adt, bdt = _storage_dtypes(self.compute_dtype)
        return jnp.asarray(a).astype(adt), jnp.asarray(bt).astype(bdt)

    def _csr_gather_ops(self):
        if self._csr is None:
            raise ValueError("order='csr' needs the CSR pattern; build "
                             "with DenseSDDMM.from_csr")
        if self.m * self.n < 2 ** 31:
            if self._flat_idx is None:
                flat = (self._csr.row_indices().astype(np.int64) * self.n
                        + self._csr.col_idx.astype(np.int64))
                self._flat_idx = jnp.asarray(flat.astype(np.int32))
            return self._flat_idx, None
        if self._rows_cols is None:
            self._rows_cols = (
                jnp.asarray(self._csr.row_indices(), dtype=jnp.int32),
                jnp.asarray(self._csr.col_idx, dtype=jnp.int32))
        return None, self._rows_cols

    def _pick_csr_strategy(self) -> str:
        if self.csr_strategy:
            return self.csr_strategy
        return ("take" if jax.devices()[0].platform == "cpu" else "mxu")

    def _window_plan(self):
        """WindowPlan over the (M, N)-flat product (ops/csr_order).

        The per-entry flat take is descriptor-rate-bound at the ~40 ns
        latency class of a >16 MB source (measured 144 ms on the bench
        dlmc matrix vs a 0.063 ms kernel); the window plan's 512 B atom
        gather + factored one-hot select is the same machinery the
        hybrid path uses — the dense strategy's ``inv_idx`` is simply
        ``row * N + col``.
        """
        if self._window_plan_dev is None:
            if self._csr is None:
                raise ValueError("order='csr' needs the CSR pattern; "
                                 "build with DenseSDDMM.from_csr")
            from sddmm_tpu.ops.csr_order import build_window_plan
            inv = (self._csr.row_indices().astype(np.int64) * self.n
                   + self._csr.col_idx.astype(np.int64))
            plan = build_window_plan(inv, self.m * self.n)
            self._window_plan_dev = (plan, plan.device_arrays())
        return self._window_plan_dev

    def to_csr_order(self, full: jax.Array,
                     strategy: str | None = None) -> jax.Array:
        strategy = strategy or self._pick_csr_strategy()
        if strategy in ("window", "mxu"):
            from sddmm_tpu.ops.csr_order import window_select
            _, plan_dev = self._window_plan()
            return window_select(full.reshape(-1), plan_dev,
                                 self._csr.nnz, select=strategy)
        flat_idx, rows_cols = self._csr_gather_ops()
        if flat_idx is not None:
            return jnp.take(full.reshape(-1), flat_idx)
        return full[rows_cols[0], rows_cols[1]]

    def run_padded(self, a_dev: jax.Array, bt_dev: jax.Array,
                   order: str = "packed") -> jax.Array:
        full = _dense_full_jit(a_dev, bt_dev,
                               compute_dtype=self.compute_dtype)
        if order == "packed":
            return full
        if order == "csr":
            return self.to_csr_order(full)
        raise ValueError(f"unknown order {order!r}")

    def __call__(self, a, b=None, bt=None, order: str = "csr"):
        a_dev, bt_dev = self.prepare_operands(a, b=b, bt=bt)
        return self.run_padded(a_dev, bt_dev, order=order)

    def make_looped_fn(self, iterations: int, order: str = "packed"):
        """Loop-differenced timing body (docs/performance.md): a
        dtype-preserving ``where`` on the carry masks A each iteration so
        XLA cannot hoist/CSE the dot out of the fori_loop, and an
        ``optimization_barrier`` + tiny slice stands in for the consumer
        so the full (M, N) HBM write — the strategy's dominant byte term
        — cannot be fused away into the reduction."""
        # nnz-sized gather indices / plan arrays enter as jit ARGUMENTS,
        # not closure constants — closed-over arrays are inlined into
        # the HLO as literals and blow the axon remote-compile request
        # limit at suite scale (HTTP 413; see hybrid.make_looped_fn).
        strategy = self._pick_csr_strategy() if order == "csr" else None
        gather = plan_s_pads = plan_args = None
        if order == "csr":
            if strategy in ("window", "mxu"):
                _, (buckets_dev, inv_bo) = self._window_plan()
                plan_s_pads = [s for (s, _, _) in buckets_dev]
                plan_args = ([(w, o) for (_, w, o) in buckets_dev],
                             inv_bo)
            else:
                gather = self._csr_gather_ops()

        def looped(a_dev, bt_dev, gather_ix, plan_ix):
            def body(_, carry):
                live = carry > jnp.float32(-1e30)
                a_i = jnp.where(live, a_dev, jnp.zeros_like(a_dev))
                out = _dense_full_jit(a_i, bt_dev,
                                      compute_dtype=self.compute_dtype)
                if order == "csr":
                    if strategy in ("window", "mxu"):
                        from sddmm_tpu.ops.csr_order import window_select
                        arrays, inv = plan_ix

                        def mask(ix_):
                            return jnp.where(live, ix_,
                                             jnp.zeros_like(ix_))

                        buckets = [(s, mask(w), mask(o))
                                   for s, (w, o) in zip(plan_s_pads,
                                                        arrays)]
                        out = window_select(
                            out.reshape(-1),
                            (buckets, None if inv is None else mask(inv)),
                            self._csr.nnz, select=strategy)
                    else:
                        flat_idx, rows_cols = gather_ix
                        out = (jnp.take(out.reshape(-1), flat_idx)
                               if flat_idx is not None
                               else out[rows_cols[0], rows_cols[1]])
                # the barrier blocks dot->reduce fusion, so the (M, N)
                # product must be materialized before the consumer reads
                # it; the consumer is a ~1024-point strided checksum
                # across the WHOLE buffer (not a corner slice), so no
                # rewrite can serve it from a partial product
                out = jax.lax.optimization_barrier(out)
                flat_o = out.reshape(-1)
                stride = max(flat_o.shape[0] // 1024, 1)
                return jnp.sum(flat_o[::stride]) * jnp.float32(1e-38)

            return jax.lax.fori_loop(0, iterations, body, jnp.float32(0.0))

        jitted = jax.jit(looped)
        return lambda a_dev, bt_dev: jitted(a_dev, bt_dev, gather,
                                            plan_args)

    def measure_kernel_ms(self, a_dev, bt_dev, iterations: int = 50,
                          repeats: int = 3, order: str = "packed") -> float:
        from sddmm_tpu.utils.timing import diff_time_ms

        f_many = self.make_looped_fn(iterations, order=order)
        f_one = self.make_looped_fn(1, order=order)
        return diff_time_ms(lambda: float(f_many(a_dev, bt_dev)),
                            lambda: float(f_one(a_dev, bt_dev)),
                            iterations, repeats)
