"""Chip-rate canary: two fixed micro-measurements tagging every
measurement session so numbers taken on different days are comparable.

The axon tunnel's effective chip rate drifts (observed: up to 1.86x
between a builder probe session and the driver bench on identical
committed configs, VERDICT r3 "weak #2" — day-scale swings of ~35% in
results/probe_variance_clustered16_r3.log).  Nothing in a single
session can tell "this config is faster" from "the chip was faster
today".  The canary fixes that: every probe/bench session first times

* ``matmul``: a fixed (2048, 2048) x (2048, 2048) fp32 dot at
  ``Precision.HIGH`` — the MXU + stream class the hybrid's tile dots
  live in;
* ``gather``: a fixed 131072-row XLA ``take`` of 512-byte rows from an
  8 MB source — the descriptor-rate class that binds the gather-fed
  kernels (docs/performance.md "descriptor-rate roofline").

and reports each alongside the committed reference time (calibrated
once, uncontended, on the bench chip).  ``ratio`` > 1 means the chip
ran slower than at calibration; dividing a session's measured kernel
times by its canary ratio makes cross-day medians comparable
(``normalize="gather"`` for gather-bound hybrid configs, ``"matmul"``
for the dense class, geometric mean for mixed).

No reference counterpart (a local RTX 4090 does not drift); this is
tunnel hygiene, same family as utils/tpulock.
"""

from __future__ import annotations

import numpy as np

# Reference canary times (ms/iteration), measured uncontended on the
# bench chip (TPU v5e via axon, 2026-08-19, this module's __main__).
# Re-calibrate with ``python -m sddmm_tpu.utils.canary --calibrate``
# whenever the hardware or tunnel changes.
CANARY_REF_MS = {"matmul": None, "gather": None}  # set below

# Recalibrated 2026-08-20 (round 5): medians over the 7 round-5 queue
# sessions (matmul 0.232-0.293, gather 0.260-0.313).  The round-4
# reference (matmul 0.326, gather 0.319) came from a session whose
# matmul samples spread 1.254/0.326/0.261 — its matmul value was ~25%
# above the steady-state rate, so every later session read x0.69-0.90
# and matmul-weighted normalization deflated healthy numbers (the
# BENCH_r04 "canary explains clustered128" confusion).  Ratios against
# THIS reference read ~1.0 on a typical day.
CANARY_REF_MS = {"matmul": 0.266, "gather": 0.298}

_MM_N = 2048           # matmul canary: (N, N) @ (N, N) fp32 HIGH
_GA_SRC_ROWS = 16384   # gather canary source: (rows, 128) fp32 = 8 MB
_GA_ROWS = 131072      # gathered rows per iteration (512 B descriptors)


def _operands():
    rng = np.random.default_rng(1337)
    x = rng.random((_MM_N, _MM_N), dtype=np.float32)
    src = rng.random((_GA_SRC_ROWS, 128), dtype=np.float32)
    idx = rng.integers(0, _GA_SRC_ROWS, size=_GA_ROWS).astype(np.int32)
    return x, src, idx


def measure_canary(iterations: int = 24, repeats: int = 3) -> dict:
    """Time the two canaries on the default device.

    Returns ``{"matmul_ms", "gather_ms", "matmul_ratio", "gather_ratio",
    "ratio"}`` — ratios are measured/reference (None when no reference
    is committed); ``ratio`` is the geometric mean of the two.
    """
    import jax
    import jax.numpy as jnp

    from sddmm_tpu.utils.timing import measure_loop_ms

    x, src, idx = _operands()
    x_d = jnp.asarray(x)
    src_d = jnp.asarray(src)
    idx_d = jnp.asarray(idx)

    # carry-perturbed bodies (hoist-proof: docs/performance.md
    # "Timing methodology") — an always-true predicate on the carry
    # makes each loop iteration opaque to XLA's CSE/hoisting.
    # The barrier before the tiny output slice is load-bearing: XLA
    # rewrites slice(dot)->dot(slice) and slice(gather)->gather(slice),
    # silently timing a 1-row kernel (observed: 820 "TFLOPS").
    def mm_body(c, x_d):
        x2 = x_d + c * jnp.float32(1e-38)
        y = jax.lax.dot(x2, x_d, precision=jax.lax.Precision.HIGH)
        return jax.lax.optimization_barrier(y)[:1, :1]

    def ga_body(c, src_d, idx_d):
        i2 = jnp.where(c > jnp.float32(-1e30), idx_d, 0)
        y = jnp.take(src_d, i2, axis=0)
        return jax.lax.optimization_barrier(y)[::4096, :1]

    mm_ms = measure_loop_ms(mm_body, (x_d,), iterations=iterations,
                            repeats=repeats)
    ga_ms = measure_loop_ms(ga_body, (src_d, idx_d),
                            iterations=iterations, repeats=repeats)
    out = {"matmul_ms": round(mm_ms, 4), "gather_ms": round(ga_ms, 4)}
    ratios = []
    for key, ms in (("matmul", mm_ms), ("gather", ga_ms)):
        ref = CANARY_REF_MS.get(key)
        r = round(ms / ref, 3) if ref else None
        out[f"{key}_ratio"] = r
        if r:
            ratios.append(r)
    out["ratio"] = (round(float(np.exp(np.mean(np.log(ratios)))), 3)
                    if ratios else None)
    return out


def format_canary(c: dict) -> str:
    """One parseable log line: ``canary: matmul 0.412 ms (x1.03) gather
    0.305 ms (x0.98)``."""
    def part(key):
        r = c.get(f"{key}_ratio")
        rs = f" (x{r:.2f})" if r else ""
        return f"{key} {c[f'{key}_ms']:.4f} ms{rs}"
    return f"canary: {part('matmul')} {part('gather')}"


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--calibrate", action="store_true",
                   help="3 sessions; print the medians to commit as "
                        "CANARY_REF_MS")
    p.add_argument("--iterations", type=int, default=24)
    args = p.parse_args(argv)
    if args.calibrate:
        mm, ga = [], []
        for s in range(3):
            c = measure_canary(iterations=args.iterations)
            mm.append(c["matmul_ms"])
            ga.append(c["gather_ms"])
            print(f"session {s}: {format_canary(c)}", flush=True)
        print(f'CANARY_REF_MS = {{"matmul": {np.median(mm):.3f}, '
              f'"gather": {np.median(ga):.3f}}}')
    else:
        print(format_canary(measure_canary(iterations=args.iterations)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
