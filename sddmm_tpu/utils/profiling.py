"""Profiling / tracing — the TPU-native upgrade of the reference's
cudaEvent-based ``CudaTimeCalculator`` (include/CudaTimeCalculator.cuh).

Two layers:

- ``trace(dir)``: captures a full ``jax.profiler`` device trace
  (HLO-level timeline, per-op HBM/MXU utilization) viewable in
  TensorBoard / Perfetto — the deep equivalent of nsight, which the
  reference does not integrate.
- ``annotate(name)``: a ``jax.profiler.TraceAnnotation`` context so host
  stages (reordering, packing) show up on the same timeline as device
  work.

Both degrade to no-ops if profiling is unavailable on the platform (the
tunneled single-chip setup does not always support trace capture).
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler device trace into ``log_dir``."""
    log_dir = str(log_dir)
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named host-side span on the profiler timeline (no-op fallback)."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
