"""Persistent XLA compilation cache.

TPU compiles of the hybrid kernel take 20-40 s per distinct shape
signature and dominate the autotune shootout's device time (~10
finalists per matrix).  The persistent cache makes any re-compilation
of an identical program (bench re-runs on committed configs, probe
re-runs, suite --resume) near-free across processes.

Reference counterpart: CUDA kernels are AOT-compiled by nvcc; this
restores the same run-many-times economics for the JIT path.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point JAX's compilation cache at a repo-local dir
    (override with SDDMM_TPU_CACHE_DIR; set to '0' to disable)."""
    env = os.environ.get("SDDMM_TPU_CACHE_DIR")
    if env == "0":
        return ""
    cache_dir = path or env or _DEFAULT_DIR
    import jax
    # XLA:CPU AOT cache entries embed host machine features and can
    # SIGILL when loaded under a different flag set (observed
    # cross-process feature mismatch warnings); CPU compiles are cheap
    # anyway — cache only accelerator compilations.  Checked via the
    # configured platform string, NOT jax.devices(): initializing the
    # backend here would hang during tunnel outages.
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if platforms.split(",")[0] == "cpu":
        return ""
    if jax.config.jax_compilation_cache_dir != cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compilation that took >= 0.5 s (default 1 s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    return cache_dir
