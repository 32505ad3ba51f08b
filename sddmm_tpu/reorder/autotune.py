"""Cost-model-driven configuration search for the hybrid SDDMM.

The reference ships fixed defaults (alpha=0.3, delta=0.3,
include/Options.hpp:38-41) tuned for an RTX 4090's tensor-core/CUDA-core
balance.  TPU economics are different — the op is HBM-bound, the gather
engine runs at ~320 GB/s, and a dense-tile column costs a fixed ~640 B
while a residual nnz costs ~1 KB — so the best delta is usually much
lower, and superpanel merging changes the balance again.  This module
estimates runtime from the *packing statistics alone* (no device needed)
and picks the best configuration per matrix.

Model (bytes per call, fp32; bf16 halves the gather terms):
  dense tiles:  (B-gather + A-gather + tile write) per lane column
  residual:     2*K*4 bytes of gathers + intermediates per nnz
  matmul time:  group count / measured groups-per-second
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import numpy as np

from sddmm_tpu import config
from sddmm_tpu.data.sparse import CSR
from sddmm_tpu.reorder.bsmr import BSMR
from sddmm_tpu.reorder.pack import (GROUP_CELLS, GROUP_LANES, SUPER_CELLS,
                                    PackedMatrix, pack)

# Empirical single-chip constants (TPU v5e via measurement; see
# docs/performance.md): gather engine ~320 GB/s, dense streams ~800 GB/s,
# batched (16,128,K=128) matmuls ~10.3 M groups/s (supertiles count 8x).
GATHER_GBPS = 320.0
STREAM_GBPS = 800.0
GROUPS_PER_SEC = 10.3e6


@dataclasses.dataclass
class TunedConfig:
    alpha: float
    delta: float
    merge_superpanels: bool
    est_ms: float
    packed: PackedMatrix
    bsmr: BSMR


def estimate_ms(packed: PackedMatrix, k: int,
                compute_dtype: str = "float32") -> float:
    """Predicted single-chip kernel time (ms) for one hybrid SDDMM call."""
    el = 2 if compute_dtype == "bfloat16" else 4
    k_bytes = k * el

    # B gather rows: one (K,) row per lane column of every tile.
    b_rows = packed.num_super * GROUP_LANES + packed.num_groups * GROUP_LANES
    a_rows = packed.num_super * 128 + packed.num_groups * 16
    gather_bytes = (b_rows + a_rows) * k_bytes
    # Residual: A row + B row gathered per nnz, plus elementwise traffic.
    gather_bytes += 2 * packed.nnz_res * k_bytes
    # Materialized gather outputs are re-read by the matmul / reduce, and
    # tiles + residual values are written once (fp32).
    stream_bytes = (b_rows + a_rows) * k_bytes \
        + (packed.num_super * SUPER_CELLS
           + packed.num_groups * GROUP_CELLS) * 4 \
        + 2 * packed.nnz_res * k_bytes + packed.nnz_res * 4

    t_gather = gather_bytes / (GATHER_GBPS * 1e6)   # ms
    t_stream = stream_bytes / (STREAM_GBPS * 1e6)
    t_matmul = (packed.num_groups + 8 * packed.num_super) \
        / GROUPS_PER_SEC * 1e3 * (k / 128.0) * (2 if el == 4 else 1)
    # Gather and stream phases barely overlap in practice; matmul overlaps
    # partially with the gathers.
    return t_gather + t_stream + max(t_matmul - t_gather, 0.0)


def autotune(csr: CSR, k: int = 128,
             alphas: Sequence[float] = (0.3,),
             deltas: Sequence[float] = (0.0, 0.05, 0.3),
             compute_dtype: str = "float32",
             method: str = "auto",
             verbose: bool = False) -> TunedConfig:
    """Pick (alpha, delta, merge) minimizing the modeled kernel time.

    Row reordering is computed once per alpha and reused across deltas
    (the same reuse trick as the reference's test mode, src/sddmm.cu:64-89).
    """
    best: Optional[TunedConfig] = None
    for alpha in alphas:
        bsmr = BSMR(alpha, 0.0, csr, method=method, compute=False)
        bsmr.run_row_reordering(csr)
        for delta in deltas:
            bsmr.run_col_reordering(csr, delta=delta)
            for merge in (False, True):
                packed = pack(csr, bsmr, merge_superpanels=merge)
                est = estimate_ms(packed, k, compute_dtype)
                if verbose:
                    print(f"  a={alpha} d={delta} merge={merge}: "
                          f"nS={packed.num_super} nG={packed.num_groups} "
                          f"res={packed.nnz_res} est={est:.3f}ms")
                if best is None or est < best.est_ms:
                    import copy
                    best = TunedConfig(alpha, delta, merge, est, packed,
                                       copy.copy(bsmr))
    return best
