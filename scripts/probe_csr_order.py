#!/usr/bin/env python3
"""On-device A/B of CSR-entry-order delivery strategies on a bench
matrix's committed packing: packed-order kernel alone vs kernel +
{sort, gather, window} conversion (ops/csr_order).  All strategies are
measured interleaved in one process so tunnel drift cannot fake the
ranking (probe_configs.py methodology).

VERDICT r3 next #3: the round-3 sort conversion was 30-150x the kernel
(geomean_csr_order 7.9 GFLOPS); target is csr-order within 2x of the
packed-order time.

Usage:
    python scripts/probe_csr_order.py --matrix clustered16 --k 128
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--matrix", default="clustered16")
    p.add_argument("--k", type=int, default=128)
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args(argv)

    import bench
    from sddmm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    from sddmm_tpu.data import generate
    from sddmm_tpu.ops.hybrid import HybridSDDMM
    from sddmm_tpu.ops.reference import sddmm_reference
    from sddmm_tpu.reorder.autotune import from_params
    from sddmm_tpu.utils.canary import format_canary, measure_canary
    from sddmm_tpu.utils.check import check_values
    from sddmm_tpu.utils.timing import gflops

    if jax.devices()[0].platform != "cpu":
        print(format_canary(measure_canary()), flush=True)

    cfg = bench.load_tuned_config(args.matrix, args.k) or {
        "alpha": 0.3, "delta": 0.05}
    if cfg.get("dense"):
        print(f"{args.matrix} k{args.k} is committed to the dense "
              "strategy; csr-order there is a plain (M,N)->nnz gather — "
              "probing the hybrid fallback config instead")
        cfg = {"alpha": 0.3, "delta": 0.05}
    csr = bench.suite(False)[args.matrix]()
    t0 = time.perf_counter()
    tuned = from_params(csr, args.k, alpha=cfg["alpha"],
                        delta=cfg["delta"], group_size=cfg.get("g", 1),
                        k_chunks=cfg.get("c", 1),
                        merge_superpanels=cfg.get("merge", True),
                        hub_cols=cfg.get("hub", 0))
    runner = HybridSDDMM(tuned.packed, k_chunks=cfg.get("c", 1),
                         use_pallas=bool(cfg.get("pallas", False)),
                         a_layout=cfg.get("a_layout", "rows"))
    a = generate.make_dense(csr.m, args.k, seed=1)
    b = generate.make_dense(args.k, csr.n, seed=2)
    ops = runner.prepare_operands(a, b=b)

    plan, _ = runner._window_plan()
    s_hist = {s: len(ids) for s, _, _, ids in plan.buckets}
    print(f"{args.matrix} k{args.k}: nnz={csr.nnz} "
          f"flat={tuned.packed.packed_size} blocks={plan.num_blocks} "
          f"window s: mean={plan.mean_s:.1f} max={plan.max_s} "
          f"buckets={s_hist} [{time.perf_counter()-t0:.0f}s prep]",
          flush=True)

    # correctness gate before timing anything
    golden = sddmm_reference(a, b, csr)
    flat = runner.run_padded(*ops, order="packed")
    for strat in ("window", "mxu", "gather"):
        res = check_values(golden, np.asarray(
            runner.to_csr_order(flat, strategy=strat)))
        print(f"contract[{strat}] "
              f"{'PASS' if res.passed else 'FAIL'} "
              f"max_rel={res.max_rel_err:.2e}", flush=True)
        if not res.passed:
            return 1

    strategies = {"packed": None, "csr:mxu": "mxu",
                  "csr:window": "window", "csr:gather": "gather"}
    times = {tag: [] for tag in strategies}
    for r in range(args.rounds):
        for tag, strat in strategies.items():
            if strat is None:
                order = "packed"
                runner.csr_strategy = None
            else:
                order = "csr"
                runner.csr_strategy = strat
            ms = runner.measure_kernel_ms(
                *ops, iterations=args.iterations, repeats=3, order=order)
            times[tag].append(ms)
            print(f"  round {r} [{tag}]: {ms:.4f} ms "
                  f"({gflops(csr.nnz, args.k, ms):.0f} GFLOPS)",
                  flush=True)
    print("--- medians ---")
    med_packed = float(np.median(times["packed"]))
    for tag in strategies:
        med = float(np.median(times[tag]))
        print(f"[{tag}]: {med:.4f} ms "
              f"({gflops(csr.nnz, args.k, med):.0f} GFLOPS) "
              f"x{med / med_packed:.2f} vs packed "
              f"sessions={[round(x, 4) for x in times[tag]]}")
    best = min((t for t in strategies if t != "packed"),
               key=lambda t: np.median(times[t]))
    print(f"winner: [{best}] {float(np.median(times[best])):.4f} ms "
          f"(x{float(np.median(times[best])) / med_packed:.2f} vs "
          "packed)")
    if jax.devices()[0].platform != "cpu":
        print("end " + format_canary(measure_canary()), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
