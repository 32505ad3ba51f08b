#!/usr/bin/env python3
"""Recompute bench roofline fractions offline (CPU-only, no TPU touch).

The roofline floor (``autotune.descriptor_floor_ms``) is a pure
host-side function of the packing + the measured gather-grid surface
(results/gather_grid.json).  When the grid gains a pattern (round 4
added ``hot64`` after bench_r4_k128 showed powerlaw's floor exceeding
its measured time — repeat factors ~30-100x post-hub, outside the 1/8
grid), the already-committed bench logs' ``roofline_fraction`` values
go stale.  Rather than burn TPU hours re-benching, this script rebuilds
each committed config's packing on CPU, re-prices sol/descriptor floors
with the CURRENT grid, and reports corrected fractions against the
logs' recorded timing medians.

Writes results/roofline_r4.json:
  {"k<K>": {"<matrix>": {"ms": ..., "sol_fraction": ...,
                         "roofline_fraction": ..., "floor_ms": ...,
                         "source_log": ...}}}

Usage: python scripts/recompute_roofline.py [--ks 32 64 128 256]
"""

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def bench_json(log: Path):
    """Last JSON line of a bench log (the record)."""
    out = None
    for line in log.read_text().splitlines():
        if line.startswith("{") and '"metric"' in line:
            out = json.loads(line)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ks", nargs="*", type=int,
                   default=[32, 64, 128, 256])
    p.add_argument("-o", "--output",
                   default="results/roofline_r4.json")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # CLAUDE.md rules 1/4

    import numpy as np

    import bench
    from sddmm_tpu.reorder.autotune import (descriptor_floor_ms,
                                            from_params)

    out = {}
    for k in args.ks:
        log = None
        for cand in (ROOT / f"results/bench_r5a_k{k}.log",
                     ROOT / f"results/bench_r4_k{k}.log",
                     ROOT / "results/bench_r4_k128.log"
                     if k == 128 else None,
                     ROOT / f"results/bench_r3_final_k{k}.log"):
            if cand is not None and cand.exists() \
                    and bench_json(cand):
                log = cand
                break
        if log is None:
            print(f"k{k}: no bench log; skip")
            continue
        rec = bench_json(log)
        per = {}
        for name, gen in bench.suite(quick=False).items():
            sess = rec.get("timing_sessions_ms", {}).get(name)
            if not sess:
                continue
            ms = float(np.median(sess))
            cfg = bench.load_tuned_config(name, k)
            if cfg is None:
                # no committed config: bench never ran this cell with
                # the default packing a bare from_params would build —
                # a floor for the wrong program is worse than no floor
                # (ADVICE r4)
                print(f"k{k} {name}: no committed tuned config; skip")
                continue
            cdt = cfg.get("dtype", "tf32")
            csr = gen()
            if cfg.get("dense"):
                from sddmm_tpu.reorder.autotune import (STREAM_GBPS,
                                                        _ELEM_BYTES)
                a_el, b_el = _ELEM_BYTES[cdt]
                sol_ms = ((csr.m * a_el + csr.n * b_el) * k
                          + csr.m * csr.n * 4) / (STREAM_GBPS * 1e6)
                floor_ms = sol_ms
            else:
                tuned = from_params(
                    csr, k, alpha=cfg.get("alpha", 0.3),
                    delta=cfg.get("delta", 0.05),
                    group_size=cfg.get("g", 1),
                    k_chunks=cfg.get("c", 1),
                    merge_superpanels=cfg.get("merge", True),
                    hub_cols=cfg.get("hub", 0), compute_dtype=cdt,
                    window_dp=cfg.get("window_dp", True),
                    sort_runs=cfg.get("sort_runs", "cid"),
                    sort_res=cfg.get("sort_res", "csr"),
                    b_cost_scale=cfg.get("b_cost_scale", 1.0))
                sol_ms = bench.sol_ms_of(tuned.packed, k, cdt)
                floor_ms = max(sol_ms, descriptor_floor_ms(
                    tuned.packed, k, cdt, cfg.get("c", 1),
                    cfg.get("a_layout", "rows")))
            ms = max(ms, sol_ms)  # bench's sub-floor clamp
            rec_cell = {"ms": round(ms, 4),
                        "sol_fraction": round(sol_ms / ms, 3),
                        "floor_ms": round(floor_ms, 4),
                        "source_log": log.name}
            if floor_ms > ms:
                # a "floor" above measured time is no floor — never
                # publish a fraction > 1 (VERDICT r4 next #4): the grid
                # is missing this cell's access pattern, say so
                rec_cell["roofline_fraction"] = None
                rec_cell["floor_status"] = (
                    "unbound: measured beats the modeled floor by "
                    f"{floor_ms / ms:.2f}x — the gather grid lacks "
                    "this config's access pattern; floor unknown")
            else:
                rec_cell["roofline_fraction"] = round(floor_ms / ms, 3)
            per[name] = rec_cell
            print(f"k{k} {name}: ms={ms:.4f} floor={floor_ms:.4f} "
                  f"roofline_fraction={floor_ms / ms:.3f}"
                  + (" (UNBOUND -> null)" if floor_ms > ms else ""),
                  flush=True)
        out[f"k{k}"] = per

    dest = ROOT / args.output
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
