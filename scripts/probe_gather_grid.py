#!/usr/bin/env python3
"""Gather-engine rate grid: XLA ``take`` rows/s over descriptor width x
source footprint x index pattern.

Feeds two consumers:

- The autotune COST model (uniform-pattern rates: what a typical config
  pays) — ``calibrate.py`` already measures the uniform slice.
- The descriptor-rate ROOFLINE (``autotune.descriptor_floor_ms``):
  a floor must be optimistic-but-achievable, so it prices descriptors
  at the BEST measured pattern (packed-tile gathers are clustered and
  heavily repeated — hot rows stay resident, measured up to ~4x the
  uniform rate).  Round 3 shipped a max-of-maxima floor that never
  bound (VERDICT r3 weak #3); the round-4 recalibration priced wide
  descriptors at uniform-random rates so pessimistic the "floor"
  exceeded measured time at K=256 (roofline_fraction 3.9-4.9 in
  bench_r3_final_k256.log).  This grid replaces guesswork with the
  measured surface, including the >=1 KB widths the a_layout="panels"
  path actually issues (16-row x K panels: 8 KB at K=128, 16 KB at
  K=256).

Patterns:
- ``uniform``: iid uniform over the source (the calibrate.py slice).
- ``tiled``:   sorted blocks of 16 consecutive rows at random starts —
               the A-panel / packed-tile locality class.
- ``hot``:     uniform over a 1/8 subset of rows (repeat-heavy) — the
               B-column reuse class (_REPEAT_COST's regime).
- ``hot64``:   uniform over a 1/64 subset — the power-law residual
               class (post-hub row/col repeat factors run ~30-100x;
               the 1/8 grid under-measured the achievable rate there,
               which showed up as roofline_fraction 2.9 > 1 on
               powerlaw in bench_r4_k128.log — an impossible floor).
- ``seq``:     SORTED uniform draw (monotone source addresses with
               repeats and gaps) — the container-sorted window class
               the real kernels produce after the round-5
               ``sort_runs="gid"`` layout, and the access pattern the
               K>=128 kernels already approximate (VERDICT r4 next #4:
               the grid was missing the kernels' actual best case, so
               6/20 roofline fractions exceeded 1).

The output records the session's canary (``{"canary": {...}}``) so
``autotune.load_gather_grid`` can normalize the rates to
calibration-day chip speed (ADVICE r4: a grid measured on a slow
session inflates every floor by the drift factor).

Writes results/gather_grid.json:
  {"<pattern>": {"<row_bytes>": {"<src_mb>": M rows/s}}}

Usage:  python scripts/probe_gather_grid.py [--quick]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", default="results/gather_grid.json")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    from sddmm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sddmm_tpu.utils.canary import format_canary, measure_canary
    from sddmm_tpu.utils.timing import measure_loop_ms

    canary_start = None
    if jax.devices()[0].platform != "cpu":
        canary_start = measure_canary()
        print(format_canary(canary_start), flush=True)

    rng = np.random.default_rng(0)
    scale = 64 if args.quick else 1
    widths = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)
    footprints = (2, 8, 16, 64)
    # keep the gather OUTPUT fixed at ~64 MB so the write side never
    # becomes the variable; descriptors per call = payload / width
    payload_bytes = (64 * 1024 * 1024) // scale

    out = {"device": str(jax.devices()[0]),
           "platform": jax.devices()[0].platform}

    def make_idx(pattern: str, rows: int, n_idx: int) -> np.ndarray:
        if pattern == "uniform":
            return rng.integers(0, rows, n_idx)
        if pattern == "hot":
            hot = max(rows // 8, 1)
            return rng.integers(0, hot, n_idx)
        if pattern == "hot64":
            hot = max(rows // 64, 1)
            return rng.integers(0, hot, n_idx)
        if pattern == "tiled":
            # blocks of 16 consecutive rows at sorted random starts
            nblk = max(n_idx // 16, 1)
            starts = np.sort(rng.integers(0, max(rows - 16, 1), nblk))
            idx = (starts[:, None] + np.arange(16)[None, :]).reshape(-1)
            return idx[:n_idx]
        if pattern == "seq":
            # monotone source addresses with repeats and gaps — the
            # container-sorted window class (sort_runs="gid")
            return np.sort(rng.integers(0, rows, n_idx))
        raise ValueError(pattern)

    for pattern in ("uniform", "tiled", "hot", "hot64", "seq"):
        grid = {}
        for rb in widths:
            cols = rb // 4
            per_w = {}
            for mb in footprints:
                rows = max((mb * 1024 * 1024) // rb // scale, 32)
                n_idx = max(payload_bytes // rb, 64)
                src = jnp.asarray(
                    rng.random((rows, cols), dtype=np.float32))
                idx = jnp.asarray(
                    make_idx(pattern, rows, n_idx).astype(np.int32))

                def body(c, src, idx):
                    i2 = jnp.where(c > jnp.float32(-1e30), idx, 0)
                    return jnp.take(src, i2, axis=0)

                ms = measure_loop_ms(body, (src, idx),
                                     iterations=3 if args.quick else 10,
                                     repeats=3)
                rate = n_idx / ms / 1e3  # M rows/s
                per_w[str(mb)] = round(rate, 1)
                print(f"{pattern:8s} {rb:6d} B  {mb:3d} MB  "
                      f"{rate:9.1f} M rows/s  "
                      f"({rate * rb / 1e3:.1f} GB/s)", flush=True)
            grid[str(rb)] = per_w
        out[pattern] = grid

    if jax.devices()[0].platform != "cpu":
        canary_end = measure_canary()
        print("end " + format_canary(canary_end), flush=True)
        # session tag for load_gather_grid's normalization: gather
        # ratio = geomean of start/end (measured/ref; >1 = slow session)
        rs = [c.get("gather_ratio") for c in (canary_start, canary_end)
              if c and c.get("gather_ratio")]
        tag = dict(canary_end)
        if rs:
            tag["gather_ratio"] = round(
                float(np.exp(np.mean(np.log(rs)))), 3)
        out["canary"] = tag
    dest = Path(args.output)
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
