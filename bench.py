"""Benchmark entry point: one JSON line with the headline metric.

Headline: geometric-mean hybrid BSMR SDDMM throughput (GFLOPS =
2*NNZ*K/time) at K=128 over a 4-matrix suite spanning the regimes the
reference's 503-matrix SuiteSparse suite covers (fine block structure,
coarse block structure, power-law graph, banded).

Reproducibility contract (round 3): per-matrix configs come from the
committed ``results/tuned_configs.json`` (the best measured shootout
winners — the analogue of the reference's fixed Options defaults), so
two runs of ``python bench.py`` execute the identical program; the
kernel is then timed in ``--sessions`` independent loop-differenced
sessions and the **median** session is reported, with the min/median/max
spread in the JSON and a loud warning when spread > 15% (the axon-tunnel
chip rate was observed to swing 2x between runs hours apart —
docs/performance.md "Timing methodology").  ``--retune`` re-runs the
on-device autotune shootout instead (src/sddmm.cu:62-118 analogue).

``vs_baseline`` compares against the reference's published mean K=128
GFLOPS over its SuiteSparse suite on an RTX 4090 (3452, BASELINE.md).
``per_matrix_csr_order`` reports the apples-to-apples number whose
kernel time *includes* delivering values in CSR entry order (the
reference's kernels write matrixP[csrIdx] directly,
src/sddmmKernel.cu:213-355); the headline stays packed-order — the
framework's native layout — with both visible.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# BASELINE.md: reference means over its 503-matrix suite, RTX 4090
REFERENCE_MEAN_GFLOPS = {32: 2158.0, 64: 2966.0, 128: 3452.0, 256: 3460.0}

TUNED_CONFIGS = Path(__file__).resolve().parent / "results" / \
    "tuned_configs.json"


def suite(quick: bool):
    from sddmm_tpu.data import generate
    if quick:
        return {
            "clustered16": lambda: generate.block_clustered(
                64, 64, block_prob=0.08, block_density=0.7,
                noise_density=0.0005, seed=42),
            "powerlaw": lambda: generate.powerlaw_graph(
                2048, avg_degree=16, seed=44),
        }
    return {
        "clustered16": lambda: generate.block_clustered(
            1024, 1024, block_prob=0.008, block_density=0.65,
            noise_density=0.00001, seed=42),
        "clustered128": lambda: generate.block_clustered(
            128, 128, group_rows=128, group_cols=128, block_prob=0.025,
            block_density=0.3, noise_density=0.00001, seed=43),
        "powerlaw": lambda: generate.powerlaw_graph(
            32768, avg_degree=40, seed=44),
        "banded": lambda: generate.banded(
            24576, 24576, bandwidth=45, fill=0.55, seed=45),
        # true DLMC density class (pruned-ML weights are 50-90% sparse,
        # density 0.1-0.5 — the reference's DLMC corpus); the suite's
        # older dlmc_like_* synthetics are hypersparse and mislabeled
        "dlmc": lambda: generate.random_sparse(
            4096, 4096, density=0.2, seed=46),
    }


def load_tuned_config(name: str, k: int):
    try:
        data = json.loads(TUNED_CONFIGS.read_text())
    except (OSError, json.JSONDecodeError):
        return None
    return data.get(f"k{k}", {}).get(name)


# committed-config schema: key -> required type(s).  "dense" entries
# carry only {"dense": true}.
_CFG_KEYS = {"alpha": float, "delta": float, "g": int, "c": int,
             "merge": bool, "hub": int, "pallas": bool,
             "a_layout": str, "window_dp": bool, "dense": bool,
             "dtype": str, "sort_runs": str, "sort_res": str,
             "b_cost_scale": float, "rowslab": int, "rowslab_pre": int}
_CFG_DTYPES = ("float32", "tf32", "mixed", "float16", "bfloat16")


def validate_tuned_configs() -> list:
    """Parse + schema-check every committed config.  Runs on EVERY bench
    invocation including ``--quick`` so the CPU smoke run catches a
    malformed entry (typo'd key, wrong type, unknown a_layout) before it
    crashes a 30-minute TPU run (VERDICT r3 weak #8)."""
    errors = []
    try:
        data = json.loads(TUNED_CONFIGS.read_text())
    except OSError:
        return errors  # no committed configs is a valid state
    except json.JSONDecodeError as e:
        return [f"tuned_configs.json: invalid JSON: {e}"]
    for kkey, per_matrix in data.items():
        if kkey.startswith("_"):
            continue
        if not (kkey.startswith("k") and kkey[1:].isdigit()):
            errors.append(f"tuned_configs.json: bad K key {kkey!r}")
            continue
        for name, cfg in per_matrix.items():
            where = f"tuned_configs.json[{kkey}][{name}]"
            if not isinstance(cfg, dict):
                errors.append(f"{where}: not an object")
                continue
            for key, val in cfg.items():
                want = _CFG_KEYS.get(key)
                if want is None:
                    errors.append(f"{where}: unknown key {key!r}")
                elif want is float:
                    if not isinstance(val, (int, float)):
                        errors.append(f"{where}.{key}: not a number")
                elif want is int:
                    if not isinstance(val, int) or isinstance(val, bool):
                        errors.append(f"{where}.{key}: not an int")
                elif not isinstance(val, want):
                    errors.append(f"{where}.{key}: expected "
                                  f"{want.__name__}")
            if cfg.get("dense"):
                extra = set(cfg) - {"dense"}
                if extra:
                    errors.append(f"{where}: dense entry with extra "
                                  f"keys {sorted(extra)}")
            else:
                for req in ("alpha", "delta"):
                    if req not in cfg:
                        errors.append(f"{where}: missing {req!r}")
                if cfg.get("a_layout", "rows") not in ("rows", "panels"):
                    errors.append(f"{where}.a_layout: "
                                  f"{cfg['a_layout']!r} not in "
                                  "('rows', 'panels')")
                if cfg.get("dtype", "tf32") not in _CFG_DTYPES:
                    errors.append(f"{where}.dtype: {cfg['dtype']!r} "
                                  f"not in {_CFG_DTYPES}")
                if cfg.get("sort_runs", "cid") not in ("cid", "gid"):
                    errors.append(f"{where}.sort_runs: "
                                  f"{cfg['sort_runs']!r} not in "
                                  "('cid', 'gid')")
                if cfg.get("sort_res", "csr") not in ("csr", "gid"):
                    errors.append(f"{where}.sort_res: "
                                  f"{cfg['sort_res']!r} not in "
                                  "('csr', 'gid')")
    return errors


def sol_ms_of(packed, k: int, compute_dtype: str) -> float:
    """Speed-of-light floor: minimum HBM bytes this packing must move —
    UNIQUE gathered B rows and A rows (repeated descriptors can be
    served on-chip) + one pass of the packed output — at the measured
    stream bandwidth."""
    from sddmm_tpu.reorder.autotune import _ELEM_BYTES
    a_el, b_el = _ELEM_BYTES[compute_dtype]
    uniq_gids = len(np.unique(np.concatenate([
        packed.super_gids.reshape(-1), packed.quad_gids.reshape(-1),
        packed.pair_gids.reshape(-1), packed.group_gids.reshape(-1),
        packed.res_gids.reshape(-1)])))
    uniq_rows = min(packed.m, packed.num_panels * 16)
    sol_bytes = (uniq_gids * packed.group_size * b_el
                 + uniq_rows * a_el) * k + packed.packed_size * 4
    from sddmm_tpu.reorder.autotune import STREAM_GBPS
    return sol_bytes / (STREAM_GBPS * 1e6)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small matrices (CI/CPU-friendly)")
    parser.add_argument("--k", type=int, default=128)
    parser.add_argument("--iterations", type=int, default=40)
    parser.add_argument("--sessions", type=int, default=3,
                        help="independent timing sessions; median wins")
    parser.add_argument("--retune", action="store_true",
                        help="re-run the on-device autotune shootout "
                             "instead of the committed tuned configs")
    parser.add_argument("--save-tuned", action="store_true",
                        help="with --retune: write each winner back to "
                             "results/tuned_configs.json")
    parser.add_argument("--compute-dtype", default="tf32",
                        choices=["float32", "tf32", "mixed", "float16",
                                 "bfloat16"])
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax

    if args.quick:
        # --quick is the CPU smoke path (TPU-quick numbers are dispatch
        # noise); pin CPU in-process — the env var is overridden by the
        # axon sitecustomize, and touching a down tunnel hangs.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sddmm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from sddmm_tpu.data import generate
    from sddmm_tpu.ops.csr_sddmm import csr_sddmm_jax
    from sddmm_tpu.ops.hybrid import HybridSDDMM
    from sddmm_tpu.utils.timing import gflops, measure_loop_ms
    from sddmm_tpu.reorder.autotune import (autotune, descriptor_floor_ms,
                                            from_params, mxu_ms)

    def log(msg):
        if args.verbose:
            print(msg, file=sys.stderr)

    cfg_errors = validate_tuned_configs()
    if cfg_errors:
        # malformed committed configs must fail LOUDLY in --quick (CI)
        # rather than 25 minutes into a TPU run
        for e in cfg_errors:
            print(f"ERROR: {e}", file=sys.stderr)
        raise SystemExit(f"{len(cfg_errors)} malformed entries in "
                         f"{TUNED_CONFIGS}")

    on_device = jax.devices()[0].platform != "cpu"
    warnings = []
    if on_device:
        # exclusive-chip hygiene (CLAUDE.md rule 1): evict a crash-safe
        # background sweep by its exact recorded pgid, wait out anything
        # else, then hold the lock ourselves for the whole run
        from sddmm_tpu.utils import tpulock
        warnings += tpulock.preempt_preemptible(
            log=lambda m: print(m, file=sys.stderr))
        if not tpulock.wait_free(
                max_wait_s=float(os.environ.get(
                    "SDDMM_TPU_LOCK_WAIT_S", "900")),
                log=lambda m: print(m, file=sys.stderr)):
            warnings.append("tpulock: chip still held by another "
                            "measurement; numbers may be contended")
        tpulock.acquire("bench")
    canary_start = canary_end = None
    if on_device:
        # chip-rate canary (VERDICT r3 next #4): tags this session's
        # effective chip speed vs the committed calibration so numbers
        # reproduce across days (tunnel drift observed up to 1.86x)
        from sddmm_tpu.utils.canary import format_canary, measure_canary
        canary_start = measure_canary()
        log(format_canary(canary_start))
        r = canary_start.get("ratio")
        if r and not (0.75 <= r <= 1.35):
            warnings.append(
                f"canary ratio {r} — chip rate far from calibration; "
                "absolute GFLOPS not comparable with committed records "
                "without normalization")
    results = {}
    results_csr_order = {}
    sols = {}
    roofs = {}
    csr_ratio = {}
    sessions_ms = {}
    tuning_s = {}
    clamped = {}   # per-matrix: median was below the bytes floor
    gweight = {}   # per-matrix gather-boundedness weight in [0, 1]
    for name, gen in suite(args.quick).items():
        t0 = time.perf_counter()
        csr = gen()
        # --quick uses different (tiny) matrices, so the committed
        # full-suite configs don't apply there
        cfg = (None if (args.retune or args.quick)
               else load_tuned_config(name, args.k))
        dense_sel = bool(cfg.get("dense")) if cfg is not None else False
        # a committed config may pin its own storage/compute dtype (the
        # round-4 split fix made float16 genuinely ~16-mantissa-bit —
        # at K=256 it moves the B descriptor from the 1 KB slow class
        # into the 512 B sweet spot); validated at fold time like every
        # other committed key
        cdt = (cfg or {}).get("dtype", args.compute_dtype)
        tuned = None
        if cfg is not None and not dense_sel:
            tuned = from_params(
                csr, args.k, alpha=cfg["alpha"], delta=cfg["delta"],
                group_size=cfg.get("g", 1), k_chunks=cfg.get("c", 1),
                merge_superpanels=cfg.get("merge", True),
                hub_cols=cfg.get("hub", 0),
                compute_dtype=cdt,
                window_dp=cfg.get("window_dp", True),
                sort_runs=cfg.get("sort_runs", "cid"),
                sort_res=cfg.get("sort_res", "csr"),
                b_cost_scale=cfg.get("b_cost_scale", 1.0),
                hot_rows=cfg.get("rowslab_pre", 0) or cfg.get("rowslab", 0),
                hot_rows_pre=bool(cfg.get("rowslab_pre", 0)))
            tuned.use_pallas = bool(cfg.get("pallas", False))
            tuned.a_layout = cfg.get("a_layout", "rows")
        elif cfg is None:
            tuned = autotune(csr, k=args.k,
                             compute_dtype=args.compute_dtype,
                             measure=on_device)
            dense_sel = getattr(tuned, "dense", False)
            if args.save_tuned and not args.quick:
                if dense_sel:
                    new_cfg = {"dense": True}
                else:
                    new_cfg = {"alpha": tuned.alpha,
                               "delta": tuned.delta,
                               "g": tuned.group_size,
                               "c": tuned.k_chunks,
                               "merge": tuned.merge_superpanels}
                    if tuned.hub_cols:
                        new_cfg["hub"] = tuned.hub_cols
                    if getattr(tuned, "use_pallas", False):
                        new_cfg["pallas"] = True
                    if getattr(tuned, "a_layout", "rows") != "rows":
                        new_cfg["a_layout"] = tuned.a_layout
                try:
                    data = json.loads(TUNED_CONFIGS.read_text())
                except (OSError, json.JSONDecodeError):
                    data = {}
                data.setdefault(f"k{args.k}", {})[name] = new_cfg
                TUNED_CONFIGS.write_text(json.dumps(data, indent=4)
                                         + "\n")
                log(f"{name}: saved tuned config {new_cfg}")
            if dense_sel:
                tuned = None
        if dense_sel:
            # dense-tiling strategy (true-DLMC density class): one MXU
            # dot, zero index gathers — see ops/dense.DenseSDDMM and
            # scripts/probe_dense_dlmc.py for the measured decision
            from sddmm_tpu.ops.dense import DenseSDDMM
            from sddmm_tpu.reorder.autotune import _ELEM_BYTES
            runner = DenseSDDMM.from_csr(csr,
                                         compute_dtype=cdt)
            tuning_s[name] = round(time.perf_counter() - t0, 1)
            a = generate.make_dense(csr.m, args.k, seed=1)
            b = generate.make_dense(args.k, csr.n, seed=2)
            a_pad, bt_pad = runner.prepare_operands(a, b=b)
            from sddmm_tpu.reorder.autotune import STREAM_GBPS
            a_el, b_el = _ELEM_BYTES[cdt]
            sol_ms = ((csr.m * a_el + csr.n * b_el) * args.k
                      + csr.m * csr.n * 4) / (STREAM_GBPS * 1e6)
            packed = None
        else:
            tuning_s[name] = round(time.perf_counter() - t0, 1)
            packed = tuned.packed
            runner = HybridSDDMM(packed,
                                 compute_dtype=cdt,
                                 k_chunks=tuned.k_chunks,
                                 use_pallas=getattr(tuned, "use_pallas",
                                                    False),
                                 a_layout=getattr(tuned, "a_layout",
                                                  "rows"))
            a = generate.make_dense(csr.m, args.k, seed=1)
            b = generate.make_dense(args.k, csr.n, seed=2)
            a_pad, bt_pad = runner.prepare_operands(a, b=b)
            sol_ms = sol_ms_of(packed, args.k, cdt)

        # Independent timing sessions; each is a loop-differenced min
        # (dispatch noise is additive within a session), the median
        # across sessions rejects chip-rate swings between sessions.
        n_sessions = 1 if args.quick else max(args.sessions, 1)
        sess = []
        it_n = args.iterations
        s = 0
        while s < n_sessions:
            if sess and min(sess) < 0.1 and not args.quick:
                # sub-100 us cells: the loop-differenced sample is noise-
                # dominated through the tunnel (the dlmc floor-clamp
                # class, VERDICT r4 next #7) — more loop iterations and
                # more sessions shrink the relative error
                it_n = max(it_n, 2 * args.iterations)
                n_sessions = max(n_sessions, 5)
            ms_s = runner.measure_kernel_ms(
                a_pad, bt_pad, iterations=it_n,
                repeats=4, order="packed")
            if ms_s < 0.7 * sol_ms:
                # faster than the matrix's own minimum-bytes floor:
                # a degenerate loop-difference sample — remeasure once
                ms_r = runner.measure_kernel_ms(
                    a_pad, bt_pad, iterations=args.iterations,
                    repeats=4, order="packed")
                if ms_r >= 0.7 * sol_ms:
                    ms_s = ms_r
                else:
                    warnings.append(
                        f"{name}: session {s} below SoL floor "
                        f"({ms_s:.4f} ms < 0.7*{sol_ms:.4f} ms)")
            sess.append(ms_s)
            s += 1
        ms = float(np.median(sess))
        clamped[name] = bool(ms < sol_ms)
        if ms < sol_ms:
            # A median below the matrix's own minimum-bytes floor is
            # physically impossible (observed on the dense dlmc cell:
            # the loop-differenced samples under-count when the tunnel
            # inflates the 1-iteration program).  Record the floor, not
            # the fantasy — raw samples stay in timing_sessions_ms.
            warnings.append(
                f"{name}: median {ms:.4f} ms below the bytes floor — "
                f"clamped to {sol_ms:.4f} ms")
            ms = sol_ms
        spread = (max(sess) - min(sess)) / ms if ms > 0 else 0.0
        if spread > 0.15:
            warnings.append(
                f"{name}: timing spread {spread:.0%} across "
                f"{n_sessions} sessions ({[round(x, 4) for x in sess]})"
                " — tunnel/chip load variance; treat with caution")
        sessions_ms[name] = [round(x, 4) for x in sess]
        g = gflops(csr.nnz, args.k, ms)
        results[name] = g
        sols[name] = round(sol_ms / ms, 3)
        # Achievable roofline: the unique-bytes floor OR the gather
        # engine's descriptor-issue floor, whichever binds.  The bytes
        # floor alone is unreachable for descriptor-bound regimes
        # (docs/performance.md "descriptor-rate roofline").
        if packed is None:
            # dense strategy: the stream floor (A + B reads + the full
            # (M, N) write — that IS this cell's sol_ms) is the only
            # defensible floor.  estimate_dense_ms's MXU term is a
            # TUNING model, not a floor: the measured plain dot beat it
            # 2.4x (probe_dense_dlmc_r3), and a floor above measured
            # time is no floor (the round-3 K=256 lesson).
            roof_ms = sol_ms
            gweight[name] = 0.0  # MXU/stream-bound, no gathers at all
        else:
            dfl_ms = descriptor_floor_ms(
                packed, args.k, cdt, tuned.k_chunks,
                getattr(tuned, "a_layout", "rows"))
            roof_ms = max(sol_ms, dfl_ms)
            # gather share of the modeled kernel time: the weight the
            # canary normalization applies the gather (vs matmul) chip
            # ratio with for this cell (VERDICT r4 weak #1: clustered128
            # is dot-heavy, normalizing it by the gather ratio alone
            # cannot account for matmul-rate drift)
            t_m = mxu_ms(packed, args.k, cdt)
            gweight[name] = round(dfl_ms / max(dfl_ms + t_m, 1e-12), 3)
        if roof_ms > ms:
            # measured beats the modeled floor: the floor is wrong for
            # this access pattern — publish "unknown", never a
            # fraction > 1 (VERDICT r4 next #4)
            roofs[name] = None
            warnings.append(
                f"{name}: modeled floor {roof_ms:.4f} ms exceeds "
                f"measured {ms:.4f} ms — floor unbound for this "
                "pattern; roofline_fraction reported as null")
        else:
            roofs[name] = round(roof_ms / ms, 3)

        # CSR-entry-order delivery (includes the packed->CSR conversion,
        # matching the reference's output convention).  A failure here
        # (e.g. the axon remote-compile 413 body-size limit on very
        # large flat layouts) must not kill the whole headline run —
        # report 0 with a warning and keep the packed-order number.
        try:
            ms_csr = runner.measure_kernel_ms(
                a_pad, bt_pad, iterations=max(args.iterations // 2, 10),
                repeats=3, order="csr")
            results_csr_order[name] = gflops(csr.nnz, args.k, ms_csr)
        except Exception as e:  # noqa: BLE001 — record, don't die
            warnings.append(f"{name}: csr-order timing failed: "
                            f"{type(e).__name__}: {str(e)[:200]}")
            results_csr_order[name] = 0.0

        # Same-chip csr gather-dot baseline (the cuSPARSE-equivalent):
        # measures algorithmic speedup independent of hardware.
        a_d = jnp.asarray(a)
        bt_d = jnp.asarray(b.T.copy())
        rows_d = jnp.asarray(csr.row_indices(), dtype=jnp.int32)
        cols_d = jnp.asarray(csr.col_idx, dtype=jnp.int32)

        def _csr_body(c, a_d, bt_d, rows_d, cols_d):
            r2 = jnp.where(c > jnp.float32(-1e30), rows_d, 0)
            return csr_sddmm_jax(a_d, bt_d, r2, cols_d)

        csr_ms = measure_loop_ms(_csr_body, (a_d, bt_d, rows_d, cols_d),
                                 iterations=15)
        csr_ratio[name] = round(csr_ms / ms, 2)

        if packed is None:
            cfg_str = ("dense"
                       + (" [committed]" if cfg is not None
                          else " [retuned]"))
            pack_str = ""
        else:
            cfg_str = (
                f"a={tuned.alpha} d={tuned.delta} "
                f"G={tuned.group_size} C={tuned.k_chunks} "
                f"H={tuned.hub_cols} "
                f"pallas={getattr(tuned, 'use_pallas', False)} "
                f"aL={getattr(tuned, 'a_layout', 'rows')} "
                f"merge={tuned.merge_superpanels}"
                f"{' [committed]' if cfg is not None else ' [retuned]'}")
            pack_str = (f"nS={packed.num_super} nQ={packed.num_quads} "
                        f"nP={packed.num_pairs} nG={packed.num_groups} "
                        f"res={packed.nnz_res} ")
        log(f"{name}: nnz={csr.nnz} cfg=({cfg_str}) "
            f"{pack_str}sessions={sessions_ms[name]} "
            f"median={ms:.4f}ms gflops={g:.0f} "
            f"csr_order={results_csr_order[name]:.0f} "
            f"({time.perf_counter() - t0:.0f}s total)")

    if on_device:
        canary_end = measure_canary()
        log(format_canary(canary_end))

    def gm(vals):
        return float(np.exp(np.mean(np.log(np.maximum(vals, 1e-9)))))

    geomean = gm(list(results.values()))
    # backward-comparable 4-matrix geomean (rounds 1-2 suite, before
    # dlmc joined in round 3 — VERDICT r3 weak #1)
    base4 = [results[n] for n in
             ("clustered16", "clustered128", "powerlaw", "banded")
             if n in results]
    out = {
        "metric": f"hybrid_sddmm_geomean_gflops_k{args.k}",
        "value": round(geomean, 1),
        "unit": "GFLOPS",
        "vs_baseline": round(geomean / REFERENCE_MEAN_GFLOPS.get(
            args.k, 3452.0), 3),
        "per_matrix": {k: round(v, 1) for k, v in results.items()},
        "per_matrix_csr_order": {k: round(v, 1)
                                 for k, v in results_csr_order.items()},
        # zeros are failed csr-order timings (see warnings) — excluded
        "geomean_csr_order": round(float(np.exp(np.mean(np.log(
            [v for v in results_csr_order.values() if v > 0] or [1e-9])))),
            1),
        "sol_fraction": sols,
        "roofline_fraction": roofs,
        "speedup_vs_csr_same_chip": csr_ratio,
        "geomean_vs_csr": round(float(np.exp(np.mean(np.log(
            np.maximum(list(csr_ratio.values()), 1e-9))))), 2),
        "timing_sessions_ms": sessions_ms,
        "tuning_s": tuning_s,
        "floor_clamped": clamped,
        "gather_weight": gweight,
    }
    if len(base4) == 4:
        out["value_4matrix"] = round(gm(base4), 1)
    if canary_start is not None:
        out["canary"] = canary_start
        out["canary_end"] = canary_end
        # normalized headline: per-matrix GFLOPS scaled by the session's
        # canary ratios, each cell weighted by its own modeled
        # gather-vs-matmul boundedness (gather_weight above) — a slow
        # chip day inflates ms -> deflates GFLOPS by the same factor,
        # but WHICH engine drifted matters per regime (VERDICT r4
        # weak #1: gather-only normalization cannot account for a
        # matmul-rate swing on the dot-heavy cells)
        def _sess_ratio(key):
            rs = [x for x in (canary_start.get(key), canary_end.get(key))
                  if x]
            return float(np.exp(np.mean(np.log(rs)))) if rs else None
        norm_g = _sess_ratio("gather_ratio")
        norm_m = _sess_ratio("matmul_ratio")
        if norm_g and norm_m:
            per_norm = {
                name: results[name] * (norm_g ** gweight[name])
                * (norm_m ** (1.0 - gweight[name]))
                for name in results}
            out["per_matrix_normalized"] = {k: round(v, 1)
                                            for k, v in per_norm.items()}
            out["value_normalized"] = round(gm(list(per_norm.values())), 1)
            norm4 = [per_norm[n] for n in
                     ("clustered16", "clustered128", "powerlaw", "banded")
                     if n in per_norm]
            if len(norm4) == 4:
                out["value_4matrix_normalized"] = round(gm(norm4), 1)
            out["canary_ratios_used"] = {"gather": round(norm_g, 3),
                                         "matmul": round(norm_m, 3)}
    if warnings:
        out["warnings"] = warnings
        for w in warnings:
            print(f"WARNING: {w}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
