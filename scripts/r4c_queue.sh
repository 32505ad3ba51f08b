#!/bin/bash
# Round-4 third TPU queue: roofline-floor pattern extension.
#
# bench_r4_k128 showed powerlaw roofline_fraction 2.9 (> 1 = impossible
# floor): the gather-grid's repeat-heaviest pattern (hot 1-in-8)
# under-measures the achievable rate for powerlaw's post-hub residual
# streams (repeat factors ~30-100x).  This queue:
#   1. re-measures the grid with the new hot64 pattern
#      (scripts/probe_gather_grid.py) -> results/gather_grid.json
#   2. recomputes all four Ks' roofline fractions offline from the
#      committed bench logs (CPU-only; no re-bench) ->
#      results/roofline_r4.json
#   3. relaunches the detached breadth-suite rerun it preempted
#
# RESTART-SAFE (rc=0 logs are skipped).  Launch AFTER preempting the
# suite holder:
#   python -c "from sddmm_tpu.utils import tpulock; \
#              tpulock.preempt_preemptible()"
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r4c_queue.sh &
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
R=results

run() {
  log=$1; shift
  if grep -q '^rc=0' "$R/$log" 2>/dev/null; then
    echo "=== $log: SKIP (already done) ==="
    return 0
  fi
  echo "=== $log: $* ==="
  timeout --foreground 2700 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -8 "$R/$log"
}

run probe_gather_grid_hot64_r4.log python -u scripts/probe_gather_grid.py \
  -o results/gather_grid.json
git add results/ scripts/ sddmm_tpu/ && git commit -q \
  -m "Gather-grid hot64 pattern: repeat-heavy rate cell for the power-law residual class" || true

run recompute_roofline_r4.log python -u scripts/recompute_roofline.py
git add results/ && git commit -q \
  -m "Recomputed roofline fractions (all Ks) on the hot64-extended grid" || true

# hand the chip back to the breadth suite
setsid bash scripts/r3_suite_rerun.sh >/dev/null 2>&1 &
echo "r4c queue done (suite rerun relaunched, pid $!)"
