#!/bin/bash
# Round-5 TPU queue, phase 2: K-sweep the winning pack levers
# (b_cost_scale=2, sort_runs=gid, sort_res=gid) against the committed
# configs at K in {256, 64, 32}, fold winners, re-measure the gather
# grid with the seq pattern + canary tag, run the round-5 headline
# benches at all four Ks, recompute the roofline offline, then chain
# into the breadth-suite rerun (which commits per K).
#
# RESTART-SAFE: relaunch after an outage/eviction:
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r5_queue2.sh &
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
  timeout --foreground 3600 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -6 "$R/$log"
}

fold() {
  log=$1; matrix=$2; k=$3
  grep -q '^rc=0' "$R/$log" 2>/dev/null \
    && python scripts/update_tuned_configs.py "$R/$log" \
         --matrix "$matrix" --k "$k"
}

# --- 0. powerlaw hot-row slab sweep (k128): residual entries pay two
#        descriptors each; the top-Zipf rows hold most of them, so a
#        small slab should buy most of the win at little MXU cost ---
run probe_r5rowslab_powerlaw.log python scripts/probe_configs.py \
  --matrix powerlaw --k 128 --skip-check --configs "\
a=0.1,d=0.05,hub=2048,apanels=1;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=1024;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=2048;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=4096;\
a=0.1,d=0.05,hub=1024,apanels=1,rowslabpre=2048"
fold probe_r5rowslab_powerlaw.log powerlaw 128
git add results/ && git commit -q -m "Round-5 powerlaw hot-row slab sweep (k128)" || true

# --- 1. K=256 lever probes ---
run probe_r5levers_clustered16_k256.log python scripts/probe_configs.py \
  --matrix clustered16 --k 256 --skip-check --configs "\
a=0.3,d=0.05,apanels=1;\
a=0.3,d=0.05,apanels=1,bscale=2;\
a=0.3,d=0.05,apanels=1,sort=gid,bscale=2"
fold probe_r5levers_clustered16_k256.log clustered16 256
run probe_r5levers_clustered128_k256.log python scripts/probe_configs.py \
  --matrix clustered128 --k 256 --skip-check --configs "\
a=0.5,d=0.05,apanels=1;\
a=0.5,d=0.05,apanels=1,bscale=2;\
a=0.5,d=0.05,apanels=1,sort=gid,bscale=2"
fold probe_r5levers_clustered128_k256.log clustered128 256
run probe_r5levers_powerlaw_k256.log python scripts/probe_configs.py \
  --matrix powerlaw --k 256 --skip-check --configs "\
a=0.1,d=0.05,hub=2048,apanels=1;\
a=0.1,d=0.05,hub=2048,apanels=1,sortres=gid;\
a=0.1,d=0.05,hub=4096,apanels=1,sortres=gid"
fold probe_r5levers_powerlaw_k256.log powerlaw 256
git add results/ && git commit -q -m "Round-5 K=256 lever shootouts + folds" || true

# --- 2. K=64 lever probes ---
run probe_r5levers_clustered16_k64.log python scripts/probe_configs.py \
  --matrix clustered16 --k 64 --skip-check --configs "\
a=0.3,d=0.0,g=2,merge=0,apanels=1;\
a=0.3,d=0.0,g=2,merge=0,apanels=1,bscale=2;\
a=0.3,d=0.0,g=2,apanels=1,bscale=2;\
a=0.3,d=0.0,g=2,apanels=1,sort=gid,bscale=2"
fold probe_r5levers_clustered16_k64.log clustered16 64
run probe_r5levers_clustered128_k64.log python scripts/probe_configs.py \
  --matrix clustered128 --k 64 --skip-check --configs "\
a=0.3,d=0.05,apanels=1;\
a=0.3,d=0.05,apanels=1,bscale=2;\
a=0.3,d=0.05,apanels=1,sort=gid,bscale=2"
fold probe_r5levers_clustered128_k64.log clustered128 64
run probe_r5levers_powerlaw_k64.log python scripts/probe_configs.py \
  --matrix powerlaw --k 64 --skip-check --configs "\
a=0.5,d=0.05,hub=2048;\
a=0.5,d=0.05,hub=2048,sortres=gid"
fold probe_r5levers_powerlaw_k64.log powerlaw 64
git add results/ && git commit -q -m "Round-5 K=64 lever shootouts + folds" || true

# --- 3. K=32 lever probes ---
run probe_r5levers_clustered16_k32.log python scripts/probe_configs.py \
  --matrix clustered16 --k 32 --skip-check --configs "\
a=0.3,d=0.0,g=4,merge=0;\
a=0.3,d=0.0,g=4,merge=0,bscale=2;\
a=0.3,d=0.0,g=4,bscale=2"
fold probe_r5levers_clustered16_k32.log clustered16 32
run probe_r5levers_clustered128_k32.log python scripts/probe_configs.py \
  --matrix clustered128 --k 32 --skip-check --configs "\
a=0.3,d=0.05;\
a=0.3,d=0.05,bscale=2;\
a=0.3,d=0.05,sort=gid,bscale=2"
fold probe_r5levers_clustered128_k32.log clustered128 32
run probe_r5levers_powerlaw_k32.log python scripts/probe_configs.py \
  --matrix powerlaw --k 32 --skip-check --configs "\
a=0.3,d=0.05;\
a=0.3,d=0.05,sortres=gid"
fold probe_r5levers_powerlaw_k32.log powerlaw 32
git add results/ && git commit -q -m "Round-5 K=32 lever shootouts + folds" || true

# --- 4. gather grid rerun: seq pattern, 256 B width, canary tag ---
run probe_gather_grid_r5.log python scripts/probe_gather_grid.py \
  -o results/gather_grid.json
git add results/ && git commit -q \
  -m "Round-5 gather grid: seq pattern, 256 B width, session canary tag" || true

# --- 5. round-5 headline benches, all four Ks (run A) ---
run bench_r5a_k128.log python bench.py --verbose --k 128
run bench_r5a_k256.log python bench.py --verbose --k 256
run bench_r5a_k64.log python bench.py --verbose --k 64
run bench_r5a_k32.log python bench.py --verbose --k 32
git add results/ && git commit -q -m "Round-5 headline benches, run A (all four Ks)" || true

# --- 6. offline roofline recompute on the run-A logs + new grid ---
run recompute_roofline_r5.log python scripts/recompute_roofline.py \
  -o results/roofline_r5.json
git add results/ && git commit -q -m "Round-5 roofline recompute (seq-pattern grid, canary-normalized)" || true

# --- 7. chain into the breadth-suite rerun (own session/pgid so the
#        driver bench evicts it cleanly; commits per K) ---
setsid bash scripts/hold_lock_run.sh suite bash scripts/r5_suite_rerun.sh \
  < /dev/null >> results/r5_suite_console.log 2>&1 &
echo "r5 queue phase 2 done (suite chained)"
