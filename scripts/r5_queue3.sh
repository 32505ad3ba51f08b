#!/bin/bash
# Round-5 TPU queue, phase 3: propagate the powerlaw hot-row-slab win
# (k128: rowslabpre=1024, +26%) to the other Ks, refine the k128 knee,
# re-bench the Ks whose configs changed, and refresh the roofline.
#
# RESTART-SAFE:
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r5_queue3.sh &
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

# --- 1. k128 knee refinement (R=512/768 vs the folded 1024) ---
run probe_r5rowslab_powerlaw_b.log python scripts/probe_configs.py \
  --matrix powerlaw --k 128 --skip-check --configs "\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=1024;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=512;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=768"
fold probe_r5rowslab_powerlaw_b.log powerlaw 128

# --- 1b. retry: clustered16 k64 levers (first attempt hung in a stuck
#         tunnel RPC and was killed; rc=143 in the phase-2 log) ---
rm -f "$R/probe_r5levers_clustered16_k64.log"
run probe_r5levers_clustered16_k64.log python scripts/probe_configs.py \
  --matrix clustered16 --k 64 --skip-check --configs "\
a=0.3,d=0.0,g=2,merge=0,apanels=1;\
a=0.3,d=0.0,g=2,merge=0,apanels=1,bscale=2;\
a=0.3,d=0.0,g=2,apanels=1,bscale=2;\
a=0.3,d=0.0,g=2,apanels=1,sort=gid,bscale=2"
fold probe_r5levers_clustered16_k64.log clustered16 64

# --- 2. other Ks ---
run probe_r5rowslab_powerlaw_k256.log python scripts/probe_configs.py \
  --matrix powerlaw --k 256 --skip-check --configs "\
a=0.1,d=0.05,hub=2048,apanels=1;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=512;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=1024"
fold probe_r5rowslab_powerlaw_k256.log powerlaw 256
run probe_r5rowslab_powerlaw_k64.log python scripts/probe_configs.py \
  --matrix powerlaw --k 64 --skip-check --configs "\
a=0.5,d=0.05,hub=2048;\
a=0.5,d=0.05,hub=2048,rowslabpre=1024;\
a=0.5,d=0.05,hub=2048,rowslabpre=2048"
fold probe_r5rowslab_powerlaw_k64.log powerlaw 64
run probe_r5rowslab_powerlaw_k32.log python scripts/probe_configs.py \
  --matrix powerlaw --k 32 --skip-check --configs "\
a=0.3,d=0.05;\
a=0.3,d=0.05,hub=2048,rowslabpre=1024;\
a=0.3,d=0.05,rowslabpre=2048"
fold probe_r5rowslab_powerlaw_k32.log powerlaw 32
git add results/ && git commit -q \
  -m "Round-5 powerlaw hot-row slab K-sweep + folds" || true

# --- 3. re-bench affected Ks with the final configs (run B) ---
run bench_r5b_k128.log python bench.py --verbose --k 128
run bench_r5b_k256.log python bench.py --verbose --k 256
run bench_r5b_k64.log python bench.py --verbose --k 64
run bench_r5b_k32.log python bench.py --verbose --k 32
git add results/ && git commit -q -m "Round-5 headline benches, run B (final configs)" || true

# --- 4. roofline refresh on the final logs ---
cp results/bench_r5b_k128.log results/bench_r5a_k128.log 2>/dev/null || true
cp results/bench_r5b_k256.log results/bench_r5a_k256.log 2>/dev/null || true
cp results/bench_r5b_k64.log results/bench_r5a_k64.log 2>/dev/null || true
cp results/bench_r5b_k32.log results/bench_r5a_k32.log 2>/dev/null || true
rm -f results/recompute_roofline_r5.log
run recompute_roofline_r5.log python scripts/recompute_roofline.py \
  -o results/roofline_r5.json
git add results/ && git commit -q -m "Round-5 roofline recompute (final configs)" || true

# --- 5. breadth suite K=128 pass INLINE (the three-round-slipped
#        VERDICT item; headline K first, committed even if truncated) ---
[ -d /tmp/synth_suite ] || python scripts/make_synth_suite.py /tmp/synth_suite
mkdir -p results/synth_suite_logs_r5
timeout --foreground 12600 \
  python scripts/run_baselines.py /tmp/synth_suite results/synth_suite_logs_r5 \
  --ks 128 --tools csr bsmr --measure --merged-only --resume \
  >> results/r5_suite_run.log 2>&1
python scripts/analyze_results.py results/synth_suite_logs_r5 \
  --k 128 --out results/synth_suite_logs_r5/results_128.csv \
  >> results/r5_suite_run.log 2>&1 || true
git add results/synth_suite_logs_r5 results/r5_suite_run.log \
  && git commit -q -m "Round-5 breadth-suite shootout: K=128 logs/CSV (round-5 code)" || true

# --- 6. matched SuiteSparse clones: per-matrix named-reference bridge
#        (VERDICT r4 missing #5); 12 clones, K=128, measured shootout ---
[ -d /tmp/matched_clones ] || python scripts/make_matched_clones.py /tmp/matched_clones
run matched_clones_run.log python scripts/run_baselines.py \
  /tmp/matched_clones results/matched_clone_logs \
  --ks 128 --tools csr bsmr --measure --merged-only --resume
python scripts/matched_clone_report.py /tmp/matched_clones \
  results/matched_clone_logs --k 128 -o results/matched_clones_r5.csv
cp /tmp/matched_clones/manifest.json results/matched_clones_manifest.json
git add results/ && git commit -q \
  -m "Matched SuiteSparse clones: per-matrix reference-vs-framework table (12 named matrices, K=128)" || true

# --- 7. relaunch the breadth suite for the remaining Ks (restart-safe;
#        K=128 cells are already logged so its pass is a fast no-op) ---
setsid bash scripts/hold_lock_run.sh suite bash scripts/r5_suite_rerun.sh \
  < /dev/null >> results/r5_suite_console.log 2>&1 &
echo "r5 queue phase 3 done (suite relaunched)"
