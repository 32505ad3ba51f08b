#!/bin/bash
# Round-5 TPU queue, phase 5 (closing window): re-bench K=32 with the
# clustered16 apanels fold, measure the 6 batch-2 matched clones, and
# close with the session canary.
#
# RESTART-SAFE:
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r5_queue5.sh &
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

run bench_r5c_k32.log python bench.py --verbose --k 32
git add results/ && git commit -q -m "Round-5 K=32 bench with the clustered16 apanels fold" || true

python scripts/make_matched_clones.py /tmp/matched_clones
run matched_clones_run2.log python scripts/run_baselines.py \
  /tmp/matched_clones results/matched_clone_logs \
  --ks 128 --tools csr bsmr --measure --merged-only --resume
python scripts/matched_clone_report.py /tmp/matched_clones \
  results/matched_clone_logs --k 128 -o results/matched_clones_r5.csv
cp /tmp/matched_clones/manifest.json results/matched_clones_manifest.json
git add results/ && git commit -q \
  -m "Matched clones batch 2: 6 more named matrices (18 total, K=128)" || true

run canary_r5_final.log python -m sddmm_tpu.utils.canary
echo "r5 queue phase 5 done"
