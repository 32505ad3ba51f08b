#!/bin/bash
# Round-5 breadth-suite rerun with INCREMENTAL per-K commits (VERDICT r4
# next #3: the all-Ks-then-commit r3 version was preempted two rounds
# running and left nothing behind).  K order puts the headline K first
# so a partial run still commits the most audited cells; each per-K pass
# is time-boxed and commits whatever logs exist even if truncated
# (run_baselines --resume completes them on relaunch).
#
# Run detached under the preemptible lock:
#   setsid bash scripts/hold_lock_run.sh suite bash scripts/r5_suite_rerun.sh &
cd "$(dirname "$0")/.." || exit 1
set -x
[ -d /tmp/synth_suite ] || python scripts/make_synth_suite.py /tmp/synth_suite
mkdir -p results/synth_suite_logs_r5
for k in 128 256 64 32; do
  timeout --foreground 14400 \
    python scripts/run_baselines.py /tmp/synth_suite results/synth_suite_logs_r5 \
    --ks "$k" --tools csr bsmr --measure --merged-only --resume \
    >> results/r5_suite_run.log 2>&1
  python scripts/analyze_results.py results/synth_suite_logs_r5 \
    --k "$k" --out "results/synth_suite_logs_r5/results_${k}.csv" \
    >> results/r5_suite_run.log 2>&1 || true
  git add results/synth_suite_logs_r5 results/r5_suite_run.log \
    && git commit -q -m "Round-5 breadth-suite shootout: K=${k} logs/CSV (round-5 code; partial passes resume)" \
    || true
done
echo "r5 suite rerun done"
