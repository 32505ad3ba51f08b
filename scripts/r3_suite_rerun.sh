#!/bin/bash
# Round-3 breadth suite rerun: 24 matrices x K in {32,64,128,256} with
# the on-device measured shootout (now incl. pallas/apanels twins).
# Run detached (setsid bash scripts/r3_suite_rerun.sh &) AFTER the
# r3_tpu_queue probes; takes hours. --resume makes it crash-safe.
cd "$(dirname "$0")/.." || exit 1
set -x
[ -d /tmp/synth_suite ] || python scripts/make_synth_suite.py /tmp/synth_suite
python scripts/run_baselines.py /tmp/synth_suite results/synth_suite_logs_r3 \
  --ks 32 64 128 256 --tools csr bsmr --measure --merged-only --resume \
  >> results/r3_suite_run.log 2>&1
for k in 32 64 128 256; do
  python scripts/analyze_results.py results/synth_suite_logs_r3 \
    --k "$k" --out "results/synth_suite_logs_r3/results_${k}.csv" \
    >> results/r3_suite_run.log 2>&1
done
git add results/synth_suite_logs_r3 results/r3_suite_run.log \
  && git commit -q -m "Round-3 breadth-suite shootout logs (24 matrices x 4 Ks)" \
  || true
echo "suite rerun done"
