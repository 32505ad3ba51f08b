#!/bin/bash
# Round-3 post-queue sequence: runs automatically at the end of
# r3_tpu_queue.sh, AFTER scripts/r3_autofold.py folded the probe
# winners (incl. the dense-vs-hybrid dlmc decision) into
# results/tuned_configs.json and the two K=128 A/B headline runs.
# Produces the final benches at the remaining Ks on the updated
# committed configs, then kicks the breadth-suite rerun.  Nothing else
# may touch the TPU while this runs (CLAUDE.md rule 1).
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
R=results

run() {
  log=$1; shift
  echo "=== $log: $* ==="
  timeout --foreground 3000 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -4 "$R/$log"
}

run bench_r3_final_k32.log  python bench.py --verbose --k 32
run bench_r3_final_k64.log  python bench.py --verbose --k 64
run bench_r3_final_k256.log python bench.py --verbose --k 256
git add results/ && git commit -q \
  -m "Round-3 final headline benches at all four Ks" || true

# breadth suite (hours; crash-safe --resume).  setsid gives it its own
# process group: it takes the preemptible TPU lock (utils/tpulock.py)
# and the headline bench can evict exactly that group, nothing else.
setsid bash scripts/r3_suite_rerun.sh >/dev/null 2>&1 &
echo "post-queue done (suite rerun detached, pid $!)"
