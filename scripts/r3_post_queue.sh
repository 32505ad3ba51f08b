#!/bin/bash
# Round-3 post-queue sequence: run AFTER r3_tpu_queue.sh finished and
# the probe winners have been folded into results/tuned_configs.json
# (scripts/update_tuned_configs.py + manual dense decisions from
# probe_dense_dlmc_*_r3.log).  Produces the final headline benches at
# all four Ks on the updated committed configs, then kicks the detached
# breadth-suite rerun.  Nothing else may touch the TPU while this runs
# (CLAUDE.md rule 1).
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
R=results

run() {
  log=$1; shift
  echo "=== $log: $* ==="
  timeout 3000 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -4 "$R/$log"
}

run bench_r3_final_k128.log python bench.py --verbose
run bench_r3_final_k32.log  python bench.py --verbose --k 32
run bench_r3_final_k64.log  python bench.py --verbose --k 64
run bench_r3_final_k256.log python bench.py --verbose --k 256

# breadth suite (hours; crash-safe --resume)
bash scripts/r3_suite_rerun.sh
echo "post-queue done"
