#!/bin/bash
# Round-5 TPU queue, phase 4 (post-suite window): re-validate the
# powerlaw committed config under the round-5 full-width slab geometry,
# attack the K=32 clustered16 floor gap, and close with a third
# driver-class bench pair for the reproducibility record.
#
# RESTART-SAFE:
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r5_queue4.sh &
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

# --- 1. powerlaw k128 under the full-width slab geometry (the probed
#        1024 knee used the pre-geometry cold-only slab; re-arbitrate
#        R and the hub width against it) ---
run probe_r5rowslab_powerlaw_c.log python scripts/probe_configs.py \
  --matrix powerlaw --k 128 --skip-check --configs "\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=1024;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=1536;\
a=0.1,d=0.05,hub=1024,apanels=1,rowslabpre=1024;\
a=0.1,d=0.05,hub=2048,apanels=1,rowslabpre=768"
fold probe_r5rowslab_powerlaw_c.log powerlaw 128
git add results/ && git commit -q \
  -m "Round-5 powerlaw k128 re-arbitration under full-width slab geometry" || true

# --- 2. clustered16 K=32: the widest roofline gap (fraction 0.32) ---
run probe_breakdown_clustered16_k32_r5.log python scripts/probe_breakdown.py \
  --matrix clustered16 --k 32 --committed
run probe_r5levers_clustered16_k32b.log python scripts/probe_configs.py \
  --matrix clustered16 --k 32 --skip-check --configs "\
a=0.3,d=0.0,g=4,merge=0;\
a=0.3,d=0.0,g=4,merge=0,apanels=1;\
a=0.3,d=0.0,g=4,merge=0,sort=gid;\
a=0.3,d=0.05,g=4,merge=0"
fold probe_r5levers_clustered16_k32b.log clustered16 32
git add results/ && git commit -q \
  -m "Round-5 clustered16 k32 breakdown + second lever round" || true

# --- 3. third driver-class bench pair (run C) ---
run bench_r5c_k128.log python bench.py --verbose --k 128
git add results/ && git commit -q -m "Round-5 headline bench, run C (k128)" || true

run canary_r5_close.log python -m sddmm_tpu.utils.canary
echo "r5 queue phase 4 done"
