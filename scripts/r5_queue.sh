#!/bin/bash
# Round-5 TPU queue, phase 1: shoot out the round-5 pack levers
# (run-order gid sort, B-cost-scaled carve, residual gid sort, hub knee)
# against the committed configs, interleaved in-process so tunnel drift
# cannot fake a ranking; THEN the committed-config breakdowns (slow
# compiles — today's tunnel compiles at ~5-8 min/program, so the
# decisions come first and the attribution after).
#
# RESTART-SAFE: relaunch the whole thing after an outage/eviction
# (CLAUDE.md rule 13):
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r5_queue.sh &
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

run canary_r5_open.log python -m sddmm_tpu.utils.canary

# --- 1. pack-lever shootouts vs the committed config, per regime ---
# clustered16 committed: a=0.3,d=0.05,g=1,c=1,merge,pallas,apanels
run probe_r5levers_clustered16.log python scripts/probe_configs.py \
  --matrix clustered16 --k 128 --skip-check --configs "\
a=0.3,d=0.05,pallas=1,apanels=1;\
a=0.3,d=0.05,pallas=1,apanels=1,sort=gid;\
a=0.3,d=0.05,pallas=1,apanels=1,bscale=2;\
a=0.3,d=0.05,pallas=1,apanels=1,bscale=3;\
a=0.3,d=0.05,pallas=1,apanels=1,sort=gid,bscale=2"
git add results/ && git commit -q \
  -m "Round-5 lever shootout: clustered16 k128" || true
# clustered128 committed: a=0.5,d=0.0,g=1,c=1,merge,apanels
run probe_r5levers_clustered128.log python scripts/probe_configs.py \
  --matrix clustered128 --k 128 --skip-check --configs "\
a=0.5,d=0.0,apanels=1;\
a=0.5,d=0.0,apanels=1,sort=gid;\
a=0.5,d=0.0,apanels=1,bscale=2;\
a=0.5,d=0.0,apanels=1,sort=gid,bscale=2"
git add results/ && git commit -q \
  -m "Round-5 lever shootout: clustered128 k128" || true
# banded committed: a=0.3,d=0.05,g=1,c=1,merge,pallas,apanels
run probe_r5levers_banded.log python scripts/probe_configs.py \
  --matrix banded --k 128 --skip-check --configs "\
a=0.3,d=0.05,pallas=1,apanels=1;\
a=0.3,d=0.05,pallas=1,apanels=1,sort=gid;\
a=0.3,d=0.05,pallas=1,apanels=1,bscale=2;\
a=0.3,d=0.05,pallas=1,apanels=1,sort=gid,bscale=2"
git add results/ && git commit -q \
  -m "Round-5 lever shootout: banded k128" || true
# powerlaw committed: a=0.1,d=0.05,hub=2048,merge,apanels
run probe_r5levers_powerlaw.log python scripts/probe_configs.py \
  --matrix powerlaw --k 128 --skip-check --configs "\
a=0.1,d=0.05,hub=2048,apanels=1;\
a=0.1,d=0.05,hub=2048,apanels=1,sortres=gid;\
a=0.1,d=0.05,hub=4096,apanels=1;\
a=0.1,d=0.05,hub=4096,apanels=1,sortres=gid;\
a=0.1,d=0.05,hub=1024,apanels=1,sortres=gid"
git add results/ && git commit -q \
  -m "Round-5 lever shootout: powerlaw k128" || true

# --- 2. committed-config breakdowns (what actually binds, per regime) ---
run probe_breakdown_clustered16_r5.log python scripts/probe_breakdown.py \
  --matrix clustered16 --k 128 --committed
run probe_breakdown_clustered128_r5.log python scripts/probe_breakdown.py \
  --matrix clustered128 --k 128 --committed
run probe_breakdown_powerlaw_r5.log python scripts/probe_breakdown.py \
  --matrix powerlaw --k 128 --committed
run probe_breakdown_banded_r5.log python scripts/probe_breakdown.py \
  --matrix banded --k 128 --committed
git add results/ && git commit -q \
  -m "Round-5 committed-config breakdown probes (k128)" || true

run canary_r5_phase1_end.log python -m sddmm_tpu.utils.canary
echo "r5 queue phase 1 done"
