#!/bin/bash
# Round-4 TPU queue.  Front-loads the NEW round-4 measurements (the
# window-plan CSR-order shootout, VERDICT r3 next #3, and the mid-scale
# clustering routing probe, next #7), then resumes the outage-interrupted
# round-3 queue (scripts/r3b_resume_queue.sh — restart-safe: probes whose
# logs end rc=0 are skipped), which carries the K=256/dlmc/dense/K=64/K=32
# probe->fold->bench passes and ends with the detached breadth-suite rerun.
#
# RESTART-SAFE: relaunch the whole thing after an outage/eviction
# (CLAUDE.md rule 13):
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r4_queue.sh &
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
  timeout --foreground 2400 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -8 "$R/$log"
}

# --- 1. CSR-order delivery shootout (packed vs window/sort/gather) ---
# powerlaw was the round-3 disaster case (0.6 GFLOPS via sort);
# clustered16 + banded cover the fine-block regimes the 2x target is
# judged on; dlmc covers the dense-ish regime.
run probe_csr_order_clustered16_r4.log python scripts/probe_csr_order.py \
  --matrix clustered16 --k 128
run probe_csr_order_powerlaw_r4.log python scripts/probe_csr_order.py \
  --matrix powerlaw --k 128
run probe_csr_order_banded_r4.log python scripts/probe_csr_order.py \
  --matrix banded --k 128
run probe_csr_order_clustered128_r4.log python scripts/probe_csr_order.py \
  --matrix clustered128 --k 128
git add results/ && git commit -q \
  -m "Round-4 CSR-order strategy shootout logs (k128)" || true

# --- 2. mid-scale clustering cost-routing probe (VERDICT r3 next #7) ---
run probe_device_cluster_mid_r4.log python scripts/probe_cluster.py \
  --row-groups 4096 --col-groups 4096 --block-prob 0.008
git add results/ && git commit -q \
  -m "Round-4 mid-scale device-clustering routing probe" || true

# --- 3. resume the round-3 queue (K=256 / dlmc / dense / K=64 / K=32
#        probes, folds, headline + reproducibility benches, diagnostics,
#        final per-K benches, detached breadth rerun) ---
bash scripts/r3b_resume_queue.sh

echo "r4 queue done"
