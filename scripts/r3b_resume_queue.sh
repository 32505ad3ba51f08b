#!/bin/bash
# Round-3 RESUMABLE TPU queue — same probe set as r3_tpu_queue.sh but
# (a) skips any probe whose log already finished (rc=0), so restarting
#     after a tunnel outage or round snapshot never repays measured work;
# (b) reordered highest-value-first: fold the already-measured K=128
#     pallas/apanels wins immediately, re-run the two K=128 probes that
#     were lost to contention/outage, take a headline bench on the
#     folded configs, THEN chase K=256 / dlmc / K=64 / K=32, and finish
#     with the A/B reproducibility benches + diagnostics.
# Launch (CLAUDE.md rule 13):
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r3b_resume_queue.sh &
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

fold() {  # fold+validate all probe logs present so far, commit.
  log="autofold_$1_r3.log"
  echo "=== $log: r3_autofold --validate ==="
  timeout --foreground 5400 python scripts/r3_autofold.py --validate >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -12 "$R/$log"
  git add results/ && git commit -q \
    -m "Round-3 probe results + autofolded configs ($1)" || true
}

# --- 0. fold the K=128 winners already on disk (clustered16, banded) ---
fold k128_existing

# --- 1. the two K=128 probes lost to contention / outage ---
run probe_apanels_clustered128_r3.log python scripts/probe_configs.py \
  --matrix clustered128 --k 128 --skip-check --configs \
  "a=0.5,d=0.0;a=0.5,d=0.0,apanels=1;a=0.5,d=0.0,apanels=1,windowdp=0"

run probe_apanels_powerlaw_r3.log python scripts/probe_configs.py \
  --matrix powerlaw --k 128 --skip-check --configs \
  "a=0.1,d=0.05,hub=2048;a=0.1,d=0.05,hub=2048,apanels=1"

fold k128

# --- 1b. headline bench on the folded K=128 configs (early, so the
#         round has a committed post-fold number whatever happens) ---
run bench_r3_runA.log python bench.py --verbose
git add results/ && git commit -q -m "Round-3 headline bench run A (folded K=128 configs)" || true

# --- 2. K=256: shootout incl. C, apanels, pallas (fix the inversion) ---
run probe_k256_clustered16_r3.log python scripts/probe_configs.py \
  --matrix clustered16 --k 256 --skip-check --configs \
  "a=0.3,d=0.05,c=2;a=0.3,d=0.05;a=0.3,d=0.05,apanels=1;a=0.3,d=0.05,c=2,apanels=1;a=0.3,d=0.05,pallas=1,apanels=1"

run probe_k256_clustered128_r3.log python scripts/probe_configs.py \
  --matrix clustered128 --k 256 --skip-check --configs \
  "a=0.5,d=0.05;a=0.5,d=0.05,apanels=1;a=0.5,d=0.05,c=2,apanels=1;a=0.5,d=0.05,pallas=1,apanels=1"

run probe_k256_banded_r3.log python scripts/probe_configs.py \
  --matrix banded --k 256 --skip-check --configs \
  "a=0.3,d=0.05;a=0.3,d=0.05,apanels=1;a=0.3,d=0.05,pallas=1,apanels=1;a=0.3,d=0.05,c=2,apanels=1"

run probe_k256_powerlaw_r3.log python scripts/probe_configs.py \
  --matrix powerlaw --k 256 --skip-check --configs \
  "a=0.3,d=0.05;a=0.1,d=0.05,hub=2048;a=0.1,d=0.05,hub=2048,apanels=1"

fold k256

# --- 2b. true-DLMC density regime ---
run probe_dlmc_k128_r3.log python scripts/probe_configs.py \
  --matrix dlmc --k 128 --skip-check --configs \
  "a=0.3,d=0.05;a=0.3,d=0.0;a=0.3,d=0.05,apanels=1;a=0.3,d=0.05,pallas=1;a=0.3,d=0.05,pallas=1,apanels=1"

run probe_dlmc_k256_r3.log python scripts/probe_configs.py \
  --matrix dlmc --k 256 --skip-check --configs \
  "a=0.3,d=0.05;a=0.3,d=0.05,c=2;a=0.3,d=0.05,apanels=1"

run probe_dense_dlmc_r3.log python scripts/probe_dense_dlmc.py
run probe_dense_dlmc_k32_r3.log python scripts/probe_dense_dlmc.py --k 32
run probe_dense_dlmc_k64_r3.log python scripts/probe_dense_dlmc.py --k 64
run probe_dense_dlmc_k256_r3.log python scripts/probe_dense_dlmc.py --k 256

fold dlmc

# --- 3. K=64 ---
run probe_k64_clustered16_r3.log python scripts/probe_configs.py \
  --matrix clustered16 --k 64 --skip-check --configs \
  "a=0.3,d=0.0,g=2,merge=0;a=0.3,d=0.0,g=2,merge=0,apanels=1;a=0.3,d=0.05,pallas=1;a=0.3,d=0.05,pallas=1,apanels=1"

run probe_k64_banded_r3.log python scripts/probe_configs.py \
  --matrix banded --k 64 --skip-check --configs \
  "a=0.3,d=0.05,g=2;a=0.3,d=0.05,g=2,apanels=1;a=0.3,d=0.0,pallas=1,apanels=1"

run probe_k64_clustered128_r3.log python scripts/probe_configs.py \
  --matrix clustered128 --k 64 --skip-check --configs \
  "a=0.3,d=0.05;a=0.3,d=0.05,apanels=1"

run probe_k64_powerlaw_r3.log python scripts/probe_configs.py \
  --matrix powerlaw --k 64 --skip-check --configs \
  "a=0.5,d=0.05;a=0.5,d=0.05,hub=2048;a=0.5,d=0.05,hub=2048,apanels=1"

# --- 4. K=32 a_layout check ---
run probe_k32_apanels_r3.log python scripts/probe_configs.py \
  --matrix clustered16 --k 32 --skip-check --configs \
  "a=0.3,d=0.0,g=4,merge=0;a=0.3,d=0.0,g=4,merge=0,apanels=1;a=0.3,d=0.05,pallas=1"

fold k64_k32

# --- 5. reproducibility: two consecutive full K=128 benches on the
#         final folded configs (VERDICT r2 #1: within 10%) ---
run bench_r3_runB.log python bench.py --verbose
run bench_r3_runC.log python bench.py --verbose
git add results/ && git commit -q \
  -m "Round-3 K=128 reproducibility benches B/C on folded configs" || true

# --- 6. diagnostics (no fold) ---
run probe_device_cluster_r3.log python scripts/probe_cluster.py
run probe_device_cluster_mid_r3.log python scripts/probe_cluster.py \
  --row-groups 4096 --col-groups 4096 --block-prob 0.008

run probe_gid_order_clustered16_r3.log python scripts/probe_gid_order.py \
  --matrix clustered16 --k 128 --skip-check
run probe_gid_order_powerlaw_r3.log python scripts/probe_gid_order.py \
  --matrix powerlaw --k 128 --alpha 0.1 --skip-check

run probe_breakdown_clustered16_r3.log python scripts/probe_breakdown.py \
  --matrix clustered16 --k 128 --alpha 0.3 --delta 0.05

run probe_residual_rowmajor_r3.log python scripts/probe_residual_rowmajor.py
run probe_residual_rowmajor_d60_r3.log python scripts/probe_residual_rowmajor.py --deg 60

git add results/ && git commit -q -m "Round-3 diagnostic probe logs" || true

# --- 7. final benches at the other Ks + detached breadth suite ---
bash scripts/r3_post_queue.sh

echo "queue done"
