#!/bin/bash
# Round-3 TPU measurement queue — fired once by scripts/tpu_watch.sh
# when the tunnel returns.  Fully autonomous: after each probe section
# the winners are folded into results/tuned_configs.json (validated
# against the golden contract, reverted on FAIL) and committed, so if
# the round ends mid-queue the headline bench still reflects every
# finished measurement.  Order: highest-value decisions first (K=128,
# then K=256's inversion, then the dlmc dense arbitration, then
# K=64/K=32), diagnostics after, final benches last.
# NOTE: nothing else may touch the TPU while this runs (CLAUDE.md rule 1).
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
R=results

run() {
  log=$1; shift
  echo "=== $log: $* ==="
  timeout 2400 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -8 "$R/$log"
}

fold() {  # fold+validate all probe logs present so far, commit.
  # Own (longer) timeout: a section's validations can sum past the
  # per-probe cap; autofold writes after every validated entry, so even
  # a timeout here keeps all already-validated folds.
  log="autofold_$1_r3.log"
  echo "=== $log: r3_autofold --validate ==="
  timeout 5400 python scripts/r3_autofold.py --validate >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -12 "$R/$log"
  git add results/ && git commit -q \
    -m "Round-3 probe results + autofolded configs ($1)" || true
}

# --- 1. a_layout x pallas at K=128 on the block regimes ---
run probe_apanels_clustered16_r3.log python scripts/probe_configs.py \
  --matrix clustered16 --k 128 --skip-check --configs \
  "a=0.3,d=0.05;a=0.3,d=0.05,apanels=1;a=0.3,d=0.05,pallas=1;a=0.3,d=0.05,pallas=1,apanels=1;a=0.3,d=0.05,pallas=1,apanels=1,windowdp=0"

run probe_apanels_banded_r3.log python scripts/probe_configs.py \
  --matrix banded --k 128 --skip-check --configs \
  "a=0.3,d=0.0,pallas=1;a=0.3,d=0.0,pallas=1,apanels=1;a=0.3,d=0.0,apanels=1;a=0.3,d=0.0,pallas=1,apanels=1,windowdp=0"

run probe_apanels_clustered128_r3.log python scripts/probe_configs.py \
  --matrix clustered128 --k 128 --skip-check --configs \
  "a=0.5,d=0.0;a=0.5,d=0.0,apanels=1;a=0.5,d=0.0,apanels=1,windowdp=0"

run probe_apanels_powerlaw_r3.log python scripts/probe_configs.py \
  --matrix powerlaw --k 128 --skip-check --configs \
  "a=0.1,d=0.05,hub=2048;a=0.1,d=0.05,hub=2048,apanels=1"

fold k128

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

# --- 2b. true-DLMC density regime: arbitrate delta / apanels / pallas
#         on the all-super pack, then dense-vs-hybrid at every K ---
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

# --- 3. K=64: the committed configs are round-2 winners that never
#         saw the pallas/apanels twins; close the loop like K=128 ---
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

# --- 4. small-K a_layout check; candidate 1 IS the committed config
#         (g=4 merge=0) so the fold is exact ---
run probe_k32_apanels_r3.log python scripts/probe_configs.py \
  --matrix clustered16 --k 32 --skip-check --configs \
  "a=0.3,d=0.0,g=4,merge=0;a=0.3,d=0.0,g=4,merge=0,apanels=1;a=0.3,d=0.05,pallas=1"

fold k64_k32

# --- 5. diagnostics (no fold): device clustering at scale, B-gather
#         address-locality hypothesis, panels stage attribution ---
run probe_device_cluster_r3.log python scripts/probe_cluster.py
# mid-scale (m=65536, ~341 nnz/row): host greedy measured 57 s here but
# the m<=100k auto-route keeps it on host — measure whether the device
# path should own this regime too (threshold lead, round 4)
run probe_device_cluster_mid_r3.log python scripts/probe_cluster.py \
  --row-groups 4096 --col-groups 4096 --block-prob 0.008

run probe_gid_order_clustered16_r3.log python scripts/probe_gid_order.py \
  --matrix clustered16 --k 128 --skip-check
run probe_gid_order_powerlaw_r3.log python scripts/probe_gid_order.py \
  --matrix powerlaw --k 128 --alpha 0.1 --skip-check

run probe_breakdown_clustered16_r3.log python scripts/probe_breakdown.py \
  --matrix clustered16 --k 128 --alpha 0.3 --delta 0.05

# residual formulation decision for the gather-bound regimes (uniform/
# hypersparse): does the engine coalesce row-sorted descriptors, and
# does row-bucketing (1 A descriptor/row) beat per-entry gathers?
run probe_residual_rowmajor_r3.log python scripts/probe_residual_rowmajor.py
run probe_residual_rowmajor_d60_r3.log python scripts/probe_residual_rowmajor.py --deg 60

git add results/ && git commit -q -m "Round-3 diagnostic probe logs" || true

# --- 6. reproducibility + final K=128 headline: two consecutive full
#         bench runs on the folded configs (VERDICT r2 #1: within 10%) ---
run bench_r3_runA.log python bench.py --verbose
run bench_r3_runB.log python bench.py --verbose
git add results/ && git commit -q \
  -m "Round-3 K=128 headline A/B benches on folded configs" || true

# --- 7. final benches at the other Ks + detached breadth suite ---
bash scripts/r3_post_queue.sh

echo "queue done"
