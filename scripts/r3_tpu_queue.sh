#!/bin/bash
# Round-3 TPU measurement queue — run when the tunnel is back.
# Order: cheapest decisions first (a_layout + pallas per regime at
# K=128), then K=256 (the K-scaling inversion), then device clustering.
# Each step logs to results/ and tolerates failure (set +e per step).
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

# --- 2b. true-DLMC density regime (new bench suite member): arbitrate
#         delta / apanels / pallas / merge on the all-super pack ---
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

# --- 3. device clustering throughput at scale ---
run probe_device_cluster_r3.log python scripts/probe_cluster.py

# --- 3b. K=64: the committed configs are round-2 winners that never
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

# --- 4. small-K a_layout check (A descriptors are narrow/fast there;
#         expect a wash — measure to be sure); candidate 1 IS the
#         committed config (g=4 merge=0) so the fold is exact ---
run probe_k32_apanels_r3.log python scripts/probe_configs.py \
  --matrix clustered16 --k 32 --skip-check --configs \
  "a=0.3,d=0.0,g=4,merge=0;a=0.3,d=0.0,g=4,merge=0,apanels=1;a=0.3,d=0.05,pallas=1"

# --- 4a. B-gather address-locality hypothesis (first-use gid order) ---
run probe_gid_order_clustered16_r3.log python scripts/probe_gid_order.py \
  --matrix clustered16 --k 128 --skip-check
run probe_gid_order_powerlaw_r3.log python scripts/probe_gid_order.py \
  --matrix powerlaw --k 128 --alpha 0.1 --skip-check

# --- 4b. stage-level attribution of the panels layout ---
run probe_breakdown_clustered16_r3.log python scripts/probe_breakdown.py \
  --matrix clustered16 --k 128 --alpha 0.3 --delta 0.05

# --- 5. reproducibility: two consecutive full bench runs on the
#         committed configs (VERDICT r2 #1: agree within 10%) ---
run bench_r3_runA.log python bench.py --verbose
run bench_r3_runB.log python bench.py --verbose

# --- 6. fold probe winners into tuned_configs.json (contract-validated,
#         reverts on FAIL), then the final headline benches + breadth
#         suite — fully autonomous, no human in the loop ---
run autofold_r3.log python scripts/r3_autofold.py --validate
git add results/ && git commit -q \
  -m "Round-3 TPU probe logs + autofolded tuned configs" || true
bash scripts/r3_post_queue.sh

echo "queue done"
