#!/bin/bash
# Round-4 second TPU queue: the round-4 kernel/CSR-order levers and the
# refreshed record.
#
#  1. gather rate grid (width x footprint x pattern) -> the measured
#     descriptor-floor surface (results/gather_grid.json,
#     autotune._floor_row_rate) — VERDICT r3 next #6
#  2. dense-vs-hybrid autofold rerun (restores the validated
#     {"dense": true} dlmc entries the k64_k32 fold pass displaced)
#  3. CSR-order shootout with the MXU window select — VERDICT r3 next #3
#  4. C=4 hot-window K-chunking probe on the fine-block regimes
#     (2 MB per-chunk B source = the grid's fast window) — next #5
#  5. final headline benches at all four Ks on the updated configs
#  6. detached 24-matrix breadth-suite rerun (hours; crash-safe
#     --resume) — VERDICT r3 next #8
#
# RESTART-SAFE: probes whose logs end rc=0 are skipped on relaunch.
# Launch (CLAUDE.md rule 13):
#   setsid bash scripts/hold_lock_run.sh queue bash scripts/r4b_queue.sh &
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
  timeout --foreground 2700 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -8 "$R/$log"
}

# --- 1. measured gather-rate surface for the descriptor floor ---
run probe_gather_grid_r4.log python -u scripts/probe_gather_grid.py \
  -o results/gather_grid.json
git add results/ && git commit -q \
  -m "Round-4 gather rate grid (width x footprint x pattern)" || true

# --- 2. restore the dense dlmc entries (validated fold) ---
run autofold_dense_r4.log python -u scripts/r3_autofold.py --validate
git add results/ && git commit -q \
  -m "Round-4 autofold rerun: dense dlmc entries restored at k128/k256" \
  || true

# --- 3. CSR-order shootout with the MXU select ---
for m in clustered16 banded clustered128 powerlaw; do
  run "probe_csr_order_mxu_${m}_r4.log" python -u \
    scripts/probe_csr_order.py --matrix "$m" --k 128
done
git add results/ && git commit -q \
  -m "Round-4 CSR-order shootout with the MXU window select (k128)" \
  || true

# --- 4. C=4 hot-window chunking on the fine-block regimes ---
run probe_c4_clustered16_r4.log python -u scripts/probe_configs.py \
  --matrix clustered16 --k 128 --configs \
  "a=0.3,d=0.05,g=1,c=1,merge=1,pallas=1,apanels=1;a=0.3,d=0.05,g=1,c=4,merge=1,apanels=1;a=0.3,d=0.05,g=1,c=4,merge=1,pallas=1,apanels=1"
run probe_c4_banded_r4.log python -u scripts/probe_configs.py \
  --matrix banded --k 128 --configs \
  "a=0.3,d=0.05,g=1,c=1,merge=1,pallas=1,apanels=1;a=0.3,d=0.05,g=1,c=4,merge=1,apanels=1;a=0.3,d=0.05,g=1,c=4,merge=1,pallas=1,apanels=1"
git add results/ && git commit -q \
  -m "Round-4 C=4 hot-window chunking probes (k128)" || true
# fold the probe winners (the candidate sets include the committed
# configs, so a no-better outcome folds to a no-op)
python -u scripts/update_tuned_configs.py --matrix clustered16 --k 128 \
  "$R/probe_c4_clustered16_r4.log" || true
python -u scripts/update_tuned_configs.py --matrix banded --k 128 \
  "$R/probe_c4_banded_r4.log" || true
git add results/ && git commit -q \
  -m "Round-4 fold: C=4 arbitration into tuned configs" || true

# --- 4b. storage-precision retrial at K=256 (round 4 fixed the bf16
#     hi/lo split XLA was silently collapsing — float16 storage is now
#     genuinely ~16-mantissa-bit via the 3-pass dots, and at K=256 it
#     halves the B descriptor from the slow 1 KB class into the 512 B
#     sweet spot) ---
run probe_dtype_k256_clustered128_r4.log python -u scripts/probe_dtype.py \
  --matrix clustered128 --k 256 --alpha 0.5 --delta 0.05 \
  --dtypes tf32,mixed,float16
run probe_dtype_k256_banded_r4.log python -u scripts/probe_dtype.py \
  --matrix banded --k 256 --alpha 0.3 --delta 0.05 \
  --dtypes tf32,mixed,float16
git add results/ && git commit -q \
  -m "Round-4 storage-precision retrial at K=256 (fixed bf16 split)" \
  || true

# --- 5. final headline benches at all four Ks ---
# k128/k256 first: the dense dlmc restore (autofold) and the k256
# floor recalibration (46a2288) both landed AFTER the bench_r3_final
# pass, so those two are the stale ones.
run bench_r4_k128.log python -u bench.py --verbose
git add results/ && git commit -q -m "Round-4 headline bench (k128)" || true
run bench_r4_k256.log python -u bench.py --verbose --k 256
git add results/ && git commit -q -m "Round-4 headline bench (k256)" || true
run bench_r4_k32.log  python -u bench.py --verbose --k 32
run bench_r4_k64.log  python -u bench.py --verbose --k 64
git add results/ && git commit -q \
  -m "Round-4 headline benches (k32/k64)" || true

# --- 6. detached breadth-suite rerun (hours; preemptible lock) ---
setsid bash scripts/r3_suite_rerun.sh >/dev/null 2>&1 &
echo "r4b queue done (suite rerun detached, pid $!)"
