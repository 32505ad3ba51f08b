#!/bin/bash
# Round-5 closing probes: alpha/delta refinement UNDER the b_cost_scale
# carve (the committed alpha/delta were tuned against the old cost
# model; the taller carve may prefer different thresholds).
cd "$(dirname "$0")/.." || exit 1
R=results
run() {
  log=$1; shift
  if grep -q '^rc=0' "$R/$log" 2>/dev/null; then return 0; fi
  echo "=== $log ==="
  timeout --foreground 3600 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -4 "$R/$log"
}
fold() {
  log=$1; matrix=$2; k=$3
  grep -q '^rc=0' "$R/$log" 2>/dev/null \
    && python scripts/update_tuned_configs.py "$R/$log" \
         --matrix "$matrix" --k "$k"
}
run probe_r5ad_clustered16_k128.log python scripts/probe_configs.py \
  --matrix clustered16 --k 128 --skip-check --configs "\
a=0.3,d=0.05,pallas=1,apanels=1,bscale=2;\
a=0.3,d=0.1,pallas=1,apanels=1,bscale=2;\
a=0.3,d=0.2,pallas=1,apanels=1,bscale=2;\
a=0.2,d=0.05,pallas=1,apanels=1,bscale=2;\
a=0.4,d=0.05,pallas=1,apanels=1,bscale=2"
fold probe_r5ad_clustered16_k128.log clustered16 128
run probe_r5ad_clustered128_k128.log python scripts/probe_configs.py \
  --matrix clustered128 --k 128 --skip-check --configs "\
a=0.5,d=0.0,apanels=1,sort=gid,bscale=2;\
a=0.5,d=0.05,apanels=1,sort=gid,bscale=2;\
a=0.4,d=0.0,apanels=1,sort=gid,bscale=2;\
a=0.6,d=0.0,apanels=1,sort=gid,bscale=2"
fold probe_r5ad_clustered128_k128.log clustered128 128
git add results/ && git commit -q -m "Round-5 closing alpha/delta refinement under the bscale carve (k128)" || true
run bench_r5d_k128.log python bench.py --verbose --k 128
git add results/ && git commit -q -m "Round-5 run-D bench (k128, final configs)" || true
echo done
