#!/bin/bash
# Round-5 closing measurements: run-C benches for K=64/256.
cd "$(dirname "$0")/.." || exit 1
R=results
run() {
  log=$1; shift
  if grep -q '^rc=0' "$R/$log" 2>/dev/null; then return 0; fi
  echo "=== $log ==="
  timeout --foreground 3600 "$@" >"$R/$log" 2>&1
  echo "rc=$?" >>"$R/$log"
  tail -3 "$R/$log"
}
run bench_r5c_k64.log python bench.py --verbose --k 64
run bench_r5c_k256.log python bench.py --verbose --k 256
git add results/ && git commit -q -m "Round-5 run-C benches (K=64/256)" || true
echo done
