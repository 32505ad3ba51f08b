#!/bin/bash
# Run a command while holding the preemptible TPU lock for its whole
# lifetime.  Launch via setsid so the recorded pgid is exactly this
# tree; bench.py then evicts the entire queue cleanly (rule 1) instead
# of racing it on the tunnel — the round-2 646-vs-810 failure mode.
#
# Usage: setsid bash scripts/hold_lock_run.sh <tag> <cmd...> &
cd "$(dirname "$0")/.." || exit 1
TAG=${1:?tag}; shift
python - "$TAG" "$@" <<'EOF'
import subprocess, sys
from sddmm_tpu.utils import tpulock
tag, cmd = sys.argv[1], sys.argv[2:]
tpulock.wait_free(max_wait_s=3600)
tpulock.acquire(tag, preemptible=True)
raise SystemExit(subprocess.call(cmd))
EOF
