#!/bin/bash
# Poll the axon TPU tunnel every ~2 min; when it answers, run the
# round-3 measurement queue (r3_tpu_queue.sh) exactly once, then exit.
# Detach with: setsid bash scripts/tpu_watch.sh >/tmp/tpu_watch.log 2>&1 &
# (CLAUDE.md rule 10: the tunnel has multi-hour outages; rule 1: nothing
# else may touch the TPU while the queue runs.)
cd "$(dirname "$0")/.." || exit 1

echo "[tpu_watch] start $(date -u +%FT%TZ)"
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[tpu_watch] TPU back at $(date -u +%FT%TZ); running queue"
    bash scripts/r3_tpu_queue.sh
    echo "[tpu_watch] queue finished at $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "[tpu_watch] still down $(date -u +%FT%TZ)"
  sleep 110
done
