#!/bin/bash
# Probe the TPU tunnel every 5 minutes; when it answers, launch the
# given queue script once and exit.  Usage:
#   nohup bash scripts/tunnel_watch.sh scripts/tpu_queue_r4_resume.sh &
set -u
cd "$(dirname "$0")/.."
QUEUE=${1:?usage: tunnel_watch.sh <queue script>}
LOG=tpu_queue_logs
mkdir -p "$LOG"
while true; do
  if timeout 60 python -c "import jax; print(jax.devices())" \
      >>"$LOG/tunnel_watch.log" 2>&1; then
    echo "[$(date +%Y%m%dT%H%M%S)] tunnel up — launching $QUEUE" \
      | tee -a "$LOG/tunnel_watch.log"
    bash "$QUEUE" >>"$LOG/tunnel_watch.log" 2>&1
    exit 0
  fi
  echo "[$(date +%Y%m%dT%H%M%S)] tunnel down; retry in 300s" \
    >>"$LOG/tunnel_watch.log"
  sleep 300
done
