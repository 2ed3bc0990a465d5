#!/bin/bash
# Round-4 session-4 queue: clean re-records after the host-side wins
# (parallel ChaCha sampler, native PyLong converters, sampler buffer
# reuse).  The r4d streaming-cache-hit leg and parts of the 2^21/2^22
# records were contaminated by concurrent benchmarking on this 4-core
# host — NOTHING CPU-HEAVY may run beside this queue (the at-scale
# host phases are wall-clock-attributed).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4e.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4e.log"
  return $rc
}

run probe_r4e 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r4e.log"
  exit 1; }

# 1. flagship 2^19+2^20 resident record with the new host fast paths
#    (warm-prove target: <= 5.5 s at 2^19)
run atscale_r4e 10800 python scripts/at_scale.py --sizes 19,20 \
  --out atscale_r4e.json

# 2. streaming cache-hit cold at 2^19 (clean rerun of the r4d leg)
run atscale_streaming_r4b 7200 env LIGERO_RESIDENT_BUDGET_GB=0.5 \
  python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_streaming_r4b.json

# 3. 2^21 and 2^22 clean re-records (compile caches warm from r4d)
run atscale_21_r4e 14400 python scripts/at_scale.py --sizes 21 \
  --no-canary --out atscale_21_r4e.json
run atscale_22_r4e 21600 python scripts/at_scale.py --sizes 22 \
  --no-canary --out atscale_22_r4e.json

# 4. zk re-record at 2^19 (faster host expand shows in zk warm too)
run atscale_zk_r4e 7200 python scripts/at_scale.py --sizes 19 --zk \
  --no-canary --out atscale_zk_r4e.json

echo "=== [$(stamp)] queue_r4e complete" | tee -a "$LOG/queue_r4e.log"
