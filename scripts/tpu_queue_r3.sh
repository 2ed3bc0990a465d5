#!/bin/bash
# Round-3 on-TPU validation ladder (VERDICT.md "Next round" item 1).
# Run in sequence when the tunnel is up (never run two TPU processes
# concurrently — concurrent sessions have corrupted results before).
#
#   bash scripts/tpu_queue_r3.sh [logdir]
#
# Each step is independently timeout-bounded and appends to the log, so
# a mid-queue tunnel drop loses only the step in flight.  Ordered so the
# headline artifacts bank first.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r3.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r3.log"
  return $rc
}

# 0. tunnel probe (fail fast if down)
run probe_r3 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting queue" | tee -a "$LOG/queue_r3.log"; exit 1; }

# 1. 2^19 + 2^20 e2e (BASELINE config #5) on current code — THE headline.
#    Writes incrementally, so a drop mid-2^20 still keeps the 2^19 record.
run atscale_r3 14400 python scripts/at_scale.py --sizes 19,20 --out atscale_r3.json

# 2. fresh-process cold-start measurement: same shapes, new process, disk
#    compile-cache warm (this run's prove_s/verify_s ARE the cold-start story)
run atscale_r3_cold 7200 python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_r3_cold.json

# 3. streaming-commit at-scale validation (U never materialized)
run streaming_r3 7200 python scripts/at_scale.py --budget-gb 0.5 --sizes 19 \
  --out atscale_streaming_r3.json

# 4. zk at-scale validation
run zk_r3 7200 python scripts/at_scale.py --zk --sizes 17 --out atscale_zk_r3.json

# 5. MXU four-step NTT benchmark (flip the default if it wins)
run mxu_r3 3600 python scripts/bench_mxu_ntt.py

# 6. fresh headline bench
run bench_r3 7200 python bench.py

echo "=== [$(stamp)] queue_r3 complete" | tee -a "$LOG/queue_r3.log"
