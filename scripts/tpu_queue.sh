#!/bin/bash
# Queued on-TPU work, run in sequence when the tunnel is up (never run
# two TPU processes concurrently — the remote compile cache serializes
# anyway and concurrent sessions have corrupted results before).
#
#   bash scripts/tpu_queue.sh [logdir]
#
# Each step is independently timeout-bounded and appends to the log, so
# a mid-queue tunnel drop loses only the step in flight.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue.log"
  return $rc
}

# 0. tunnel probe (fail fast if down)
run probe 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting queue" | tee -a "$LOG/queue.log"; exit 1; }

# 1. warm 2^19 re-measure with the zero-copy witness fix (+ canary)
run atscale19 7200 python scripts/at_scale.py --sizes 19 --out atscale_r2f.json

# 2. streaming-commit at-scale validation (U never materialized)
run streaming19 7200 python scripts/at_scale.py --budget-gb 0.5 --sizes 19 \
  --out atscale_streaming.json

# 3. zk at-scale validation
run zk17 7200 python scripts/at_scale.py --zk --sizes 17 --out atscale_zk.json

# 4. MXU four-step NTT benchmark (flip the default if it wins)
run mxu 3600 python scripts/bench_mxu_ntt.py

# 5. fresh headline bench
run bench 7200 python bench.py

# 6. 2^20 (BASELINE config #5) revalidation with the zero-copy witness
#    path + REDC-only from_mont (longest step; last so earlier results
#    survive a tunnel drop)
run atscale20 10800 python scripts/at_scale.py --sizes 20 --no-canary \
  --out atscale_r2g.json

echo "=== [$(stamp)] queue complete" | tee -a "$LOG/queue.log"
