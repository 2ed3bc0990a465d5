#!/bin/bash
# Round-4 follow-up TPU queue (run after tpu_queue_r4.sh drains):
# kernel A/Bs that decide default flips, plus the cache-hit streaming
# cold measurement (queue_r4's streaming step compiled the new split
# programs for the first time — this rerun shows the steady cold cost).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4b.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4b.log"
  return $rc
}

run probe_r4b 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r4b.log"; exit 1; }

# 1. REDC fold A/B at the production shape + relaxed MIN_N2 at n=512
run mxu_redc_ab 7200 python scripts/bench_mxu_redc.py --small \
  --out mxu_redc_ab.json

# 2. streaming 2^19 cold with the populated compile cache (the real
#    fresh-process cost users see after one warmup anywhere)
run atscale_streaming_r4b 7200 env LIGERO_RESIDENT_BUDGET_GB=0.5 \
  python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_streaming_r4b.json

echo "=== [$(stamp)] queue_r4b complete" | tee -a "$LOG/queue_r4b.log"
