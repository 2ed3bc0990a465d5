#!/bin/bash
# Round-3 second TPU queue: re-validate on the FINAL round-3 code
# (fused single-gather opens, four-step NTT, warmup path) after
# tpu_queue_r3.sh drains.  Most executables are already in the
# persistent compile cache, so these steps run near-warm.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r3b.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r3b.log"
  return $rc
}

run probe_r3b 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r3b.log"; exit 1; }

# 1. four-step NTT kernel validation + rate (n = 32768 / 65536)
run fourstep 7200 python scripts/validate_fourstep_ntt.py

# 2. faithful-attribution 2^19 (phase-sync on): the warm phase tables
#    finally bill device time to the issuing phase (VERDICT r2 weak #6)
run atscale_sync 7200 python scripts/at_scale.py --sizes 19 --phase-sync \
  --no-canary --out atscale_r3_sync.json

# 3. final-code 2^19 + 2^20 (fused opens): the round-3 headline numbers
run atscale_final 14400 python scripts/at_scale.py --sizes 19,20 \
  --out atscale_r3_final.json

# 4. fresh-process cold start on final code (cache warm from step 3)
run cold_final 7200 python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_r3_cold.json

# 5. fresh headline bench on final code
run bench_final 7200 python bench.py

echo "=== [$(stamp)] queue_r3b complete" | tee -a "$LOG/queue_r3b.log"
