#!/bin/bash
# Round-4 session-3 queue, phase 2 (after the r4c A/Bs and any default
# flips are committed): headline bench refresh, the 2^21 full record
# (round-3 VERDICT item 2 — prove was proven at 302.9 s but the verify
# leg was cut by a tunnel outage), the first-ever 2^22 run, and the
# streaming cache-hit cold leg.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4d.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4d.log"
  return $rc
}

run probe_r4d 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r4d.log"
  exit 1; }

# 1. headline refresh with the (possibly flipped) kernel defaults
run bench_r4 7200 python bench.py

# 2. 2^21 end-to-end record (prove+verify, cold+warm)
run atscale_21_r4 14400 python scripts/at_scale.py --sizes 21 \
  --no-canary --out atscale_21_r4.json

# 3. first 2^22 (n=32768: the radix-2 split at depth 2 over MXU leaves)
run atscale_22_r4 21600 python scripts/at_scale.py --sizes 22 \
  --no-canary --out atscale_22_r4.json

# 4. streaming cache-hit cold at 2^19 (compiles now in the persistent
#    cache -> the "real" cold cost a user pays on a warmed host)
run atscale_streaming_r4b 7200 env LIGERO_RESIDENT_BUDGET_GB=0.5 \
  python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_streaming_r4b.json

echo "=== [$(stamp)] queue_r4d complete" | tee -a "$LOG/queue_r4d.log"
