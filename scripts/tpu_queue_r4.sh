#!/bin/bash
# Round-4 TPU queue: re-validate at scale on the round-4 code
# (MXU-routed streaming commit with shared re-encode executable,
# device zk blind, overlapped opening downloads).
#
# Round-3 baselines these steps attack (VERDICT r3 items 2, 3, 4, 7):
#   - streaming 2^19 cold prove 1831.9 s (commit 1261 s, gather 411 s)
#   - zk 2^17 only, 639k RS elems/s, zk_blind 14.7 s host numpy
#   - 2^21 cold prove 8829 s (commit 6816 s = radix-2 compiles)
#   - warm 2^19 prove 10.0 s (target <= 5.5 s via overlap)
#   - 2^22 never run
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4.log"
  return $rc
}

run probe_r4 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r4.log"; exit 1; }

# 1. resident-path 2^19 + 2^20 with overlapped openings (headline e2e)
run atscale_r4 14400 python scripts/at_scale.py --sizes 19,20 \
  --out atscale_r4.json

# 2. streaming-commit 2^19 (budget forced down): VERDICT item 3 —
#    cold must land <= 2x the resident cold (~350 s target vs 1832 s)
run atscale_streaming_r4 10800 env LIGERO_RESIDENT_BUDGET_GB=0.5 \
  python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_streaming_r4.json

# 3. zk at 2^19 (device blind): VERDICT item 4 — zk >= 50% of the
#    non-zk elems/s at the same scale
run atscale_zk_r4 10800 python scripts/at_scale.py --sizes 19 --zk \
  --no-canary --out atscale_zk_r4.json

# 4. 2^21 (streaming auto): VERDICT item 2 — the round-3 record's
#    8829 s cold was radix-2 compile time the MXU routing removes
run atscale_21_r4 14400 python scripts/at_scale.py --sizes 21 \
  --no-canary --out atscale_21_r4.json

# 5. 2^22 — first n=32768 end-to-end on the chip
run atscale_22_r4 21600 python scripts/at_scale.py --sizes 22 \
  --no-canary --out atscale_22_r4.json

# 6. headline refresh
run bench_r4 7200 python bench.py

echo "=== [$(stamp)] queue_r4 complete" | tee -a "$LOG/queue_r4.log"
