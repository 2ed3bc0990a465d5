#!/bin/bash
# Round-4 session-4 queue, phase 2 (run AFTER tpu_queue_r4e.sh):
# headline refresh with the stream-major Blake2s prep, commit-piece
# decomposition, the malloc-tune A/B, and a phase-sync warm check at
# 2^19.  Keep the host otherwise idle (see r4e header).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4f.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4f.log"
  return $rc
}

run probe_r4f 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r4f.log"
  exit 1; }

# 0. 2^21 clean re-record (the r4e leg's tunnel connection died mid-RPC
#    and was killed; fresh process = fresh connection)
run atscale_21_r4e 14400 python scripts/at_scale.py --sizes 21 \
  --no-canary --out atscale_21_r4e.json

# 1. headline with the new prep (fresh XLA compile of the leaves program)
run bench_r4f 7200 python bench.py

# 2. commit-piece decomposition at the headline shape (prep win readout)
run core_pieces_r4f 3600 python scripts/bench_core_pieces.py \
  --out core_pieces_r4f.json

# 3. malloc-tune A/B: phase-sync warm timing at 2^19, tuned vs default
run atscale_sync_r4f 7200 python scripts/at_scale.py --sizes 19 \
  --no-canary --phase-sync --out atscale_sync_r4f.json
run atscale_sync_r4f_malloc 7200 env LIGERO_MALLOC_TUNE=1 \
  python scripts/at_scale.py --sizes 19 --no-canary --phase-sync \
  --out atscale_sync_r4f_malloc.json

echo "=== [$(stamp)] queue_r4f complete" | tee -a "$LOG/queue_r4f.log"
