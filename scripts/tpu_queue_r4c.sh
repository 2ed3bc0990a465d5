#!/bin/bash
# Round-4 session-3 queue, phase 1: the quick kernel A/Bs FIRST so the
# default-flip decision (fold REDC, MIN_N2=16 at n=512) lands before the
# headline bench and the big at-scale records are taken — the recorded
# artifacts should reflect the winning defaults, not precede them.
# Phase 2 (scripts/tpu_queue_r4d.sh) runs after the flips are committed.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4c.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4c.log"
  return $rc
}

run probe_r4c 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue_r4c.log"
  exit 1; }

# 1. REDC fold + relaxed-envelope A/B (ROADMAP #1 / VERDICT item 5)
run mxu_redc_ab 7200 python scripts/bench_mxu_redc.py --small \
  --out mxu_redc_ab.json

# 2. MXU challenge-combination kernel vs the VPU Montgomery-product lc
run mxu_lc_bench 7200 python scripts/bench_mxu_lc.py \
  --out mxu_lc_bench.json

echo "=== [$(stamp)] queue_r4c complete" | tee -a "$LOG/queue_r4c.log"
