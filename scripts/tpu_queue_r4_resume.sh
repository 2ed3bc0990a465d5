#!/bin/bash
# Resume of tpu_queue_r4.sh after the tunnel outage that killed the
# 2^21 verify (prove had finished: 302.9 s vs round-3's 8829 s) and hung
# the 2^22 device init.  Reruns 2^21 end-to-end (compiles are cached —
# near-warm), then 2^22, the headline bench, and the r4b kernel A/Bs.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-tpu_queue_logs}
mkdir -p "$LOG"
stamp() { date +%Y%m%dT%H%M%S; }

run() {
  local name=$1 to=$2; shift 2
  echo "=== [$(stamp)] $name: $*" | tee -a "$LOG/queue_r4_resume.log"
  timeout "$to" "$@" >>"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(stamp)] $name done rc=$rc" | tee -a "$LOG/queue_r4_resume.log"
  return $rc
}

run probe_resume 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down; aborting" | tee -a "$LOG/queue_r4_resume.log"
  exit 1; }

run atscale_21_r4 14400 python scripts/at_scale.py --sizes 21 \
  --no-canary --out atscale_21_r4.json

run atscale_22_r4 21600 python scripts/at_scale.py --sizes 22 \
  --no-canary --out atscale_22_r4.json

run bench_r4 7200 python bench.py

run mxu_redc_ab 7200 python scripts/bench_mxu_redc.py --small \
  --out mxu_redc_ab.json

run atscale_streaming_r4b 7200 env LIGERO_RESIDENT_BUDGET_GB=0.5 \
  python scripts/at_scale.py --sizes 19 --no-canary \
  --out atscale_streaming_r4b.json

# 6. MXU challenge-combination kernel: validate + A/B vs the VPU
#    Montgomery-product lc at the headline shape
run mxu_lc_bench 7200 python scripts/bench_mxu_lc.py \
  --out mxu_lc_bench.json

echo "=== [$(stamp)] queue_r4_resume complete" | tee -a "$LOG/queue_r4_resume.log"
