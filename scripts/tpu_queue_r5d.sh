#!/bin/bash
# Round-5d queue (fresh host, empty local jax executable cache):
# recover the 2^21 record that was never force-added in r5b, and take
# the r5c measurements (n-aware streaming chunk sizing, 79e178d) at
# 2^21/2^22 plus cache-hit repeats.  Sequential — never two TPU
# processes at once.
set -x
cd "$(dirname "$0")/.."
LOG=tpu_queue_logs/r5d_$(date +%H%M%S)
mkdir -p "$LOG"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "rc=$? $name" >> "$LOG/status.txt"
}

run bench          3600 python bench.py
run atscale21      7200 python scripts/at_scale.py --sizes 21 --out atscale_21_r5d.json
run atscale22      9000 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5d.json
run atscale21_hit  5400 python scripts/at_scale.py --sizes 21 --no-canary --out atscale_21_r5d_cachehit.json
run atscale22_hit  7200 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5d_cachehit.json
run bench2         3600 python bench.py

echo DONE >> "$LOG/status.txt"
