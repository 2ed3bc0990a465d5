#!/bin/bash
# Round-5c queue: re-records with n-aware streaming chunk sizing
# (commit 79e178d halves the serialized NTT+absorb dispatch pairs in the
# streaming commit) and the linear.coo_upload cold-attribution timer
# (dbc278b).  Sequential — never two TPU processes at once.
set -x
cd "$(dirname "$0")/.."
LOG=tpu_queue_logs/r5c_$(date +%H%M%S)
mkdir -p "$LOG"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "rc=$? $name" >> "$LOG/status.txt"
}

run atscale21      7200 python scripts/at_scale.py --sizes 21 --no-canary --out atscale_21_r5c.json
run atscale22      9000 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5c.json
run atscale22_hit  7200 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5c_cachehit.json
run bench          3600 python bench.py

echo DONE >> "$LOG/status.txt"
