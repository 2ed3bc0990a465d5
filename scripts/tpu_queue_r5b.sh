#!/bin/bash
# Round-5 follow-up queue (sequential — never two TPU processes at once).
#
# Contents: the zk 2^20/2^21 re-records with the chunked device blind +
# word-major blocked linear route (commit 8f9ffde — the first zk20 run
# measured the 47 s host-blind fallback, and zk21 OOMed on the
# entry-major sampler transient), the 2^22 records with the word-major
# sampler (the first r5 attempt raced the fix landing on disk), and a
# core-pieces + headline refresh on the final kernel set.
set -x
cd "$(dirname "$0")/.."
LOG=tpu_queue_logs/r5b_$(date +%H%M%S)
mkdir -p "$LOG"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "rc=$? $name" >> "$LOG/status.txt"
}

run atscale_zk20   7200 python scripts/at_scale.py --sizes 20 --zk --no-canary --out atscale_zk20_r5b.json
run atscale22      9000 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5.json
run atscale22_hit  7200 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5_cachehit.json
run atscale_zk21   9000 python scripts/at_scale.py --sizes 21 --zk --no-canary --out atscale_zk21_r5.json
run core_pieces    3600 python scripts/bench_core_pieces.py --out core_pieces_r5.json
run bench          3600 python bench.py

echo DONE >> "$LOG/status.txt"
