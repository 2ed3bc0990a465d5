#!/bin/bash
# Round-5 TPU record queue (sequential — never two TPU processes at once).
#
# Order: kernel A/Bs first (cheap, inform the records), then the at-scale
# re-records with the round-5 kernel set (device linear path, MXU spot
# eval, (128,32) NTT split), then fresh-process cache-hit cold records
# (VERDICT r4 item 4), then zk at 2^20/2^21 with a same-session non-zk
# denominator (item 5), then the Poseidon-MT at-scale proof (item 8).
set -x
cd "$(dirname "$0")/.."
LOG=tpu_queue_logs/r5_$(date +%H%M%S)
mkdir -p "$LOG"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "rc=$? $name" >> "$LOG/status.txt"
}

run spot_ab        3600 python scripts/bench_spot_ab.py --out spot_ab_r5.json
run poseidon_mt16  5400 python scripts/bench_poseidon_mt.py --log2 16 --out poseidon_mt_r5.json
run atscale21      5400 python scripts/at_scale.py --sizes 21 --out atscale_21_r5.json
run atscale22      7200 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5.json
# fresh-process cache-hit cold (disk executable cache warm from above)
run atscale21_hit  3600 python scripts/at_scale.py --sizes 21 --no-canary --out atscale_21_r5_cachehit.json
run atscale22_hit  5400 python scripts/at_scale.py --sizes 22 --no-canary --out atscale_22_r5_cachehit.json
# zk ladder with same-session non-zk denominators
run atscale20      3600 python scripts/at_scale.py --sizes 20 --no-canary --out atscale_20_r5.json
run atscale_zk20   5400 python scripts/at_scale.py --sizes 20 --zk --no-canary --out atscale_zk20_r5.json
run atscale_zk21   7200 python scripts/at_scale.py --sizes 21 --zk --no-canary --out atscale_zk21_r5.json
# headline refresh last (records bench_tpu_last.json on the final kernel set)
run bench          3600 python bench.py

echo DONE >> "$LOG/status.txt"
