#!/bin/bash
# Round-5 remaining hardware measurements (train batch scaling, verdict item 5
# + a map-chunk confirmation rep). Appends to /tmp/r5_measure.log.
cd /root/repo
log=/tmp/r5_measure.log
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 3000 "$@" >> "$log" 2>&1
}
run env BENCH_N_SCENE=32 BENCH_TRAIN_N_SCENE=64 BENCH_N_ITER=2 python bench.py
run env BENCH_N_SCENE=32 BENCH_TRAIN_N_SCENE=128 BENCH_N_ITER=2 python bench.py
run python tools/ab_map_chunk.py
echo "=== DONE ($(date +%H:%M:%S)) ===" >> "$log"
