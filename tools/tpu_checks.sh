#!/bin/bash
# Round-5 hardware checks + measurement sequence (run when the TPU tunnel
# is live). Each step appends to /tmp/r5_measure.log; safe to re-run (the
# persistent compile cache makes repeats cheap). ORDERED BY PRIORITY in
# case the tunnel window is short.
set -uo pipefail
LOG=${LOG:-/tmp/r5_measure.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-2400}" "$@" 2>&1 | tail -8 | tee -a "$LOG"
}

# 0. TPU-gated kernel tests: re-verify the Mosaic custom-VJP kernels and
#    their in-kernel PRNG dropout on REAL hardware every hardware round
#    (interpret-mode tests can't catch Mosaic-only lowering bugs).
run env TB_TEST_TPU=1 python -m pytest -q \
    tests/test_attention_train.py tests/test_node_encoder_train.py
# 1. driver-facing bench at defaults (also primes .jax_cache for the driver)
run python bench.py
# 2. the round-5 memory-layout unlock: batch 256 eval must now COMPILE
#    (round 4: OOM at 24.01G of 15.75G from tile-padded PE/MLP temps)
run env BENCH_TRAIN=0 BENCH_N_SCENE=256 python bench.py
# 3. eval batch scaling at WOMD fill (128 default / 192 / 256)
run env BENCH_TRAIN=0 BENCH_N_SCENE=192 python bench.py
# 4. chunked-map-encode A/B at the default batch (is chunk=32 free?)
run python tools/ab_map_chunk.py
# 5. train batch scaling at WOMD fill after the round-3/4 kernels
#    (round-3 measured 64 flat BEFORE the fused backward + honest fill)
run env BENCH_N_SCENE=32 BENCH_TRAIN_N_SCENE=64 BENCH_N_ITER=2 python bench.py
run env BENCH_N_SCENE=32 BENCH_TRAIN_N_SCENE=128 BENCH_N_ITER=2 python bench.py
# 6. prime the compile caches for the driver's entry points: entry() on the
#    real chip (.jax_cache) and the 8-device CPU dryrun (.jax_cache_cpu)
run python __graft_entry__.py
run python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "=== done ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
