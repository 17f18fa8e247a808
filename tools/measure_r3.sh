#!/bin/bash
# Round-3 measurement sequence (run when the TPU tunnel is live).
# Each step appends to /tmp/r3_measure.log; safe to re-run (compile cache).
# ORDERED BY PRIORITY in case the tunnel window is short: the on-chip
# equality check gates everything (if it fails, set TB_PAD_SKIP=0 / flip
# fused_skip_invalid_blocks before any timing), then the driver-facing
# bench (also primes .jax_cache for the round driver), then the A/Bs.
set -uo pipefail
LOG=/tmp/r3_measure.log
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-2400}" "$@" 2>&1 | tail -6 | tee -a "$LOG"
}

# 0. padding-aware kernels: verify eval outputs EQUAL on real TPU
#    (skip on vs off — interpret-mode tests can't catch Mosaic-only bugs)
run python tools/ab_padding_skip.py --check
# 1. full driver bench (eval rollout + train step); primes the compile cache
run python bench.py
# 2. padding-aware kernels A/B (node-kernel block skip + attention
#    query-block skip, each alone and together, + flash K/V variants)
run python tools/ab_padding_skip.py
# 3. padding-sensitivity bound: the same variants with ALL agents and
#    polylines valid (skips cannot fire — measures pure flag overhead and
#    gives the honest dense-throughput number for PERF.md)
run python tools/ab_padding_skip.py --dense
# 4. WOMD-like fill (between the sparse synthetic default and --dense):
#    what the skips buy on realistically-filled scenes
run python tools/ab_padding_skip.py --fill 768,40
# 5. shape bucketing (host-side capacity slicing, data/bucketing.py) on
#    top of the kernels: same workload with the capacity axes sliced to
#    the batch's real content (128 pl / 16 agents on synthetic data)
run python tools/ab_padding_skip.py --bucket
# 6. pre-processing decomposition (PE relayout fix verification)
run env BENCH_N_SCENE=64 python tools/profile_pre.py
# 7. batch-256 eval A/B (dispatch amortization)
run env BENCH_TRAIN=0 BENCH_N_SCENE=256 python bench.py
# 8. train-step remat policy A/B
run env VARIANTS=base,save_attn python tools/profile_train.py
# 9. train-step with finer query blocks (lets the dead-row skip fire on the
#    latent as2pl's strided validity; default routing unchanged)
run env VARIANTS=base TB_ATTN_TRAIN_SB=16 python tools/profile_train.py
echo "=== done ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
