#!/bin/bash
# TPU training launcher — analog of the reference's bash/train.sh (6x 2080 Ti
# SLURM job). On a TPU VM/pod slice, the same program runs per host; JAX
# initializes the mesh from the TPU topology, scenes shard over the "data"
# axis, and host work (ckpt/videos/submissions) is rank-0 gated.
#
# Usage:
#   DATA_DIR=/data/h5_womd RUN_DIR=runs/exp1 scripts/train.sh [extra overrides...]
# Resume an interrupted run (full trainer state: params/opt/epoch/step/rng):
#   RESUME=last RUN_DIR=runs/exp1 scripts/train.sh
set -euo pipefail
trap "echo sigterm received, exiting!" SIGTERM

DATA_DIR="${DATA_DIR:-h5_womd_sim_agent}"
RUN_DIR="${RUN_DIR:-runs/$(date +%Y%m%d_%H%M%S)}"
N_EPOCHS="${N_EPOCHS:-40}"
mkdir -p "$RUN_DIR"

python -u -m trafficbots_tpu.run \
  action=fit \
  run_dir="$RUN_DIR" \
  n_epochs="$N_EPOCHS" \
  data.data_dir="$DATA_DIR" \
  ${RESUME:+resume=$RESUME} \
  "$@" 2>&1 | tee -a "$RUN_DIR/train.log"
