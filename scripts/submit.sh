#!/bin/bash
# WOMD test-split submission generation (no GT): prior latent + predicted
# goal, K=6 joint futures, leaderboard proto files. Analog of the reference's
# bash/submission.sh with action=test (waymo_motion.py:902-953).
#
# Usage:
#   DATA_DIR=/data/h5_womd RUN_DIR=runs/exp1 scripts/submit.sh
set -euo pipefail
trap "echo sigterm received, exiting!" SIGTERM

DATA_DIR="${DATA_DIR:-h5_womd_sim_agent}"
RUN_DIR="${RUN_DIR:?set RUN_DIR to the training run to submit}"

python -u -m trafficbots_tpu.run \
  action=test \
  run_dir="$RUN_DIR" \
  resume=best \
  data.data_dir="$DATA_DIR" \
  "$@" 2>&1 | tee -a "$RUN_DIR/submit.log"
