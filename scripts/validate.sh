#!/bin/bash
# Validation + (optional) submission-file writing on the WOMD validation
# split — analog of the reference's bash/submission.sh (1-GPU job).
#
# Usage:
#   DATA_DIR=/data/h5_womd RUN_DIR=runs/exp1 scripts/validate.sh
#   WRITE_SUBMISSIONS=1 scripts/validate.sh        # also write .tar.gz protos
set -euo pipefail
trap "echo sigterm received, exiting!" SIGTERM

DATA_DIR="${DATA_DIR:-h5_womd_sim_agent}"
RUN_DIR="${RUN_DIR:?set RUN_DIR to the training run to evaluate}"

WRITE_SUBMISSIONS="${WRITE_SUBMISSIONS:-0}" python -u -m trafficbots_tpu.run \
  action=validate \
  run_dir="$RUN_DIR" \
  resume=best \
  data.data_dir="$DATA_DIR" \
  "$@" 2>&1 | tee -a "$RUN_DIR/validate.log"
