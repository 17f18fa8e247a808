#!/bin/bash
# Offline WOMD TFRecord -> packed h5 ETL — analog of the reference's
# bash/pack_h5.sh (CPU job, ~2 days for the training split on 12 cores).
# Requires the waymo_open_dataset pip package for proto parsing.
#
# Usage:
#   WOMD_DIR=/data/womd_scenario OUT_DIR=/data/h5_womd scripts/pack_h5.sh training
set -euo pipefail
trap "echo sigterm received, exiting!" SIGTERM

SPLIT="${1:?usage: pack_h5.sh {training|validation|testing}}"
WOMD_DIR="${WOMD_DIR:?set WOMD_DIR to the WOMD scenario TFRecord directory}"
OUT_DIR="${OUT_DIR:-h5_womd_sim_agent}"
mkdir -p "$OUT_DIR"

python -u -m trafficbots_tpu.data.womd_adapter \
  --dataset "$SPLIT" \
  --in-dir "$WOMD_DIR" \
  --out-dir "$OUT_DIR" \
  "${@:2}"
