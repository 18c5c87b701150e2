#!/usr/bin/env bash
# Stage-1 curriculum: 4-view training (reference
# bash_scripts/train/main/mapa_curri_4v_13d_48ipg_64g.sh). On multi-host
# pods launch this once per host; parallel.distributed handles init.
# Usage: DATASET_EXPR="..." bash bash_scripts/train/stage1_4view.sh [extra overrides...]
set -euo pipefail
DATASET_EXPR=${DATASET_EXPR:?set DATASET_EXPR (dataset DSL)}
python scripts/train.py \
  --config configs/train.yaml \
  --dataset-expr "$DATASET_EXPR" \
  --override train_params.epochs=100 \
  "$@"
