#!/usr/bin/env bash
# Stage-2 curriculum: 24-view training resumed from stage 1 (reference
# bash_scripts/train/main/mapa_curri_24v_13d_48ipg_64g.sh).
# Usage: DATASET_EXPR="..." STAGE1_CKPT=... bash bash_scripts/train/stage2_24view.sh
set -euo pipefail
DATASET_EXPR=${DATASET_EXPR:?set DATASET_EXPR (dataset DSL, 24-view)}
STAGE1_CKPT=${STAGE1_CKPT:?set STAGE1_CKPT}
python scripts/train.py \
  --config configs/train.yaml \
  --dataset-expr "$DATASET_EXPR" \
  --override train_params.epochs=35 \
  --override train_params.pretrained="$STAGE1_CKPT" \
  "$@"
