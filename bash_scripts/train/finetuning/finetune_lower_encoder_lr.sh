#!/usr/bin/env bash
# Finetune from a pretrained checkpoint with 0.1x encoder LR
# (reference bash_scripts/train/finetuning/)
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
EXP=${EXP:-outputs/experiments}
python scripts/train.py --config configs/train.yaml \
  --override machine.root_data_dir="$WAI_ROOT" \
  --override machine.mapanything_dataset_metadata_dir="$METADATA" \
  --override machine.root_experiments_dir="$EXP" \
  --override train_params=finetune_with_lower_encoder_lr \
  --override dataset=megatrain_6d_518_many_ar_48ipg_8g
