#!/usr/bin/env bash
# Single-host 8-chip recipe (24 images/chip)
# (reference bash_scripts/train/main/)
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
EXP=${EXP:-outputs/experiments}
python scripts/train.py --config configs/train.yaml \
  --override machine.root_data_dir="$WAI_ROOT" \
  --override machine.mapanything_dataset_metadata_dir="$METADATA" \
  --override machine.root_experiments_dir="$EXP" \
  --override dataset=megatrain_13d_518_many_ar_24ipg_8g \
  --override distributed.max_num_of_imgs_per_chip=24
