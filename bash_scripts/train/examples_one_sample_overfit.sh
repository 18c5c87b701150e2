#!/usr/bin/env bash
# One-sample overfit smoke run
# (reference bash_scripts/train/examples/)
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
EXP=${EXP:-outputs/experiments}
python scripts/train.py --config configs/train.yaml \
  --override machine.root_data_dir="$WAI_ROOT" \
  --override machine.mapanything_dataset_metadata_dir="$METADATA" \
  --override machine.root_experiments_dir="$EXP" \
  --override dataset=one_sample_test_data \
  --override train_params.epochs=1
