#!/usr/bin/env bash
# Loss ablation: disentangled factored geometry
# (reference bash_scripts/train/ablations/)
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
EXP=${EXP:-outputs/experiments}
python scripts/train.py --config configs/train.yaml \
  --override machine.root_data_dir="$WAI_ROOT" \
  --override machine.mapanything_dataset_metadata_dir="$METADATA" \
  --override machine.root_experiments_dir="$EXP" \
  --override loss=overall_disentangled_loss \
  --override dataset=bmvs_518_many_ar_48ipg_8g
