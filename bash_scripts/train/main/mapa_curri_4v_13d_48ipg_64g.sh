#!/usr/bin/env bash
# Stage 1: 4-view curriculum, 13-dataset megatrain, 64-chip pod
# (reference bash_scripts/train/main/mapa_curri_4v_13d_48ipg_64g.sh)
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
EXP=${EXP:-outputs/experiments}
python scripts/train.py --config configs/train.yaml \
  --override machine.root_data_dir="$WAI_ROOT" \
  --override machine.mapanything_dataset_metadata_dir="$METADATA" \
  --override machine.root_experiments_dir="$EXP" \
  --override dataset=megatrain_13d_518_many_ar_48ipg_64g \
  --override train_params=lower_encoder_lr_64g \
  --override distributed.max_num_of_imgs_per_chip=48
