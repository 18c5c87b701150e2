#!/usr/bin/env bash
# Dense 2-view benchmark: flagship, calibrated SfM (ray inputs)
# (reference bash_scripts/benchmark/dense_2_view/mapa_24v_csfm.sh)
# Usage: WAI_ROOT=/data/wai METADATA=/data/wai_metadata [CKPT=...] bash bash_scripts/benchmark/dense_2_view/mapa_24v_csfm.sh
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
CKPT=${CKPT:-}
CKPT_ARG=${CKPT:+--checkpoint "$CKPT"}

# (batch_size, views) matrix per the reference driver
COMBOS=("10 2")
for combo in "${COMBOS[@]}"; do
  read -r BS V <<< "$combo"
  for DS in "ETH3DWAI eth3d 0.025" "ScanNetPPWAI scannetppv2 0.25" "TartanAirV2WBWAI tav2_wb 0.25"; do
    read -r CLS DIR THRES <<< "$DS"
    python scripts/benchmark_dense_n_view.py \
      --dataset-expr "${CLS}(ROOT='${WAI_ROOT}/${DIR}', dataset_metadata_dir='${METADATA}', split='test', num_views=${V}, resolution=(518, 336), covisibility_thres=${THRES}, seed=0)" \
      --model mapanything --task calibrated_sfm --batch-size "$BS" $CKPT_ARG \
      --out "outputs/benchmark/dense_n_view/2v_mapa_24v_csfm/${CLS}_${V}v.json"
  done
done
