#!/usr/bin/env bash
# Dense up-to-N-view benchmark matrix (reference
# bash_scripts/benchmark/dense_n_view/*.sh). Runs the flagship model over
# the three benchmark datasets at each view count.
#
# Usage: WAI_ROOT=/data/wai METADATA=/data/wai_metadata CKPT=/ckpts/mapanything \
#        bash bash_scripts/benchmark/dense_n_view.sh [views...]
set -euo pipefail
VIEWS=("${@:-2 4 8 16 24}")
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
CKPT=${CKPT:-}
CKPT_ARG=${CKPT:+--checkpoint "$CKPT"}
for V in ${VIEWS[@]}; do
  for DS in ETH3DWAI ScanNetPPWAI TartanAirV2WBWAI; do
    ROOT_DIR="$WAI_ROOT/$(echo "$DS" | tr 'A-Z' 'a-z' | sed 's/wai$//')"
    python scripts/benchmark_dense_n_view.py \
      --dataset-expr "${DS}(ROOT='${ROOT_DIR}', dataset_metadata_dir='${METADATA}', split='test', num_views=${V}, resolution=(518, 336), covisibility_thres=0.025, seed=0)" \
      $CKPT_ARG \
      --out "outputs/benchmark/dense_${DS}_${V}v.json"
  done
done
