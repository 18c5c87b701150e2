#!/usr/bin/env bash
# Single-view calibration benchmark (reference bash_scripts/benchmark/calibration/).
# Usage: WAI_ROOT=... METADATA=... CKPT=... bash bash_scripts/benchmark/calibration.sh
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
CKPT=${CKPT:-}
CKPT_ARG=${CKPT:+--checkpoint "$CKPT"}
for DS in "ETH3DWAI eth3d" "ScanNetPPWAI scannetppv2" "TartanAirV2WBWAI tav2_wb"; do
  read -r CLS DIR <<< "$DS"
  python scripts/benchmark_calibration.py \
    --dataset-expr "${CLS}(ROOT='${WAI_ROOT}/${DIR}', dataset_metadata_dir='${METADATA}', split='test', num_views=1, resolution=(518, 336))" \
    $CKPT_ARG \
    --out "outputs/benchmark/calibration_${CLS}.json"
done
