#!/usr/bin/env bash
# Single-view calibration benchmark (reference bash_scripts/benchmark/calibration/).
# Usage: WAI_ROOT=... METADATA=... CKPT=... bash bash_scripts/benchmark/calibration.sh
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
CKPT=${CKPT:-}
CKPT_ARG=${CKPT:+--checkpoint "$CKPT"}
for DS in ETH3DWAI ScanNetPPWAI TartanAirV2WBWAI; do
  ROOT_DIR="$WAI_ROOT/$(echo "$DS" | tr 'A-Z' 'a-z' | sed 's/wai$//')"
  python scripts/benchmark_calibration.py \
    --dataset-expr "${DS}(ROOT='${ROOT_DIR}', dataset_metadata_dir='${METADATA}', split='test', num_views=1, resolution=(518, 336))" \
    $CKPT_ARG \
    --out "outputs/benchmark/calibration_${DS}.json"
done
