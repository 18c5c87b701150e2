#!/usr/bin/env bash
# RobustMVD-style MVS depth benchmark (reference bash_scripts/benchmark/rmvd_mvs_benchmark/).
# Usage: WAI_ROOT=... METADATA=... CKPT=... bash bash_scripts/benchmark/rmvd_mvs.sh
set -euo pipefail
WAI_ROOT=${WAI_ROOT:?set WAI_ROOT}
METADATA=${METADATA:?set METADATA}
CKPT=${CKPT:-}
CKPT_ARG=${CKPT:+--checkpoint "$CKPT"}
for DS in ETH3DWAI ScanNetPPWAI; do
  ROOT_DIR="$WAI_ROOT/$(echo "$DS" | tr 'A-Z' 'a-z' | sed 's/wai$//')"
  python scripts/benchmark_rmvd.py \
    --dataset-expr "${DS}(ROOT='${ROOT_DIR}', dataset_metadata_dir='${METADATA}', split='test', num_views=4, resolution=(518, 336))" \
    $CKPT_ARG \
    --out "outputs/benchmark/rmvd_${DS}.json"
done
