#!/bin/bash
# IHMR-OPT test-time optimization (ref bash/optimize.sh).
set -euo pipefail
data_root=${DATA_ROOT:-./ihmr_data}
mkdir -p log/optimize
python -m ihmr_tpu.cli optimize \
    --data_root "$data_root" \
    --model_root "${MODEL_ROOT:-$data_root/models}" \
    --param_root "$data_root/hand26m/param" \
    --anno_path hand26m/annotation/test_inter_close.pkl \
    --pred_path hand26m/prediction/test_inter_close.pkl \
    --batchSize 512 --strategy opt_default --save_mid_freq 10 --optimizer adam \
    "$@" 2>&1 | tee log/optimize/opt.log
