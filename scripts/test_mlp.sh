#!/bin/bash
# IHMR-MLP cascade evaluation (ref bash/test_mlp.sh).
set -euo pipefail
data_root=${DATA_ROOT:-./ihmr_data}
python -m ihmr_tpu.cli test-mlp \
    --data_root "$data_root" \
    --model_root "${MODEL_ROOT:-$data_root/models}" \
    --param_root "$data_root/hand26m/param" \
    --anno_path hand26m/annotation/test_inter_close.pkl \
    --pred_path hand26m/prediction/test_inter_close.pkl \
    --checkpoints_dir checkpoints/mlp --batchSize 512 --test_epoch latest "$@"
