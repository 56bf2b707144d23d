#!/bin/bash
# IHMR-MLP stage-wise training (ref bash/train_mlp.sh).
set -euo pipefail
data_root=${DATA_ROOT:-./ihmr_data}
python -m ihmr_tpu.cli train-mlp \
    --data_root "$data_root" \
    --model_root "${MODEL_ROOT:-$data_root/models}" \
    --param_root "$data_root/hand26m/param" \
    --anno_path hand26m/annotation/train.pkl \
    --pred_path hand26m/prediction/train.pkl \
    --checkpoints_dir checkpoints/mlp --batchSize 64 "$@"
