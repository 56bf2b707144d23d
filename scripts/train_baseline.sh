#!/bin/bash
# IHMR-Baseline training launcher (ref bash/train_baseline.sh).
# Multi-host DP: run once per host with JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each process shards the dataset.
set -euo pipefail
data_root=${DATA_ROOT:-./ihmr_data}
model_root=${MODEL_ROOT:-$data_root/models}
log_dir=log/baseline; mkdir -p $log_dir
python -m ihmr_tpu.cli train-baseline \
    --data_root "$data_root" \
    --model_root "$model_root" \
    --param_root "$data_root/hand26m/param" \
    --anno_path hand26m/annotation/train.pkl \
    --checkpoints_dir checkpoints/baseline \
    --batchSize 64 --lr 1e-4 --lr_decay_type cosine --total_epoch 20 \
    --use_random_flip --use_random_rescale --use_random_position \
    --use_random_rotation --use_color_jittering \
    --use_motion_blur --blur_kernel_dir "$model_root/blur_kernel" \
    "$@" 2>&1 | tee $log_dir/train_$(date +%m_%d_%H_%M).log
