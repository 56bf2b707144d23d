#!/bin/bash
# IHMR-Baseline evaluation (ref bash/test_baseline.sh).
set -euo pipefail
data_root=${DATA_ROOT:-./ihmr_data}
python -m ihmr_tpu.cli test-baseline \
    --data_root "$data_root" \
    --model_root "${MODEL_ROOT:-$data_root/models}" \
    --param_root "$data_root/hand26m/param" \
    --anno_path hand26m/annotation/test.pkl \
    --checkpoints_dir checkpoints/baseline \
    --batchSize 512 --test_epoch latest "$@"
