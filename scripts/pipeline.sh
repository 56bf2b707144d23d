#!/bin/bash
# The full three-phase IHMR pipeline chained end-to-end:
#   baseline eval -> prediction pkl -> OPT refine -> pseudo-GT -> MLP training
# (the reference performs this hand-off manually between
#  bash/{test_baseline,optimize,train_mlp}.sh via evaluate_results pkls;
#  ref src/data/data_utils.py:42-70, src/data/mlp_dataset.py:117-145).
#
# With no real dataset present, set SYNTHETIC=1 to generate a synthetic
# corpus + synthetic MANO and soak the whole chain (the default when
# DATA_ROOT is unset).
set -euo pipefail

if [[ "${SYNTHETIC:-}" == "1" || -z "${DATA_ROOT:-}" ]]; then
    data_root=$(mktemp -d /tmp/ihmr_pipeline.XXXXXX)
    echo "[pipeline] synthetic corpus -> $data_root"
    python - "$data_root" <<'EOF'
import sys
sys.path.insert(0, ".")
from tests.test_data import _write_synthetic_corpus
_write_synthetic_corpus(sys.argv[1], n=int(__import__("os").environ.get("PIPELINE_N", "8")))
EOF
    extra=(--synthetic_mano)
    anno=anno.pkl
else
    data_root=$DATA_ROOT
    extra=(--model_root "${MODEL_ROOT:-$data_root/models}")
    anno=${ANNO_PATH:-hand26m/annotation/test_inter_close.pkl}
fi

bs=${BATCH_SIZE:-4}
ckpt=${CKPT_DIR:-./checkpoints_pipeline}
common=(--data_root "$data_root" --anno_path "$anno" --batchSize "$bs"
        --checkpoints_dir "$ckpt" "${extra[@]}")
train_epochs=${TRAIN_EPOCHS:-1}
stage_epochs=${STAGE_EPOCHS:-}

mkdir -p log/pipeline

echo "[pipeline] phase 0: train-baseline ($train_epochs epoch[s])"
python -m ihmr_tpu.cli train-baseline --total_epoch "$train_epochs" \
    --save_epoch_freq 1 "${common[@]}" 2>&1 | tee log/pipeline/0_train.log

echo "[pipeline] phase 1: test-baseline -> prediction pkl"
python -m ihmr_tpu.cli test-baseline --export_pred "$data_root/chain_pred.pkl" \
    "${common[@]}" 2>&1 | tee log/pipeline/1_test.log

echo "[pipeline] phase 2: optimize -> pseudo-GT pkl"
python -m ihmr_tpu.cli optimize --pred_path "$data_root/chain_pred.pkl" \
    ${stage_epochs:+--stage_epochs "$stage_epochs"} --save_mid_freq 10 \
    --export_pseudo_gt "$data_root/opt_pseudo_gt.pkl" \
    "${common[@]}" 2>&1 | tee log/pipeline/2_opt.log

echo "[pipeline] phase 3: train-mlp on baseline preds + OPT pseudo-GT"
python -m ihmr_tpu.cli train-mlp --pred_path "$data_root/chain_pred.pkl" \
    --use_opt_params --opt_params_path "$data_root/opt_pseudo_gt.pkl" \
    ${stage_epochs:+--stage_epochs "$stage_epochs"} \
    "${common[@]}" 2>&1 | tee log/pipeline/3_mlp.log

echo "[pipeline] phase 4: test-mlp (final cascade eval from checkpoints)"
python -m ihmr_tpu.cli test-mlp --pred_path "$data_root/chain_pred.pkl" \
    "${common[@]}" 2>&1 | tee log/pipeline/4_eval.log

echo "[pipeline] complete; logs under log/pipeline/"
