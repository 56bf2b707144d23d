"""The full reference workflow chained end-to-end: baseline eval produces the
prediction pkl, which feeds the OPT dataset and refinement — the hand-off the
reference performs through evaluate_results pkls (SURVEY.md §5.5)."""

import dataclasses
import os.path as osp

import jax
import numpy as np
import pytest

from ihmr_tpu.data import BatchLoader, BaselineDataset, DataConfig, OPTDataset
from ihmr_tpu.eval.export import evaluator_to_prediction_pkl
from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.mano.loader import mirror_mano_model
from ihmr_tpu.models import InterHandEncoder, build_mean_params
from ihmr_tpu.refine import OptConfig, opt_default
from ihmr_tpu.train import TrainConfig, create_state
from ihmr_tpu.train.loops import optimize_loop, test_baseline_loop
from tests.test_data import _write_synthetic_corpus


def test_baseline_to_opt_chain(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chain"))
    _write_synthetic_corpus(root, n=4)

    mano_right = synthetic_mano_model()
    mano_left = mirror_mano_model(mano_right)

    # 1. baseline eval on the corpus
    cfg = DataConfig(data_root=root, anno_path="anno.pkl", batch_size=2, input_size=64)
    ds = BaselineDataset(cfg)
    ds.load_data()
    loader = BatchLoader(ds, 2, prefetch=0)
    encoder = InterHandEncoder(arch="resnet18")
    config = TrainConfig(num_candidates=4)
    state = create_state(
        encoder, build_mean_params(np.zeros(48), np.zeros(10)), config, jax.random.PRNGKey(0), 64
    )
    evaluator = test_baseline_loop(encoder, state, loader, ds, mano_right, mano_left, config)
    evaluator.remove_redunc()
    assert "img_feat" in evaluator.pred_results[0]
    assert evaluator.pred_results[0]["img_feat"].shape == (1024,)

    # 2. export the prediction pkl in the reference schema
    pred_path = osp.join(root, "chained_pred.pkl")
    evaluator_to_prediction_pkl(evaluator, pred_path)

    # 3. OPT consumes annotation + the freshly exported predictions
    opt_cfg = DataConfig(
        data_root=root, anno_path="anno.pkl", pred_path="chained_pred.pkl", batch_size=2
    )
    opt_ds = OPTDataset(opt_cfg)
    opt_ds.load_data()
    opt_loader = BatchLoader(opt_ds, 2, prefetch=0)
    strategy = tuple(dataclasses.replace(s, epoch=2) for s in opt_default)
    opt_eval = optimize_loop(
        mano_right,
        opt_loader,
        opt_ds,
        strategy,
        OptConfig(save_mid_freq=1, num_candidates=4),
        left_faces=mano_left.faces,
        is_main=False,
    )
    opt_eval.remove_redunc()
    assert len(opt_eval.pred_results) == 4
    md = opt_eval.metric_dict()
    assert np.isfinite(md["mpjpe_3d"]) and np.isfinite(md["collision_ave"])
