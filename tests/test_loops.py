"""End-to-end run-loop tests over the synthetic file corpus: the TPU
equivalents of the reference's train/test/optimize entry flows."""

import dataclasses
import os.path as osp

import cv2
import jax
import numpy as np
import pytest

from ihmr_tpu.data import BaselineDataset, BatchLoader, ComposeDataset, DataConfig, OPTDataset
from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.mano.loader import mirror_mano_model
from ihmr_tpu.models import InterHandEncoder, build_mean_params
from ihmr_tpu.refine import OptConfig, opt_default
from ihmr_tpu.train import TrainConfig, create_state
from ihmr_tpu.train.loops import (
    optimize_loop,
    test_baseline_loop,
    train_baseline_loop,
)
from ihmr_tpu.utils import io_utils
from tests.test_data import _write_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    _write_synthetic_corpus(root, n=6)
    return root


@pytest.fixture(scope="module")
def mano():
    right = synthetic_mano_model()
    return right, mirror_mano_model(right)


def test_train_then_eval_baseline(corpus, mano, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    mano_right, mano_left = mano
    cfg = DataConfig(
        data_root=corpus, anno_path="anno.pkl", batch_size=2, is_train=True, input_size=64
    )
    train_ds = BaselineDataset(cfg)
    train_ds.load_data()
    loader = BatchLoader(train_ds, 2, shuffle=True, drop_last=True, prefetch=0)

    encoder = InterHandEncoder(arch="resnet18")
    config = TrainConfig(lr=1e-4, total_epoch=1, lr_decay_type="cosine", num_candidates=4)
    state = create_state(
        encoder, build_mean_params(np.zeros(48), np.zeros(10)), config, jax.random.PRNGKey(0), 64
    )
    state = train_baseline_loop(
        encoder, state, loader, mano_right, mano_left, config, ckpt_dir,
        print_freq=4, save_epoch_freq=1,
    )
    # checkpoints written with the reference label scheme
    assert osp.exists(osp.join(ckpt_dir, "latest_net_baseline"))
    assert osp.exists(osp.join(ckpt_dir, "1_net_baseline"))

    # eval on the padded test split
    eval_cfg = dataclasses.replace(cfg, is_train=False)
    eval_ds = BaselineDataset(eval_cfg)
    eval_ds.load_data()
    eval_loader = BatchLoader(eval_ds, 2, prefetch=0)
    evaluator = test_baseline_loop(
        encoder, state, eval_loader, eval_ds, mano_right, mano_left, config
    )
    evaluator.remove_redunc()
    assert len(evaluator.pred_results) == 6  # padding deduped
    md = evaluator.metric_dict()
    assert np.isfinite(md["mpjpe_3d"])


def test_optimize_loop(corpus, mano, capsys):
    mano_right, mano_left = mano
    cfg = DataConfig(
        data_root=corpus, anno_path="anno.pkl", pred_path="pred.pkl", batch_size=3
    )
    ds = OPTDataset(cfg)
    ds.load_data()
    loader = BatchLoader(ds, 3, prefetch=0)
    strategy = tuple(dataclasses.replace(s, epoch=2) for s in opt_default)
    import tempfile

    dump_dir = tempfile.mkdtemp()
    evaluator = optimize_loop(
        mano_right, loader, ds, strategy, OptConfig(save_mid_freq=1, num_candidates=4),
        left_faces=mano_left.faces,
        obj_dump_dir=dump_dir,
    )
    import glob

    assert len(glob.glob(dump_dir + "/*.obj")) == len(loader)
    evaluator.remove_redunc()
    assert len(evaluator.pred_results) == 6
    assert np.isfinite(evaluator.metric_dict()["collision_ave"])
    out = capsys.readouterr().out
    assert "hands/sec" in out  # throughput telemetry printed


def test_compose_dataset(corpus):
    cfg = DataConfig(data_root=corpus, anno_path="anno.pkl", batch_size=2)
    a = BaselineDataset(cfg)
    b = BaselineDataset(cfg)
    comp = ComposeDataset([a, b])
    assert len(comp) == len(a) + len(b)
    item = comp[len(a)]  # first item of second dataset
    assert item["img"].shape[2] == 3
    comp.shuffle_data()
    assert comp.name == "hand26m+hand26m"
