"""End-to-end MLP stage-wise training on synthetic data (tiny sizes)."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-oracle / full-schedule tests (fast tier: -m "not slow")

from ihmr_tpu.data.synthetic import make_mlp_inputs
from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.refine import MLP_DEFAULT_LOSS_WEIGHTS, MLPCaches, OptConfig, mlp_default
from ihmr_tpu.refine import mlp_engine
from ihmr_tpu.train.mlp import train_mlp_stages, warm_pass
from ihmr_tpu.train.mlp import test_mlp_loop as run_mlp_eval_loop  # avoid pytest collection


class _SyntheticMLPLoader:
    """Mimics BatchLoader: yields raw dicts the loop converts via to_mlp_batch."""

    def __init__(self, model, num_batches=2, batch_size=4):
        self.batches = [
            make_mlp_inputs(model, batch=batch_size, seed=s, index_offset=s * batch_size)
            for s in range(num_batches)
        ]
        self.batch_size = batch_size

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


class _FakeDataset:
    def __init__(self, n):
        self.data_list = [{"img_path": f"s_{i}.png", "hand_type": "interacting"} for i in range(n)]
        self.image_root = ""
        self.name = "synthetic"


@pytest.fixture(scope="module")
def model():
    return synthetic_mano_model()


def test_full_mlp_training_and_eval(model):
    strategy = tuple(
        dataclasses.replace(s, epoch=1) for s in mlp_default[:2]
    )  # 2 stages x 1 epoch for speed
    loader = _SyntheticMLPLoader(model, num_batches=2, batch_size=4)
    caches = MLPCaches(num_data=8)
    config = OptConfig(num_candidates=4)
    identity = lambda b: b  # loader already yields MLPBatch

    warm_pass(model, loader, caches, config, identity)
    assert caches.exists.all()

    stage_params = train_mlp_stages(
        model, strategy, loader, caches, config, identity, is_main=False
    )
    assert len(stage_params) == 2

    # cached select losses after training must never exceed the warm-pass ones
    warm = MLPCaches(num_data=8)
    warm_pass(model, loader, warm, config, identity)
    sel = "collision_loss_batch"
    assert np.all(caches.prev_losses[sel] <= warm.prev_losses[sel] + 1e-5)

    dataset = _FakeDataset(8)
    evaluator = run_mlp_eval_loop(
        model, strategy, stage_params, loader, dataset, config, identity
    )
    assert len(evaluator.pred_results) == 8
    md = evaluator.metric_dict()
    assert np.isfinite(md["mpjpe_3d"])
    assert np.isfinite(md["collision_ave"])
