"""Data-parallel semantics on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihmr_tpu.data.synthetic import make_opt_inputs
from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.parallel import (
    batch_sharding,
    gather_to_host,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch


@pytest.fixture(scope="module")
def model():
    return synthetic_mano_model()


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple():
    assert pad_to_multiple(10, 4) == 2
    assert pad_to_multiple(8, 4) == 0


def test_shard_batch_places_shards(model):
    mesh = make_mesh()
    params, batch = make_opt_inputs(model, batch=8, seed=0)
    sharded = shard_batch(batch, mesh)
    sh = sharded.joints_3d.sharding
    assert sh.num_devices == 8


def test_sharded_opt_matches_single_device(model):
    """OPT is embarrassingly parallel: sharding the batch across the mesh
    must not change any sample's refined parameters."""
    strategy = tuple(dataclasses.replace(s, epoch=6) for s in opt_default[:2])
    cfg = OptConfig(save_mid_freq=2, num_candidates=4)
    params, batch = make_opt_inputs(model, batch=8, seed=1)

    out_single, _ = optimize_batch(model, params, batch, strategy, cfg)

    mesh = make_mesh()
    with mesh:
        params_s = shard_batch(params, mesh)
        batch_s = shard_batch(batch, mesh)
        model_r = replicate(model, mesh)
        out_sharded, _ = optimize_batch(model_r, params_s, batch_s, strategy, cfg)

    host = gather_to_host(out_sharded)
    for k in out_single:
        np.testing.assert_allclose(
            host[k], np.asarray(out_single[k]), atol=1e-5, err_msg=k
        )


def test_dp_train_step_matches_single_device(model):
    """pjit DP (sharded batch, replicated params) must produce the same
    gradients/updated params as the single-device step — the DDP contract."""
    from ihmr_tpu.data.synthetic import generate
    from ihmr_tpu.mano.loader import mirror_mano_model
    from ihmr_tpu.models import InterHandEncoder, build_mean_params
    from ihmr_tpu.train import BaselineBatch, TrainConfig, create_state, train_step

    mano_left = mirror_mano_model(model)
    encoder = InterHandEncoder(arch="resnet18")
    config = TrainConfig(lr=1e-3, num_candidates=4)
    mean = build_mean_params(np.zeros(48), np.zeros(10))

    B = 8
    d = generate(model, B, seed=0, noise=0.1)
    ones = jnp.ones((B, 42, 1), jnp.float32)
    rng = np.random.RandomState(0)
    batch = BaselineBatch(
        img=jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)) * 0.1,
        hand_type_array=jnp.ones((B, 2)),
        hand_type_valid=jnp.ones((B, 1)),
        joints_2d=jnp.concatenate([d["gt_j2"], ones], axis=-1),
        joints_3d=jnp.concatenate([d["gt_j3"], ones], axis=-1),
        gt_pose_params=d["gt_pose"],
        gt_shape_params=d["gt_shape"],
        mano_params_weight=jnp.ones((B, 2)),
        hand_trans=jnp.concatenate([d["gt_trans"], jnp.ones((B, 1))], axis=-1)[:, None, :],
        do_flip=jnp.zeros((B,), jnp.int32),
    )

    from ihmr_tpu.train.baseline import forward_and_loss

    state0 = create_state(encoder, mean, config, jax.random.PRNGKey(0), input_size=64)

    # NOTE: comparing post-Adam params is NOT a valid DP test — Adam's
    # m/sqrt(v) amplifies reduction-order noise on near-zero gradients into
    # +-lr param flips. The DP contract is about LOSS and GRADIENTS.
    def loss_and_grads(params, batch_in, mr, ml):
        def f(p):
            return forward_and_loss(
                encoder, p, state0.batch_stats, state0.mean_params, batch_in,
                mr, ml, config, train=True,
            )[0]

        return jax.jit(jax.value_and_grad(f))(params)

    loss_s, grads_s = loss_and_grads(state0.params, batch, model, mano_left)

    mesh = make_mesh()
    with mesh:
        params_r = replicate(state0.params, mesh)
        batch_s = shard_batch(batch, mesh)
        loss_dp, grads_dp = loss_and_grads(
            params_r, batch_s, replicate(model, mesh), replicate(mano_left, mesh)
        )

    np.testing.assert_allclose(float(loss_dp), float(loss_s), rtol=1e-5)
    leaves_a = jax.tree_util.tree_leaves(gather_to_host(grads_dp))
    leaves_b = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, grads_s))
    worst = max(float(np.abs(a - b).max()) for a, b in zip(leaves_a, leaves_b))
    assert worst < 1e-4, worst
