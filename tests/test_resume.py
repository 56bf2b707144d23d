"""Checkpoint resume restores params, batch stats, epoch AND optimizer state
(ref baseline_model.py:75-84: --continue_train reloads all three)."""

import jax
import jax.numpy as jnp
import numpy as np

from ihmr_tpu.models import InterHandEncoder, build_mean_params
from ihmr_tpu.train import TrainConfig, create_state
from ihmr_tpu.train import checkpoint as ckpt
from ihmr_tpu.train.loops import _state_info


def test_opt_state_roundtrip(tmp_path):
    encoder = InterHandEncoder(arch="resnet18")
    config = TrainConfig(lr=1e-3)
    mean = build_mean_params(np.zeros(48), np.zeros(10))
    state = create_state(encoder, mean, config, jax.random.PRNGKey(0), input_size=64)

    # perturb the adam state so restoration is observable
    import optax

    from ihmr_tpu.train.baseline import make_optimizer

    tx = make_optimizer(config)
    fake_grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 0.1, state.params)
    updates, new_opt_state = tx.update(fake_grads, state.opt_state, state.params)
    state = state.replace(
        params=optax.apply_updates(state.params, updates), opt_state=new_opt_state
    )

    ckpt.save_info(str(tmp_path), _state_info(state, epoch=7), "latest")
    info = ckpt.load_info(str(tmp_path), "latest")
    assert int(info["epoch"]) == 7

    fresh = create_state(encoder, mean, config, jax.random.PRNGKey(1), input_size=64)
    restored = ckpt.restore_tree_like(fresh.opt_state, info["opt_state"])

    # the restored state must equal the saved one leaf-for-leaf
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(state.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # structure preserved: can keep training with it
    updates2, _ = tx.update(fake_grads, restored, state.params)
    assert jax.tree_util.tree_structure(updates2) == jax.tree_util.tree_structure(
        state.params
    )
