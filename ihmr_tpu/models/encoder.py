"""IHMR network modules (flax.linen).

  * ``InterHandEncoder`` — backbone + feature head + HMR-style iterative
    residual regressor (3 fixed iterations from the mean parameter vector) +
    sigmoid 2-way handedness classifier (ref src/models/networks.py:45-80).
  * ``SubNetwork`` — the per-stage MLP refinement head, 1024+122 -> 512 ->
    256 -> 128 -> group_dim, xavier-uniform gain 0.01 init so stage residuals
    start near zero (ref src/models/networks.py:83-105).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ihmr_tpu.models.resnet import get_backbone

TOTAL_PARAMS_DIM = 122


class InterHandEncoder(nn.Module):
    """Image (B, 224, 224, 3) -> (params (B, 122), hand_type (B, 2))."""

    arch: str = "resnet50"
    total_params_dim: int = TOTAL_PARAMS_DIM
    num_iterations: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        mean_params: jnp.ndarray,
        train: bool = False,
        return_features: bool = False,
    ):
        # mean_params: (122,) or (B, 122) — the HMR mean vector the iterative
        # regressor starts from (ref baseline_model.py:105-130).
        feat = get_backbone(self.arch, dtype=self.dtype, name="main_encoder")(images, train=train)
        # feat_encoder = [relu, fc2(1024 -> 1024), relu] (ref networks.py:52-55)
        feat = nn.relu(nn.Dense(1024, name="fc2")(nn.relu(feat)))

        regressor = nn.Dense(self.total_params_dim, name="regressor_ih")
        pred = jnp.broadcast_to(mean_params, (feat.shape[0], self.total_params_dim))
        for _ in range(self.num_iterations):
            pred = pred + regressor(jnp.concatenate([feat, pred], axis=-1))

        hand_type = nn.sigmoid(nn.Dense(2, name="hand_classifier")(feat))
        if return_features:
            return pred, hand_type, feat
        return pred, hand_type

    def features(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """The 1024-d feature consumed by the MLP cascade (img_feat)."""
        feat = get_backbone(self.arch, dtype=self.dtype, name="main_encoder")(images, train=train)
        return nn.relu(nn.Dense(1024, name="fc2")(nn.relu(feat)))


def _xavier_gain(gain: float):
    init = nn.initializers.xavier_uniform()

    def wrapped(key, shape, dtype):
        return init(key, shape, dtype) * gain

    return wrapped


class SubNetwork(nn.Module):
    """Per-stage refinement MLP: (B, 1024+122) -> (B, update_dim)."""

    update_dim: int
    init_gain: float = 0.01

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        k = _xavier_gain(self.init_gain)
        x = nn.relu(nn.Dense(512, kernel_init=k, name="fc1")(inputs))
        x = nn.relu(nn.Dense(256, kernel_init=k, name="fc2")(x))
        x = nn.relu(nn.Dense(128, kernel_init=k, name="fc3")(x))
        return nn.Dense(self.update_dim, kernel_init=k, name="regressor")(x)


def build_mean_params(mean_pose: jnp.ndarray, mean_betas: jnp.ndarray) -> jnp.ndarray:
    """Assemble the 122-d mean vector (ref baseline_model.py:105-130):
    cam = (5, 0, 0); pose = tiled mean_pose with zeroed global orient;
    shape = tiled mean_betas; trans = 0."""
    mean_pose = jnp.asarray(mean_pose).reshape(48).at[:3].set(0.0)
    mean_betas = jnp.asarray(mean_betas).reshape(10)
    cam = jnp.asarray([5.0, 0.0, 0.0])
    return jnp.concatenate(
        [cam, mean_pose, mean_pose, mean_betas, mean_betas, jnp.zeros(3)]
    ).astype(jnp.float32)
