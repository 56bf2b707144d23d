"""The IHMR loss library as pure JAX functions.

Ports every loss in the reference's ``LossUtil`` (ref src/models/loss_utils.py)
with identical reduction semantics, but stateless: each function maps batch
tensors to (scalar_mean_loss, per_sample_loss (B,)) where the reference exposes
a per-sample variant (those drive OPT/MLP snapshot filtering), or just the
scalar otherwise.

Losses:
  hand_type_loss       BCE on the 2-way handedness logits      (ref :41-44)
  mano_pose_loss       L2 on rodrigues matrices, optional global-orient drop
                                                               (ref :47-71)
  mano_shape_loss      weighted L1 on betas                    (ref :74-79)
  joints_2d_loss       weighted L1, + per-sample vector        (ref :82-87)
  joints_3d_loss       root-aligned weighted L2, + per-sample  (ref :90-111)
  hand_trans_loss      weighted L2                             (ref :114-118)
  shape_reg_loss       L2(beta_R - beta_L) symmetry prior      (ref :121-128)
  shape_residual_loss  L1 to the initial betas                 (ref :131-135)
  finger_reg_loss      finger planarity/curl prior on 4-joint chains via
                       triple products                         (ref :138-171)
Collision lives in ihmr_tpu.ops.collision (the reference's CUDA SDF call).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ihmr_tpu.core.rotations import axis_angle_to_matrix

_EPS = 1e-7

# 4-joint chains (proximal -> tip) per finger in the 21-joint convention
# [16 MANO joints + 5 fingertip verts]; ref loss_utils.py:139-147.
_FINGER_CHAINS = np.array(
    [
        [1, 2, 3, 17],  # index
        [4, 5, 6, 18],  # middle
        [7, 8, 9, 20],  # little
        [10, 11, 12, 19],  # ring
        [13, 14, 15, 16],  # thumb
    ]
)
FINGER_JOINT_IDXS = np.concatenate([_FINGER_CHAINS.reshape(-1), _FINGER_CHAINS.reshape(-1) + 21])


def hand_type_loss(
    gt_hand_type: jnp.ndarray,  # (B, 2) in {0,1}
    pred_hand_type: jnp.ndarray,  # (B, 2) sigmoid probabilities
    hand_type_valid: jnp.ndarray,  # (B, 1)
) -> jnp.ndarray:
    p = jnp.clip(pred_hand_type, _EPS, 1.0 - _EPS)
    bce = -(gt_hand_type * jnp.log(p) + (1.0 - gt_hand_type) * jnp.log(1.0 - p))
    return jnp.mean(bce * hand_type_valid)


def mano_pose_loss(
    gt_pose: jnp.ndarray,  # (B, 48) or (B, 45) axis-angle
    pred_pose: jnp.ndarray,
    weight: jnp.ndarray,  # (B, 1)
    use_hand_rotation: bool = False,
) -> jnp.ndarray:
    B, dim = gt_pose.shape
    assert dim in (45, 48), dim
    gt_m = axis_angle_to_matrix(gt_pose.reshape(B, dim // 3, 3))
    pred_m = axis_angle_to_matrix(pred_pose.reshape(B, dim // 3, 3))
    if not use_hand_rotation and dim == 48:  # drop global orient
        gt_m, pred_m = gt_m[:, 1:], pred_m[:, 1:]
    diff = (gt_m - pred_m).reshape(B, -1)
    return jnp.mean(diff * diff * weight)


def mano_shape_loss(gt_shape: jnp.ndarray, pred_shape: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(gt_shape - pred_shape) * weight)


def joints_2d_loss(
    gt_joints: jnp.ndarray,  # (B, J, 2)
    pred_joints: jnp.ndarray,  # (B, J, 2)
    weight: jnp.ndarray,  # (B, J, 1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    w = jnp.abs(gt_joints - pred_joints) * weight
    B = w.shape[0]
    per_sample = jnp.mean(w.reshape(B, -1), axis=1)
    return jnp.mean(w), per_sample


def _align_by_root(joints: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Subtract right wrist when valid, else left wrist (ref :90-98).

    Samples whose right-wrist validity is between 1e-7 and 0.5 are (exactly as
    in the reference) left unaligned.
    """
    w0 = weight[:, 0, 0]
    has_right = (w0 > 0.5)[:, None, None]
    no_right = (w0 < _EPS)[:, None, None]
    root = jnp.where(has_right, joints[:, 0:1], jnp.where(no_right, joints[:, 21:22], 0.0))
    return joints - root


def joints_3d_loss(
    gt_joints: jnp.ndarray,  # (B, 42, 3)
    pred_joints: jnp.ndarray,  # (B, 42, 3)
    weight: jnp.ndarray,  # (B, 42, 1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gt = _align_by_root(gt_joints, weight)
    pred = _align_by_root(pred_joints, weight)
    sq = (gt - pred) ** 2 * weight
    B = sq.shape[0]
    per_sample = jnp.mean(sq.reshape(B, -1), axis=1)
    return jnp.mean(sq), per_sample


def hand_trans_loss(
    gt_trans: jnp.ndarray,  # (B, 3) or (B, 1, 3)
    pred_trans: jnp.ndarray,
    weight: jnp.ndarray,  # (B, 1) or (B, 1, 1)
) -> jnp.ndarray:
    gt = gt_trans.reshape(gt_trans.shape[0], -1)
    pred = pred_trans.reshape(pred_trans.shape[0], -1)
    w = weight.reshape(weight.shape[0], -1)
    return jnp.mean((gt - pred) ** 2 * w)


def shape_reg_loss(shape_params: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetry prior: L2 between right (first 10) and left (last 10) betas."""
    diff = shape_params[:, :10] - shape_params[:, 10:]
    sq = diff * diff
    return jnp.mean(sq), jnp.mean(sq, axis=1)


def shape_residual_loss(pred_shape: jnp.ndarray, init_shape: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred_shape - init_shape))


def finger_reg_loss(joints_3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Planarity/curl prior on each finger's 4-joint chain (ref :138-171).

    For bone vectors f0, f1, f2 of a chain:
      C1 = f2 . (f0 x f1)   (non-planarity volume)
      C2 = (f0 x f1) . (f1 x f2)  (consistent curl direction)
      loss = |C1| - min(0, C2), summed over the 10 fingers.
    """
    B = joints_3d.shape[0]
    chains = joints_3d[:, FINGER_JOINT_IDXS, :].reshape(B, 10, 4, 3)
    bones = chains[:, :, :3, :] - chains[:, :, 1:, :]  # (B, 10, 3, 3)
    f0, f1, f2 = bones[:, :, 0], bones[:, :, 1], bones[:, :, 2]
    c01 = jnp.cross(f0, f1)
    c12 = jnp.cross(f1, f2)
    C1 = jnp.sum(f2 * c01, axis=-1)
    C2 = jnp.sum(c01 * c12, axis=-1)
    loss = jnp.abs(C1) - jnp.minimum(0.0, C2)  # (B, 10)
    per_sample = jnp.sum(loss, axis=1)
    return jnp.mean(per_sample), per_sample
