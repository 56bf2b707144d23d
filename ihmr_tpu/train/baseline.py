"""IHMR-Baseline: encoder forward, loss, and the jitted DP train step.

Reference: src/models/baseline_model.py — encoder forward splits the 122-d
vector, decodes pred AND gt through MANO (``forward`` :257-282), and
``backward_E`` (:285-341) sums 7 weighted losses (handedness BCE, 2D L1,
root-aligned 3D L2, rodrigues pose L2, shape L1, trans L2, shape symmetry,
optional collision).

TPU design: one pure jitted train step (value_and_grad over the whole loss,
Adam via optax, BatchNorm stats threaded as a mutable collection). Run it
under a 1-D data mesh with the batch sharded and params replicated and XLA
emits the gradient psum over ICI — the DDP equivalent with no wrapper class.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ihmr_tpu.core.projection import orthographic_project
from ihmr_tpu.losses import losses as L
from ihmr_tpu.mano.layer import HandParams, two_hand_decode
from ihmr_tpu.mano.model import ManoModel
from ihmr_tpu.models.encoder import InterHandEncoder
from ihmr_tpu.ops.collision import collision_loss


@flax.struct.dataclass
class TrainConfig:
    lr: float = flax.struct.field(pytree_node=False, default=1e-4)
    lr_decay_type: str = flax.struct.field(pytree_node=False, default="cosine")
    total_epoch: int = flax.struct.field(pytree_node=False, default=20)
    joints_2d_loss_weight: float = flax.struct.field(pytree_node=False, default=10.0)
    joints_3d_loss_weight: float = flax.struct.field(pytree_node=False, default=10.0)
    pose_param_weight: float = flax.struct.field(pytree_node=False, default=10.0)
    shape_param_weight: float = flax.struct.field(pytree_node=False, default=10.0)
    trans_loss_weight: float = flax.struct.field(pytree_node=False, default=10.0)
    shape_reg_loss_weight: float = flax.struct.field(pytree_node=False, default=0.1)
    collision_loss_weight: float = flax.struct.field(pytree_node=False, default=1.0)
    use_collision_loss: bool = flax.struct.field(pytree_node=False, default=False)
    use_hand_rotation: bool = flax.struct.field(pytree_node=False, default=False)
    sdf_robustifier: Optional[float] = flax.struct.field(pytree_node=False, default=None)
    num_candidates: int = flax.struct.field(pytree_node=False, default=8)


@flax.struct.dataclass
class BaselineBatch:
    """One training batch (ref baseline_model.py:156-205 set_input)."""

    img: jnp.ndarray  # (B, H, W, 3) normalized to [-1, 1]
    hand_type_array: jnp.ndarray  # (B, 2)
    hand_type_valid: jnp.ndarray  # (B, 1)
    joints_2d: jnp.ndarray  # (B, 42, 3)
    joints_3d: jnp.ndarray  # (B, 42, 4)
    gt_pose_params: jnp.ndarray  # (B, 96)
    gt_shape_params: jnp.ndarray  # (B, 20)
    mano_params_weight: jnp.ndarray  # (B, 2)
    hand_trans: jnp.ndarray  # (B, 1, 4)
    do_flip: jnp.ndarray  # (B,)


@flax.struct.dataclass
class BaselineState:
    params: Any
    batch_stats: Any
    opt_state: Any
    mean_params: jnp.ndarray  # (122,)
    epoch: jnp.ndarray  # scalar int


def create_state(
    encoder: InterHandEncoder,
    mean_params: jnp.ndarray,
    config: TrainConfig,
    rng: jax.Array,
    input_size: int = 224,
) -> BaselineState:
    variables = encoder.init(rng, jnp.zeros((1, input_size, input_size, 3)), mean_params)
    tx = make_optimizer(config)
    return BaselineState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        mean_params=mean_params,
        epoch=jnp.asarray(0, jnp.int32),
    )


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    # Per-tensor Adam. optax.flatten (ravel everything into one vector so
    # the update is a few full-width ops) was tried TWICE against the
    # measured ~3700-small-op per-step tail (docs/ROUND3.md) and is a
    # confirmed MEASURED NEGATIVE on this chip: round 3 recorded no win,
    # and the round-4 re-attempt made it strictly worse — fp32
    # collision-off train_step 53.2 -> 74.3 ms/step (1204 -> 861 imgs/sec)
    # with a 27-minute first-window compile (docs/ROUND4.md). The
    # ravel/unravel of ~25M params inside the step costs more than the
    # small-op tail it removes; XLA's scheduler already overlaps the tiny
    # per-tensor updates with the conv backward.
    return optax.inject_hyperparams(optax.adam)(learning_rate=config.lr)


def learning_rate_for_epoch(config: TrainConfig, epoch: int) -> float:
    """LR schedules of the reference (ref baseline_model.py:501-518)."""
    import numpy as np

    if config.lr_decay_type == "cosine":
        return 0.5 * (1.0 + np.cos(np.pi * epoch / config.total_epoch)) * config.lr
    if config.lr_decay_type == "stage":
        assert config.total_epoch == 20, "stage decay expects 20 epochs"
        lr = config.lr
        for boundary in (15, 17):
            if epoch >= boundary:
                lr /= 10.0
        return lr
    assert config.lr_decay_type == "none"
    return config.lr


def set_learning_rate(state: BaselineState, lr: float) -> BaselineState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def forward_and_loss(
    encoder: InterHandEncoder,
    params,
    batch_stats,
    mean_params: jnp.ndarray,
    batch: BaselineBatch,
    mano_right: ManoModel,
    mano_left: ManoModel,
    config: TrainConfig,
    train: bool = True,
):
    """Returns (total loss, (metrics dict, new batch_stats, outputs))."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (pred_params, pred_hand_type), mutated = encoder.apply(
            variables, batch.img, mean_params, train=True, mutable=["batch_stats"]
        )
        new_stats = mutated["batch_stats"]
        img_feat = None
    else:
        # eval also surfaces the 1024-d feature (the img_feat the MLP/OPT
        # prediction pkls carry; ref data_utils.py:64-66)
        pred_params, pred_hand_type, img_feat = encoder.apply(
            variables, batch.img, mean_params, return_features=True
        )
        new_stats = batch_stats

    hp = HandParams.from_flat(pred_params)
    pred_rv, pred_lv, pred_j3 = two_hand_decode(
        mano_right, mano_left, hp.pose_params, hp.shape_params, hp.trans
    )
    pred_j2 = orthographic_project(pred_j3, hp.cam)

    gt_rv, gt_lv, gt_j3_mano = two_hand_decode(
        mano_right,
        mano_left,
        batch.gt_pose_params,
        batch.gt_shape_params,
        batch.hand_trans[:, 0, :3],
    )

    m: Dict[str, jnp.ndarray] = {}
    m["hand_type_loss"] = L.hand_type_loss(
        batch.hand_type_array, pred_hand_type, batch.hand_type_valid
    )
    total = m["hand_type_loss"]

    j2d, _ = L.joints_2d_loss(batch.joints_2d[:, :, :2], pred_j2, batch.joints_2d[:, :, 2:3])
    m["joints_2d_loss"] = j2d * config.joints_2d_loss_weight
    total = total + m["joints_2d_loss"]

    j3d, _ = L.joints_3d_loss(batch.joints_3d[:, :, :3], pred_j3, batch.joints_3d[:, :, 3:4])
    m["joints_3d_loss"] = j3d * config.joints_3d_loss_weight
    total = total + m["joints_3d_loss"]

    pose_r = L.mano_pose_loss(
        batch.gt_pose_params[:, :48],
        hp.pose_params[:, :48],
        batch.mano_params_weight[:, 0:1],
        config.use_hand_rotation,
    )
    pose_l = L.mano_pose_loss(
        batch.gt_pose_params[:, 48:],
        hp.pose_params[:, 48:],
        batch.mano_params_weight[:, 1:2],
        config.use_hand_rotation,
    )
    m["mano_pose_loss"] = (pose_r + pose_l) * config.pose_param_weight
    total = total + m["mano_pose_loss"]

    shape_r = L.mano_shape_loss(
        batch.gt_shape_params[:, :10], hp.shape_params[:, :10], batch.mano_params_weight[:, 0:1]
    )
    shape_l = L.mano_shape_loss(
        batch.gt_shape_params[:, 10:], hp.shape_params[:, 10:], batch.mano_params_weight[:, 1:2]
    )
    m["mano_shape_loss"] = (shape_r + shape_l) * config.shape_param_weight
    total = total + m["mano_shape_loss"]

    trans = L.hand_trans_loss(batch.hand_trans[:, :, :3], hp.trans, batch.hand_trans[:, :, 3:4])
    m["hand_trans_loss"] = trans * config.trans_loss_weight
    total = total + m["hand_trans_loss"]

    reg, _ = L.shape_reg_loss(hp.shape_params)
    m["shape_reg_loss"] = reg * config.shape_reg_loss_weight
    total = total + m["shape_reg_loss"]

    coll_origin = None
    if config.use_collision_loss or not train:
        coll, _, coll_origin = collision_loss(
            pred_rv,
            pred_lv,
            mano_right.faces,
            mano_left.faces,
            batch.hand_type_array,
            robustifier=config.sdf_robustifier if train else None,
            num_candidates=config.num_candidates,
            # eval passes feed the Evaluator's collision_ave/max: apply the
            # round-5 parity filter there (metric honesty); the training
            # gradient keeps the reference's local-sign profile
            parity_filter=not train,
        )
        m["collision_loss"] = coll * config.collision_loss_weight
        if config.use_collision_loss:
            total = total + m["collision_loss"]
    else:
        m["collision_loss"] = jnp.asarray(0.0)

    m["total_loss"] = total
    outputs = {
        "pred_params": pred_params,
        "pred_hand_type": pred_hand_type,
        "pred_cam_params": hp.cam,
        "pred_pose_params": hp.pose_params,
        "pred_shape_params": hp.shape_params,
        "pred_hand_trans": hp.trans,
        "pred_right_hand_verts": pred_rv,
        "pred_left_hand_verts": pred_lv,
        "gt_right_hand_verts": gt_rv,
        "gt_left_hand_verts": gt_lv,
        "pred_joints_3d": pred_j3,
        "pred_joints_2d": pred_j2,
        "gt_joints_3d": batch.joints_3d,
        "collision_loss_origin_scale": coll_origin,
        "img_feat": None if train else img_feat,
    }
    return total, (m, new_stats, outputs)


@partial(jax.jit, static_argnames=("encoder", "config"), donate_argnums=(1,))
def train_step(
    encoder: InterHandEncoder,
    state: BaselineState,
    batch: BaselineBatch,
    mano_right: ManoModel,
    mano_left: ManoModel,
    config: TrainConfig,
) -> Tuple[BaselineState, Dict[str, jnp.ndarray]]:
    def loss_fn(params):
        return forward_and_loss(
            encoder,
            params,
            state.batch_stats,
            state.mean_params,
            batch,
            mano_right,
            mano_left,
            config,
            train=True,
        )

    (loss, (metrics, new_stats, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    tx = make_optimizer(config)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=new_params, batch_stats=new_stats, opt_state=new_opt_state
    )
    return new_state, metrics


@partial(jax.jit, static_argnames=("encoder", "config"))
def eval_step(
    encoder: InterHandEncoder,
    state: BaselineState,
    batch: BaselineBatch,
    mano_right: ManoModel,
    mano_left: ManoModel,
    config: TrainConfig,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """no-grad forward + origin-scale collision for metrics
    (ref baseline_model.py:350-355 ``test``)."""
    _, (metrics, _, outputs) = forward_and_loss(
        encoder,
        state.params,
        state.batch_stats,
        state.mean_params,
        batch,
        mano_right,
        mano_left,
        config,
        train=False,
    )
    return metrics, outputs
