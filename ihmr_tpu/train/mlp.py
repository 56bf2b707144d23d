"""IHMR-MLP stage-wise training + full-cascade evaluation loops.

Reference flow (ref src/train_mlp.py): (a) a no-grad warm pass caches the
baseline's init predictions + losses for every dataset sample; (b) per stage:
a fresh SubNetwork + Adam, a few epochs of retrieve -> stage-MLP residual ->
loss -> step; (c) an end-of-stage no-grad selection pass runs per-sample
accept/reject and writes the survivors back to the caches (+ cross-rank
sync). Evaluation (ref src/test_mlp.py) runs the full cascade per batch.

TPU design: the per-stage train step is one jitted function (stage static);
caches live on host (ihmr_tpu.refine.MLPCaches); the cascade eval reuses
make_cascade_apply.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ihmr_tpu.data.loader import BatchLoader
from ihmr_tpu.eval import Evaluator
from ihmr_tpu.mano.model import ManoModel
from ihmr_tpu.models.encoder import SubNetwork
from ihmr_tpu.refine import MLP_DEFAULT_LOSS_WEIGHTS, MLPCaches, OptConfig, Stage
from ihmr_tpu.refine import mlp_engine
from ihmr_tpu.refine.mlp_engine import (
    MLPBatch,
    _TRACKED,
    apply_stage_mlp,
    compute_losses,
    make_cascade_apply,
    seed_from_backbone,
    select_better_params,
)
from ihmr_tpu.train import checkpoint as ckpt
from ihmr_tpu.train.stats import LossStat

_MLP_LOSS_NAMES = (
    "total_loss",
    "joints_2d_loss",
    "joints_3d_loss",
    "mano_pose_loss",
    "mano_shape_loss",
    "hand_trans_loss",
    "shape_reg_loss",
    "shape_residual_loss",
    "collision_loss",
)


def _params_from_cache(batch: MLPBatch, cached_params: Dict[str, np.ndarray]):
    return {k: jnp.asarray(v) for k, v in cached_params.items()}


def make_stage_train_step(model: ManoModel, stage: Stage, subnet: SubNetwork, config: OptConfig):
    """Jitted: (subnet_params, opt_state, batch, cached prev params) ->
    (new subnet_params, new opt_state, metrics). LR is injected so the
    per-epoch cosine decay (ref mlp_model.py:854-866) can adjust it."""
    weights = stage.weights
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=stage.lr)

    @jax.jit
    def step(subnet_params, opt_state, batch: MLPBatch, prev_params):
        def loss_fn(sp):
            p = apply_stage_mlp(
                lambda v, x: subnet.apply(v, x), sp, stage, batch.img_feat, prev_params
            )
            # gradient pass: fast in-loop collision (warm/select passes stay
            # exact — see mlp_engine.compute_losses)
            total, aux = compute_losses(model, p, batch, weights, config, in_loop=True)
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(subnet_params)
        updates, opt_state = tx.update(grads, opt_state, subnet_params)
        subnet_params = optax.apply_updates(subnet_params, updates)
        metrics = {
            k: aux[k]
            for k in (
                "joints_2d_loss",
                "joints_3d_loss",
                "mano_pose_loss",
                "mano_shape_loss",
                "hand_trans_loss",
                "shape_reg_loss",
                "shape_residual_loss",
                "collision_loss",
            )
        }
        metrics["total_loss"] = total
        return subnet_params, opt_state, metrics

    return step, tx


def make_stage_select_step(model: ManoModel, stage: Stage, subnet: SubNetwork, config: OptConfig):
    """Jitted end-of-stage pass: apply stage MLP, accept/reject per sample,
    return the params + losses to write back to the caches."""
    weights = dict(MLP_DEFAULT_LOSS_WEIGHTS)

    @jax.jit
    def select(subnet_params, batch: MLPBatch, prev_params, prev_losses):
        p_new = apply_stage_mlp(
            lambda v, x: subnet.apply(v, x), subnet_params, stage, batch.img_feat, prev_params
        )
        _, aux = compute_losses(model, p_new, batch, weights, config)
        cur_losses = {k: aux[k] for k in _TRACKED}
        p_sel, sel_losses = select_better_params(stage, p_new, cur_losses, prev_params, prev_losses)
        return p_sel, sel_losses

    return select


def warm_pass(
    model: ManoModel,
    loader: BatchLoader,
    caches: MLPCaches,
    config: OptConfig,
    to_mlp_batch,
) -> None:
    """Fill caches with the backbone-seeded predictions + losses
    (ref train_mlp.py:60-66)."""
    weights = dict(MLP_DEFAULT_LOSS_WEIGHTS)

    @jax.jit
    def fwd(batch: MLPBatch):
        p = seed_from_backbone(batch)
        _, aux = compute_losses(model, p, batch, weights, config)
        return p, {k: aux[k] for k in _TRACKED}

    for raw in loader:
        batch = to_mlp_batch(raw)
        p, losses = fwd(batch)
        caches.save(np.asarray(batch.index), np.asarray(batch.img_feat), p, losses)


def train_mlp_stages(
    model: ManoModel,
    strategy: Sequence[Stage],
    loader: BatchLoader,
    caches: MLPCaches,
    config: OptConfig,
    to_mlp_batch,
    checkpoints_dir: Optional[str] = None,
    rng_key: Optional[jax.Array] = None,
    is_main: bool = True,
    sync_fn=None,
    lr_total_epoch: int = 100,
    print_freq: int = 10,
    stage_stats: Optional[List[Dict]] = None,
) -> List:
    """Stage-wise training (ref train_mlp.py:68-140). Returns the list of
    trained SubNetwork param pytrees (one per stage).

    ``lr_total_epoch``: the cosine-decay denominator — the reference uses
    the GLOBAL --total_epoch (default 100) even inside 2-5-epoch stages
    (ref mlp_model.py:859-861), making the decay nearly flat; reproduced.

    Telemetry (ref train_mlp.py:101-119 prints LossStat running averages):
    per-epoch running-average loss prints every ``print_freq`` batches, plus
    an end-of-stage line with the per-sample selection ACCEPTANCE fraction
    (how many samples kept the stage's update) and the mean select loss
    before/after — appended to ``stage_stats`` when given."""
    rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    stage_params_list = []

    for stage_id, stage in enumerate(strategy):
        subnet = SubNetwork(update_dim=stage.update_dim)
        rng_key, init_key = jax.random.split(rng_key)
        subnet_params = subnet.init(init_key, jnp.zeros((1, 1024 + 122)))
        step, tx = make_stage_train_step(model, stage, subnet, config)
        opt_state = tx.init(subnet_params)

        loss_stat = LossStat(len(loader), names=_MLP_LOSS_NAMES)
        for epoch in range(1, stage.epoch + 1):
            if stage.lr_decay_type == "cosine":
                lr = 0.5 * (1.0 + np.cos(np.pi * epoch / lr_total_epoch)) * stage.lr
                opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            loader.set_epoch(epoch)
            loss_stat.set_epoch(epoch)
            printed_last = False  # a zero-batch epoch must not NameError below
            for batch_idx, raw in enumerate(loader):
                batch = to_mlp_batch(raw)
                _feat, cached_params, _losses = caches.retrieve(np.asarray(batch.index))
                prev_params = _params_from_cache(batch, cached_params)
                subnet_params, opt_state, metrics = step(
                    subnet_params, opt_state, batch, prev_params
                )
                n = int(batch.index.shape[0])
                loss_stat.update({k: float(v) for k, v in metrics.items()}, n)
                printed_last = (batch_idx + 1) % print_freq == 0
                if is_main and printed_last:
                    print(f"stage:{stage_id:02d} ", end="")
                    loss_stat.print_loss(batch_idx + 1)
            if is_main and not printed_last:
                print(f"stage:{stage_id:02d} ", end="")
                loss_stat.print_loss(len(loader))
        # end-of-stage selection pass writes survivors back into the caches
        select = make_stage_select_step(model, stage, subnet, config)
        accepted = total_n = 0
        sel_before_sum = sel_after_sum = 0.0
        sel_key = mlp_engine._FILTER_KEY[stage.select_loss]  # '*_batch' cache key
        for raw in loader:
            batch = to_mlp_batch(raw)
            feat, cached_params, cached_losses = caches.retrieve(np.asarray(batch.index))
            prev_params = _params_from_cache(batch, cached_params)
            prev_losses = {k: jnp.asarray(v) for k, v in cached_losses.items()}
            p_sel, sel_losses = select(subnet_params, batch, prev_params, prev_losses)
            # a sample "accepted" the stage update iff any of the stage's
            # param groups changed from the cached previous value
            changed = np.zeros(len(np.asarray(batch.index)), bool)
            for k in stage.update_params:
                changed |= np.any(
                    np.asarray(p_sel[k]) != np.asarray(prev_params[k]), axis=-1
                )
            accepted += int(changed.sum())
            total_n += changed.shape[0]
            sel_before_sum += float(np.sum(np.asarray(prev_losses[sel_key])))
            sel_after_sum += float(np.sum(np.asarray(sel_losses[sel_key])))
            caches.save(np.asarray(batch.index), feat, p_sel, sel_losses)
        if sync_fn is not None:
            sync_fn(caches)
        stat = dict(
            stage=stage_id,
            accepted_frac=accepted / max(total_n, 1),
            select_loss=stage.select_loss,
            select_before=sel_before_sum / max(total_n, 1),
            select_after=sel_after_sum / max(total_n, 1),
        )
        if stage_stats is not None:
            stage_stats.append(stat)
        if is_main:
            print(
                f"stage:{stage_id:02d} SELECT accept={stat['accepted_frac']:.3f} "
                f"{stage.select_loss}: {stat['select_before']:.5f} -> "
                f"{stat['select_after']:.5f}",
                flush=True,
            )

        stage_params_list.append(subnet_params)
        if checkpoints_dir and is_main:
            ckpt.save_network(checkpoints_dir, subnet_params, "mlp", "latest", stage_id=stage_id)
    return stage_params_list


def test_mlp_loop(
    model: ManoModel,
    strategy: Sequence[Stage],
    stage_params_list: Sequence,
    loader: BatchLoader,
    dataset,
    config: OptConfig,
    to_mlp_batch,
    left_faces: Optional[np.ndarray] = None,
) -> Evaluator:
    """Full-cascade evaluation (ref src/test_mlp.py:56-98)."""
    strategy = tuple(strategy)
    subnets = [SubNetwork(update_dim=s.update_dim) for s in strategy]

    def subnet_apply(variables, inputs):
        dim = variables["params"]["regressor"]["bias"].shape[0]
        net = next(n for n in subnets if n.update_dim == dim)
        return net.apply(variables, inputs)

    cascade = make_cascade_apply(
        model, strategy, subnet_apply, dict(MLP_DEFAULT_LOSS_WEIGHTS), config
    )
    evaluator = Evaluator(
        dataset.data_list,
        image_root=getattr(dataset, "image_root", ""),
        dataset_name=getattr(dataset, "name", "dataset"),
        right_faces=model.faces,
        left_faces=left_faces if left_faces is not None else model.faces[:, ::-1],
    )
    stage_params = tuple(stage_params_list)
    for raw in loader:
        batch = to_mlp_batch(raw)
        _params, results = cascade(stage_params, batch)
        results = {k: np.asarray(v) for k, v in results.items()}
        idx = np.asarray(batch.index)
        results["do_flip"] = np.zeros(len(idx), np.int32)
        evaluator.update(idx, results)
    return evaluator


test_mlp_loop.__test__ = False  # not a pytest test
