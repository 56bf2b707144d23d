"""End-to-end run loops: the L1 entry-point layer of the reference
(ref src/train_baseline.py, src/test_baseline.py, src/train_mlp.py,
src/test_mlp.py, src/optimize.py) as plain functions over the TPU engines.

Each loop takes explicit config dataclasses instead of an argparse namespace;
the CLI in ihmr_tpu.cli builds those from flags.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ihmr_tpu.data.loader import BatchLoader
from ihmr_tpu.eval import Evaluator
from ihmr_tpu.mano.model import ManoModel
from ihmr_tpu.refine import (
    MLPBatch,
    OptBatch,
    OptConfig,
    Stage,
    optimize_batch,
    params_from_init,
)
from ihmr_tpu.train import checkpoint as ckpt
from ihmr_tpu.train.baseline import (
    BaselineBatch,
    BaselineState,
    TrainConfig,
    eval_step,
    learning_rate_for_epoch,
    set_learning_rate,
    train_step,
)
from ihmr_tpu.train.stats import LossStat, OptTimeStat, TimeStat


def _to_baseline_batch(batch: Dict[str, np.ndarray]) -> BaselineBatch:
    return BaselineBatch(
        img=jnp.asarray(batch["img"]),
        hand_type_array=jnp.asarray(batch["hand_type_array"]),
        hand_type_valid=jnp.asarray(batch["hand_type_valid"]),
        joints_2d=jnp.asarray(batch["joints_2d"]),
        joints_3d=jnp.asarray(batch["joints_3d"]),
        gt_pose_params=jnp.asarray(batch["mano_pose"]),
        gt_shape_params=jnp.asarray(batch["mano_betas"]),
        mano_params_weight=jnp.asarray(batch["mano_params_weight"]),
        hand_trans=jnp.asarray(batch["hand_trans"]),
        do_flip=jnp.asarray(batch["do_flip"]),
    )


def _to_opt_batch(batch: Dict[str, np.ndarray]) -> Tuple[dict, OptBatch]:
    params = params_from_init(
        jnp.asarray(batch["init_cam"]),
        jnp.asarray(batch["init_pose_params"]),
        jnp.asarray(batch["init_shape_params"]),
        jnp.asarray(batch["init_hand_trans"]),
    )
    opt_batch = OptBatch(
        hand_type_array=jnp.asarray(batch["hand_type_array"]),
        hand_type_valid=jnp.asarray(batch["hand_type_valid"]),
        joints_2d=jnp.asarray(batch["joints_2d"]),
        joints_3d=jnp.asarray(batch["joints_3d"]),
        gt_pose_params=jnp.asarray(batch["mano_pose"]),
        gt_shape_params=jnp.asarray(batch["mano_betas"]),
        mano_params_weight=jnp.asarray(batch["mano_params_weight"]),
        hand_trans=jnp.asarray(batch["hand_trans"]),
        init_joints_2d=jnp.asarray(batch["init_joints_2d"]),
        init_joints_3d=jnp.asarray(batch["init_joints_3d"]),
        init_hand_trans_j=jnp.asarray(batch["init_hand_trans_j"]),
    )
    return params, opt_batch


def _to_mlp_batch(batch: Dict[str, np.ndarray]) -> MLPBatch:
    return MLPBatch(
        hand_type_array=jnp.asarray(batch["hand_type_array"]),
        hand_type_valid=jnp.asarray(batch["hand_type_valid"]),
        joints_2d=jnp.asarray(batch["joints_2d"]),
        joints_3d=jnp.asarray(batch["joints_3d"]),
        gt_pose_params=jnp.asarray(batch["mano_pose"]),
        gt_shape_params=jnp.asarray(batch["mano_betas"]),
        mano_params_weight=jnp.asarray(batch["mano_params_weight"]),
        hand_trans=jnp.asarray(batch["hand_trans"]),
        img_feat=jnp.asarray(batch["img_feat"]),
        init_joints_2d=jnp.asarray(batch["init_joints_2d"]),
        init_joints_3d=jnp.asarray(batch["init_joints_3d"]),
        init_cam=jnp.asarray(batch["init_cam"]),
        init_pose_params=jnp.asarray(batch["init_pose_params"]),
        init_shape_params=jnp.asarray(batch["init_shape_params"]),
        init_hand_trans=jnp.asarray(batch["init_hand_trans"]).reshape(
            batch["init_hand_trans"].shape[0], -1
        )[:, :3],
        index=jnp.asarray(batch["index"]),
    )


# ---------------------------------------------------------------------------
def train_baseline_loop(
    encoder,
    state: BaselineState,
    loader: BatchLoader,
    mano_right: ManoModel,
    mano_left: ManoModel,
    config: TrainConfig,
    checkpoints_dir: str,
    start_epoch: int = 1,
    print_freq: int = 2048,
    save_epoch_freq: int = 5,
    is_main: bool = True,
    visualizer=None,
    display_freq: int = 0,
) -> BaselineState:
    """Epoch loop of ref src/train_baseline.py:60-111.

    When ``visualizer`` (ihmr_tpu.utils.visualizer.Visualizer) and
    ``display_freq`` are set, rank 0 renders the 4-panel training visuals
    every display_freq samples (ref train_baseline.py:92-98)."""
    loss_stat = LossStat(len(loader))
    time_stat = TimeStat(config.total_epoch)
    for epoch in range(start_epoch, config.total_epoch + 1):
        loader.set_epoch(epoch)
        loss_stat.set_epoch(epoch)
        time_stat.epoch_init(epoch)
        printed = 0
        displayed = 0
        for i, raw in enumerate(loader):
            bb = _to_baseline_batch(raw)
            time_stat.stat_data_time()
            state, metrics = train_step(encoder, state, bb, mano_right, mano_left, config)
            time_stat.stat_forward_time()
            if is_main:
                loss_stat.update({k: float(v) for k, v in metrics.items()}, n=bb.img.shape[0])
                printed += bb.img.shape[0]
                if printed >= print_freq:
                    loss_stat.print_loss(i)
                    printed = 0
                if visualizer is not None and display_freq > 0:
                    displayed += bb.img.shape[0]
                    if displayed >= display_freq:
                        displayed = 0
                        from ihmr_tpu.utils.train_visuals import visuals_from_eval_outputs

                        _m, outputs = eval_step(
                            encoder, state, bb, mano_right, mano_left, config
                        )
                        visuals = visuals_from_eval_outputs(
                            bb,
                            {k: np.asarray(v) for k, v in outputs.items() if v is not None},
                            mano_right.faces,
                            mano_left.faces,
                            input_size=bb.img.shape[1],
                        )
                        visualizer.display_current_results(visuals, epoch, i)
                        visualizer.plot_current_errors(
                            epoch + i / max(len(loader), 1),
                            {k: float(v) for k, v in metrics.items()},
                        )
            time_stat.stat_visualize_time()
        if is_main:
            time_stat.print_stat()
            if epoch % save_epoch_freq == 0:
                ckpt.save_network(checkpoints_dir, state.params, "baseline", str(epoch))
                ckpt.save_info(checkpoints_dir, _state_info(state, epoch), str(epoch))
            ckpt.save_network(checkpoints_dir, state.params, "baseline", "latest")
            ckpt.save_network(checkpoints_dir, state.batch_stats, "baseline_stats", "latest")
            ckpt.save_info(checkpoints_dir, _state_info(state, epoch), "latest")
        lr = learning_rate_for_epoch(config, epoch)
        state = set_learning_rate(state, lr)
        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        if is_main:
            print(f"Current Learning Rate:{lr:.2E}", flush=True)
    return state


def _state_info(state: BaselineState, epoch: int) -> Dict:
    return {"epoch": np.asarray(epoch), "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state)}


def test_baseline_loop(
    encoder,
    state: BaselineState,
    loader: BatchLoader,
    dataset,
    mano_right: ManoModel,
    mano_left: ManoModel,
    config: TrainConfig,
) -> Evaluator:
    """Eval loop of ref src/test_baseline.py:52-93."""
    evaluator = Evaluator(
        dataset.data_list,
        image_root=getattr(dataset, "image_root", ""),
        dataset_name=getattr(dataset, "name", "dataset"),
        right_faces=mano_right.faces,
        left_faces=mano_left.faces,
    )
    for raw in loader:
        bb = _to_baseline_batch(raw)
        _metrics, outputs = eval_step(encoder, state, bb, mano_right, mano_left, config)
        outputs = {
            k: (np.asarray(v) if v is not None else None) for k, v in outputs.items()
        }
        outputs["do_flip"] = np.asarray(raw["do_flip"])
        evaluator.update(np.asarray(raw["index"]), outputs)
    return evaluator


test_baseline_loop.__test__ = False  # not a pytest test


def optimize_loop(
    mano_right: ManoModel,
    loader: BatchLoader,
    dataset,
    strategy: Sequence[Stage],
    config: OptConfig,
    left_faces: Optional[np.ndarray] = None,
    is_main: bool = True,
    obj_dump_dir: Optional[str] = None,
) -> Evaluator:
    """The IHMR-OPT runner (ref src/optimize.py:52-102).

    ``obj_dump_dir``: when set, the first sample of each batch is dumped as a
    two-hand .obj after refinement (ref src/utils/opt_utils.py:45-54)."""
    evaluator = Evaluator(
        dataset.data_list,
        image_root=getattr(dataset, "image_root", ""),
        dataset_name=getattr(dataset, "name", "dataset"),
        right_faces=mano_right.faces,
        left_faces=left_faces if left_faces is not None else mano_right.faces[:, ::-1],
    )
    num_iter = len(loader)
    strategy = tuple(strategy)
    time_stat = OptTimeStat(num_iter, samples_per_iter=loader.batch_size)
    for raw in loader:
        time_stat.opt_iter_start()
        params, opt_batch = _to_opt_batch(raw)
        out_params, results = optimize_batch(mano_right, params, opt_batch, strategy, config)
        results = {k: np.asarray(v) for k, v in results.items()}
        results["do_flip"] = np.zeros(len(raw["index"]), np.int32)
        evaluator.update(np.asarray(raw["index"]), results)
        if obj_dump_dir is not None and is_main:
            from ihmr_tpu.utils import io_utils

            rv0 = results["pred_right_hand_verts"][0]
            lv0 = results["pred_left_hand_verts"][0]
            faces_r = np.asarray(mano_right.faces)
            faces_l = np.asarray(evaluator.left_faces)
            verts = np.concatenate([rv0, lv0], axis=0)
            faces = np.concatenate([faces_r, faces_l + rv0.shape[0]], axis=0)
            io_utils.save_mesh_to_obj(
                io_utils.osp.join(obj_dump_dir, f"iter_{time_stat.iter_count:04d}.obj"),
                verts,
                faces,
            )
        time_stat.opt_iter_end()
        if is_main:
            time_stat.print_stat()
    if is_main:
        time_stat.print_stat(opt_complete=True)
    return evaluator


def print_metrics(evaluator: Evaluator, tag: str):
    for metric, value in evaluator.metric_dict().items():
        print(f"{metric} : {value:.3f} ({tag})", flush=True)
