"""Command-line entry points.

Replaces the reference's bash/*.sh + argparse options stack (ref src/options/
and bash/) with one CLI:

    python -m ihmr_tpu.cli train-baseline --data_root ... --anno_path ...
    python -m ihmr_tpu.cli test-baseline  --ckpt ... --test_epoch latest
    python -m ihmr_tpu.cli optimize       --strategy opt_default ...
    python -m ihmr_tpu.cli train-mlp / test-mlp
    python -m ihmr_tpu.cli visualize      --results evaluate_results/...pkl

Multi-process DP: launch one process per host with JAX_PROCESS_* env (or
jax.distributed.initialize args); each process consumes its rank's shard of
the dataset exactly like the reference's DistributedSampler.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import os.path as osp
import sys

import numpy as np


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--data_root", default="")
    p.add_argument("--model_root", default="", help="MANO pkl + mean params dir")
    p.add_argument("--param_root", default="")
    p.add_argument("--anno_path", default="", help="annotation pkl path (relative to data_root)")
    p.add_argument("--pred_path", default="", help="prediction pkl path (relative to data_root)")
    p.add_argument("--batchSize", type=int, default=64)
    p.add_argument("--inputSize", type=int, default=224)
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--strategy", default="opt_default")
    p.add_argument("--main_encoder", default="resnet50")
    p.add_argument("--bf16", action="store_true",
                   help="backbone convs/fc compute in bfloat16 on the MXU "
                        "(fp32 params, fp32 BatchNorm, fp32 losses/heads) — "
                        "~2x baseline training throughput; see BASELINE.md")
    p.add_argument("--synthetic_mano", action="store_true", help="use synthetic MANO assets (no licensed files)")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)


def _load_mano(args):
    import jax.numpy as jnp

    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.mano.loader import load_mano_pair, mirror_mano_model

    if args.synthetic_mano or not args.model_root:
        right = synthetic_mano_model()
        return right, mirror_mano_model(right), None, None
    pair = load_mano_pair(args.model_root)
    (right, right_mean), (left, left_mean) = pair["right"], pair["left"]
    return right, left, jnp.asarray(right_mean), jnp.asarray(left_mean)


def _dtype(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32


def _mean_params(args):
    import numpy as np

    from ihmr_tpu.models import build_mean_params
    from ihmr_tpu.utils import io_utils

    mean_file = osp.join(args.model_root, "mean_mano_params.pkl") if args.model_root else ""
    if mean_file and osp.exists(mean_file):
        vals = io_utils.load_pkl(mean_file)
        return build_mean_params(np.asarray(vals["mean_pose"]), np.asarray(vals["mean_betas"]))
    return build_mean_params(np.zeros(48, np.float32), np.zeros(10, np.float32))


def cmd_train_baseline(args):
    import jax

    from ihmr_tpu.data import BaselineDataset, BatchLoader, DataConfig
    from ihmr_tpu.models import InterHandEncoder
    from ihmr_tpu.train import TrainConfig, create_state
    from ihmr_tpu.train import checkpoint as ckpt
    from ihmr_tpu.train.loops import train_baseline_loop

    import dataclasses as _dc

    from ihmr_tpu.data import ComposeDataset

    cfg = DataConfig(
        data_root=args.data_root,
        param_root=args.param_root,
        anno_path=args.anno_path,
        batch_size=args.batchSize,
        world_size=args.world_size,
        input_size=args.inputSize,
        is_train=True,
        use_random_flip=args.use_random_flip,
        use_random_rescale=args.use_random_rescale,
        use_random_position=args.use_random_position,
        use_random_rotation=args.use_random_rotation,
        use_color_jittering=args.use_color_jittering,
        use_motion_blur=args.use_motion_blur,
        blur_kernel_dir=args.blur_kernel_dir,
    )
    # comma list of annotation pkls -> composed multi-dataset training
    # (ref compose_dataset.py:42-48 --train_datasets)
    anno_paths = [p for p in args.anno_path.split(",") if p]
    if len(anno_paths) > 1:
        members = []
        for ap in anno_paths:
            ds = BaselineDataset(_dc.replace(cfg, anno_path=ap))
            ds.load_data()
            members.append(ds)
        dataset = ComposeDataset(members)
    else:
        dataset = BaselineDataset(cfg)
        dataset.load_data()
    loader = BatchLoader(
        dataset, args.batchSize, rank=args.rank, world_size=args.world_size,
        shuffle=True, drop_last=True,
    )
    mano_right, mano_left, _, _ = _load_mano(args)
    train_config = TrainConfig(
        lr=args.lr,
        lr_decay_type=args.lr_decay_type,
        total_epoch=args.total_epoch,
        use_collision_loss=args.use_collision_loss,
        use_hand_rotation=args.use_hand_rotation,
        sdf_robustifier=args.sdf_robustifier,
    )
    encoder = InterHandEncoder(arch=args.main_encoder, dtype=_dtype(args))
    state = create_state(
        encoder, _mean_params(args), train_config, jax.random.PRNGKey(0), args.inputSize
    )
    start_epoch = 1
    if args.continue_train:
        params = ckpt.load_network(args.checkpoints_dir, "baseline", "latest")
        stats = ckpt.load_network(args.checkpoints_dir, "baseline_stats", "latest")
        info = ckpt.load_info(args.checkpoints_dir, "latest")
        if params is not None:
            state = state.replace(params=params)
        if stats is not None:
            state = state.replace(batch_stats=stats)
        if info is not None:
            # restore optimizer state too (ref baseline_model.py:75-84)
            if "opt_state" in info:
                state = state.replace(
                    opt_state=ckpt.restore_tree_like(state.opt_state, info["opt_state"])
                )
            start_epoch = int(info["epoch"]) + 1
            print(f"resume from epoch {start_epoch}")
    elif args.pretrain_weights:
        imported, stats = ckpt.import_torch_resnet(
            args.pretrain_weights,
            state.params["main_encoder"],
            state.batch_stats.get("main_encoder", {}),
        )
        state.params["main_encoder"] = imported
        if stats:
            state.batch_stats["main_encoder"] = stats
        print(f"Loaded pretrained backbone from {args.pretrain_weights}")
    visualizer = None
    if args.rank <= 0 and (args.display_freq > 0 or args.live_port >= 0):
        from ihmr_tpu.utils.visualizer import Visualizer

        visualizer = Visualizer(args.checkpoints_dir, live_port=args.live_port)
    train_baseline_loop(
        encoder, state, loader, mano_right, mano_left, train_config,
        args.checkpoints_dir, start_epoch=start_epoch,
        print_freq=args.print_freq, save_epoch_freq=args.save_epoch_freq,
        is_main=args.rank <= 0,
        visualizer=visualizer, display_freq=args.display_freq,
    )


def cmd_serve(args):
    """Batched inference serving (ihmr_tpu.serve): micro-batching broker +
    HTTP front end over the jitted IHMR-Baseline pipeline. A new capability
    of the TPU rebuild (the reference has no serving layer)."""
    import jax

    from ihmr_tpu.models import InterHandEncoder
    from ihmr_tpu.serve import InferenceServer, MicroBatcher, build_encoder_predict_fn
    from ihmr_tpu.train import TrainConfig, create_state
    from ihmr_tpu.train import checkpoint as ckpt

    mano_right, _, _, _ = _load_mano(args)
    encoder = InterHandEncoder(arch=args.main_encoder, dtype=_dtype(args))
    state = create_state(
        encoder, _mean_params(args), TrainConfig(), jax.random.PRNGKey(0), args.inputSize
    )
    params = ckpt.load_network(args.checkpoints_dir, "baseline", args.test_epoch)
    if params is not None:
        state = state.replace(params=params)
        stats = ckpt.load_network(args.checkpoints_dir, "baseline_stats", args.test_epoch)
        if stats is not None:
            state = state.replace(batch_stats=stats)
        print(f"serving checkpoint '{args.test_epoch}' from {args.checkpoints_dir}")
    else:
        print("WARNING: no checkpoint found — serving a randomly-initialized encoder")

    predict = build_encoder_predict_fn(
        encoder,
        {"params": state.params, "batch_stats": state.batch_stats},
        _mean_params(args),
        mano_right,
        args.inputSize,
    )
    # warm up: compile the serving program BEFORE accepting traffic (the
    # first TPU compile takes ~30-60 s and must not count against a
    # request's deadline)
    import numpy as np
    import time as _time

    t0 = _time.perf_counter()
    out = predict(np.zeros((args.serve_batch, args.inputSize, args.inputSize, 3), np.float32))
    jax.block_until_ready(out["params"])
    print(f"warmup compile: {_time.perf_counter() - t0:.1f}s", flush=True)

    batcher = MicroBatcher(
        predict,
        args.serve_batch,
        max_wait_ms=args.max_wait_ms,
        input_shape=(args.inputSize, args.inputSize, 3),
    )
    server = InferenceServer(batcher, (args.inputSize, args.inputSize, 3))
    server.start(args.port)
    print("POST /predict, GET /healthz, GET /stats — Ctrl-C to stop", flush=True)
    try:
        while True:
            import time

            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


def cmd_test_baseline(args):
    import jax

    from ihmr_tpu.data import BaselineDataset, BatchLoader, DataConfig
    from ihmr_tpu.models import InterHandEncoder
    from ihmr_tpu.train import TrainConfig, create_state
    from ihmr_tpu.train import checkpoint as ckpt
    from ihmr_tpu.train.loops import print_metrics, test_baseline_loop
    from ihmr_tpu.utils import io_utils

    cfg = DataConfig(
        data_root=args.data_root, param_root=args.param_root, anno_path=args.anno_path,
        batch_size=args.batchSize, world_size=args.world_size, input_size=args.inputSize,
    )
    dataset = BaselineDataset(cfg)
    dataset.load_data()
    loader = BatchLoader(dataset, args.batchSize, rank=args.rank, world_size=args.world_size)
    mano_right, mano_left, _, _ = _load_mano(args)
    config = TrainConfig()
    encoder = InterHandEncoder(arch=args.main_encoder, dtype=_dtype(args))
    state = create_state(encoder, _mean_params(args), config, jax.random.PRNGKey(0), args.inputSize)
    params = ckpt.load_network(args.checkpoints_dir, "baseline", args.test_epoch)
    assert params is not None, f"no checkpoint '{args.test_epoch}' in {args.checkpoints_dir}"
    state = state.replace(params=params)
    stats = ckpt.load_network(args.checkpoints_dir, "baseline_stats", args.test_epoch)
    if stats is not None:
        state = state.replace(batch_stats=stats)

    evaluator = test_baseline_loop(encoder, state, loader, dataset, mano_right, mano_left, config)
    evaluator.remove_redunc()
    out_dir = osp.join("evaluate_results", "baseline")
    io_utils.save_pkl(osp.join(out_dir, f"{dataset.name}.pkl"), evaluator)
    if getattr(args, "visualize_eval", False):
        evaluator.render_results(osp.join(out_dir, dataset.name, "images"))
    if args.export_pred:
        # prediction pkl consumed by `optimize` / `train-mlp` (--pred_path);
        # the baseline -> OPT/MLP hand-off (ref src/data/data_utils.py:42-70)
        from ihmr_tpu.eval.export import evaluator_to_prediction_pkl

        evaluator_to_prediction_pkl(evaluator, args.export_pred)
        print(f"exported prediction pkl -> {args.export_pred}")
    print_metrics(evaluator, f"epoch {args.test_epoch}")


def cmd_optimize(args):
    import dataclasses

    from ihmr_tpu.data import BatchLoader, DataConfig, OPTDataset
    from ihmr_tpu.refine import OptConfig, strategies
    from ihmr_tpu.train.loops import optimize_loop, print_metrics
    from ihmr_tpu.utils import io_utils

    cfg = DataConfig(
        data_root=args.data_root, param_root=args.param_root, anno_path=args.anno_path,
        pred_path=args.pred_path, batch_size=args.batchSize, world_size=args.world_size,
    )
    dataset = OPTDataset(cfg)
    dataset.load_data()
    loader = BatchLoader(dataset, args.batchSize, rank=args.rank, world_size=args.world_size)
    mano_right, mano_left, _, _ = _load_mano(args)
    grid = args.loop_collision_backend == "grid"
    config = OptConfig(
        optimizer=args.optimizer,
        save_mid_freq=args.save_mid_freq,
        loop_collision_subsample=args.loop_collision_subsample,
        loop_collision_face_subsample=args.loop_collision_face_subsample,
        loop_collision_lazy_reselect=not args.loop_collision_eager_reselect,
        loop_collision_freeze_positions=not args.loop_collision_track_positions,
        loop_collision_fast=not grid,
        collision_backend="grid" if grid else "auto",
        stage_hoist_decode=not args.no_stage_hoist,
        escalate_collision=args.escalate_collision,
    )
    strategy = strategies[args.strategy]
    if args.stage_epochs is not None:
        strategy = tuple(dataclasses.replace(s, epoch=args.stage_epochs) for s in strategy)
    evaluator = optimize_loop(
        mano_right, loader, dataset, strategy, config,
        left_faces=mano_left.faces, is_main=args.rank <= 0,
        obj_dump_dir=args.obj_dump_dir,
    )
    evaluator.remove_redunc()
    out_dir = osp.join("evaluate_results", "optimize")
    io_utils.save_pkl(osp.join(out_dir, f"{dataset.name}.pkl"), evaluator)
    if args.export_pseudo_gt:
        # refined params become MLP pseudo-GT (`train-mlp --use_opt_params
        # --opt_params_path`; ref mlp_dataset.py:117-145)
        from ihmr_tpu.eval.export import evaluator_to_opt_pseudo_gt

        evaluator_to_opt_pseudo_gt(evaluator, args.export_pseudo_gt)
        print(f"exported OPT pseudo-GT -> {args.export_pseudo_gt}")
    print_metrics(evaluator, "optimize")


def cmd_train_mlp(args):
    import dataclasses

    from ihmr_tpu.data import BatchLoader, DataConfig, MLPDataset
    from ihmr_tpu.refine import MLPCaches, OptConfig, strategies
    from ihmr_tpu.train.loops import _to_mlp_batch
    from ihmr_tpu.train.mlp import train_mlp_stages, warm_pass

    cfg = DataConfig(
        data_root=args.data_root, param_root=args.param_root, anno_path=args.anno_path,
        pred_path=args.pred_path, batch_size=args.batchSize, world_size=args.world_size,
        is_train=True, use_opt_params=args.use_opt_params,
        opt_params_path=args.opt_params_path,
    )
    dataset = MLPDataset(cfg)
    dataset.load_data()
    loader = BatchLoader(dataset, args.batchSize, rank=args.rank, world_size=args.world_size)
    mano_right, _mano_left, _, _ = _load_mano(args)
    caches = MLPCaches(num_data=len(dataset))
    config = OptConfig(robustifier=args.sdf_robustifier)
    strategy = strategies[args.strategy]
    if args.stage_epochs is not None:
        strategy = tuple(dataclasses.replace(s, epoch=args.stage_epochs) for s in strategy)
    warm_pass(mano_right, loader, caches, config, _to_mlp_batch)
    train_mlp_stages(
        mano_right, strategy, loader, caches, config, _to_mlp_batch,
        checkpoints_dir=args.checkpoints_dir, is_main=args.rank <= 0,
    )


def cmd_test_mlp(args):
    from ihmr_tpu.data import BatchLoader, DataConfig, MLPDataset
    from ihmr_tpu.refine import OptConfig, strategies
    from ihmr_tpu.train import checkpoint as ckpt
    from ihmr_tpu.train.loops import _to_mlp_batch, print_metrics
    from ihmr_tpu.train.mlp import test_mlp_loop
    from ihmr_tpu.utils import io_utils

    cfg = DataConfig(
        data_root=args.data_root, param_root=args.param_root, anno_path=args.anno_path,
        pred_path=args.pred_path, batch_size=args.batchSize, world_size=args.world_size,
    )
    dataset = MLPDataset(cfg)
    dataset.load_data()
    loader = BatchLoader(dataset, args.batchSize, rank=args.rank, world_size=args.world_size)
    mano_right, mano_left, _, _ = _load_mano(args)
    strategy = strategies[args.strategy]
    stage_params = []
    for stage_id in range(len(strategy)):
        params = ckpt.load_network(args.checkpoints_dir, "mlp", args.test_epoch, stage_id=stage_id)
        assert params is not None, f"missing stage {stage_id} checkpoint"
        stage_params.append(params)
    evaluator = test_mlp_loop(
        mano_right, strategy, stage_params, loader, dataset, OptConfig(), _to_mlp_batch,
        left_faces=mano_left.faces,
    )
    evaluator.remove_redunc()
    out_dir = osp.join("evaluate_results", "mlp")
    io_utils.save_pkl(osp.join(out_dir, f"{dataset.name}.pkl"), evaluator)
    print_metrics(evaluator, f"mlp epoch {args.test_epoch}")


def cmd_visualize(args):
    """Render every prediction to jpg + obj (ref bash/visualize.sh ->
    src/utils/evaluator.py:262-291)."""
    from ihmr_tpu.utils import io_utils

    evaluator = io_utils.load_pkl(args.results)
    base = args.out_dir or osp.join(osp.dirname(args.results), osp.basename(args.results).rsplit(".", 1)[0])
    obj_dir = osp.join(base, "objs")
    img_dir = osp.join(base, "images")
    io_utils.build_dir(obj_dir)
    io_utils.build_dir(img_dir)
    evaluator.export_objs(obj_dir, limit=args.limit)
    evaluator.render_results(img_dir, limit=args.limit)
    n = min(len(evaluator.pred_results), args.limit or 10**9)
    print(f"wrote {n} objs to {obj_dir} and {n} renders to {img_dir}")


def main(argv=None):
    # persistent XLA compilation cache: repeat CLI invocations skip the
    # (tens of seconds) cold-start compiles. IHMR_NO_COMPILE_CACHE=1 opts
    # out — the test suite sets it (tests/conftest.py): a cache entry
    # compiled on a DIFFERENT machine loads as foreign-ISA XLA:CPU AOT code
    # and can SIGSEGV (observed when round-2 cache entries met a new host;
    # xla's cpu_aot_loader warns "+prefer-no-scatter is not supported ...
    # could lead to execution errors such as SIGILL" and then crashes).
    try:
        import jax

        if not os.environ.get("IHMR_NO_COMPILE_CACHE"):
            jax.config.update(
                "jax_compilation_cache_dir", osp.expanduser("~/.cache/ihmr_jax")
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    parser = argparse.ArgumentParser(prog="ihmr_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train-baseline")
    _add_common(p)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_decay_type", choices=["none", "stage", "cosine"], default="cosine")
    p.add_argument("--total_epoch", type=int, default=20)
    p.add_argument("--print_freq", type=int, default=2048)
    p.add_argument("--display_freq", type=int, default=0,
                   help="render training visuals every N samples (rank 0)")
    p.add_argument("--live_port", type=int, default=-1,
                   help=">=0: serve the live loss/visuals monitor on this "
                        "port (0 = ephemeral; the visdom-dashboard equivalent)")
    p.add_argument("--save_epoch_freq", type=int, default=5)
    p.add_argument("--use_collision_loss", action="store_true")
    p.add_argument("--use_hand_rotation", action="store_true",
                   help="include global orient in the rodrigues pose loss")
    p.add_argument("--sdf_robustifier", type=float, default=None)
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--pretrain_weights", default=None)
    for flag in (
        "use_random_flip", "use_random_rescale", "use_random_position",
        "use_random_rotation", "use_color_jittering", "use_motion_blur",
    ):
        p.add_argument(f"--{flag}", action="store_true")
    p.add_argument("--blur_kernel_dir", default="")
    p.set_defaults(func=cmd_train_baseline)

    p = sub.add_parser("test-baseline")
    _add_common(p)
    p.add_argument("--test_epoch", default="latest")
    p.add_argument("--visualize_eval", action="store_true",
                   help="render predictions to jpg after evaluation")
    p.add_argument("--export_pred", default="",
                   help="write the prediction pkl consumed by optimize/train-mlp")
    p.set_defaults(func=cmd_test_baseline)

    p = sub.add_parser("optimize")
    _add_common(p)
    p.add_argument("--optimizer", choices=["adam", "sgd"], default="adam")
    p.add_argument("--save_mid_freq", type=int, default=10)
    p.add_argument("--stage_epochs", type=int, default=None,
                   help="override every stage's step count (fast runs/smoke tests)")
    p.add_argument("--loop_collision_subsample", type=int, default=2,
                   help="in-loop collision QUERY-vertex stride (default 2, "
                        "verified identical to every-vertex sampling by the "
                        "16-seed paired study in docs/quality_study.json; "
                        "1 = strict)")
    p.add_argument("--loop_collision_face_subsample", type=int, default=2,
                   help="in-loop collision target-face stride (Morton-sorted "
                        "faces, so >1 is a uniform coarse cover; final "
                        "metrics always use every face)")
    p.add_argument("--loop_collision_eager_reselect", action="store_true",
                   help="recompute the nearest-face selection every step "
                        "instead of once per snapshot period (1.65x slower, "
                        "measured quality-identical)")
    p.add_argument("--loop_collision_track_positions", action="store_true",
                   help="rebuild the selected triangles' positions every "
                        "step instead of once per snapshot block (2.1x "
                        "slower; the default frozen-positions path is "
                        "quality-gated by the 16-seed paired study)")
    p.add_argument("--no_stage_hoist", action="store_true",
                   help="disable per-stage decode hoisting (the exact "
                        "partial evaluation of frozen parameter groups; "
                        "falls back to the scanned masked-Adam engine)")
    p.add_argument("--escalate_collision", type=float, default=0.0,
                   help="two-pass grid escalation threshold: samples whose "
                        "final exact collision exceeds this re-refine with "
                        "the reference-mechanism 32^3 grid backend and keep "
                        "the better result (0 = off; refine/escalation.py)")
    p.add_argument("--loop_collision_backend", choices=["fast", "grid"],
                   default="fast",
                   help="'fast' = nearest-face (shipping default); 'grid' = "
                        "the reference's 32^3 phi-grid mechanism in the loop "
                        "(~15-20x slower, resolves deep interlocks ~16x "
                        "further at ~20%% higher GT-joint error; "
                        "docs/grid_sdf_study.json)")
    p.add_argument("--obj_dump_dir", default=None,
                   help="dump each batch's first refined sample as .obj here")
    p.add_argument("--export_pseudo_gt", default="",
                   help="write OPT refined params as MLP pseudo-GT pkl")
    p.set_defaults(func=cmd_optimize)

    p = sub.add_parser("train-mlp")
    _add_common(p)
    p.add_argument("--use_opt_params", action="store_true")
    p.add_argument("--opt_params_path", default="",
                   help="OPT pseudo-GT pkl from `optimize --export_pseudo_gt`")
    p.add_argument("--sdf_robustifier", type=float, default=None)
    p.add_argument("--stage_epochs", type=int, default=None,
                   help="override every stage's epoch count (smoke tests)")
    p.set_defaults(func=cmd_train_mlp, strategy="mlp_default")

    p = sub.add_parser("test-mlp")
    _add_common(p)
    p.add_argument("--test_epoch", default="latest")
    p.set_defaults(func=cmd_test_mlp, strategy="mlp_default")

    p = sub.add_parser("visualize")
    p.add_argument("--results", required=True)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(func=cmd_visualize)

    p = sub.add_parser("serve", help="batched inference HTTP server")
    _add_common(p)
    p.add_argument("--test_epoch", default="latest")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--serve_batch", type=int, default=16,
                   help="micro-batch size (one compiled program shape)")
    p.add_argument("--max_wait_ms", type=float, default=10.0,
                   help="max time to wait filling a micro-batch")
    p.set_defaults(func=cmd_serve)

    args = parser.parse_args(argv)

    # Diagnostic only (no exit): if the TPU plugin's tunnel is unreachable,
    # backend init sleeps in a connect-retry loop with zero output — tell
    # the user what is happening instead of hanging silently. The timer is
    # cancelled by the probe thread the moment the backend answers.
    import threading

    def _probe():
        try:
            import jax

            jax.devices()
        except Exception:
            pass
        finally:
            hint.cancel()

    hint_secs = float(os.environ.get("IHMR_INIT_HINT_SECS", "120"))
    hint = threading.Timer(
        hint_secs,
        lambda: print(
            f"[ihmr_tpu] still waiting on jax backend init after "
            f"{hint_secs:.0f}s — if this is the axon TPU plugin, its tunnel "
            "may be down (it retries forever). Set JAX_PLATFORMS=cpu to run "
            "on CPU.",
            file=sys.stderr,
            flush=True,
        ),
    )
    hint.daemon = True
    hint.start()
    probe = threading.Thread(target=_probe, daemon=True)
    probe.start()

    args.func(args)


if __name__ == "__main__":
    main()
