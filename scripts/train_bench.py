"""Training-side throughput on one TPU chip (VERDICT round-2 item 4).

The reference trains two of its three workloads — the baseline encoder
(20 epochs, batch 64, 4 GPUs; ref bash/train_baseline.sh:20-41) and the MLP
stages (batch 512, 2 GPUs; ref bash/train_mlp.sh) — but rounds 1-2 only
benchmarked infer+OPT. This script measures, on the real chip:

  * baseline ``train_step`` (ResNet-50 fwd+bwd + 4x MANO decode + 7 losses +
    Adam) — imgs/sec, ms/step, achieved TFLOP/s and MFU, with the collision
    loss ON (the heavier configuration; the ref default trains without it)
    and OFF (the reference's shipping configuration);
  * one MLP stage train step (SubNetwork fwd+bwd + mirrored MANO + 8 losses
    + Adam at batch 512) — samples/sec, ms/step, and a derived per-stage
    epoch time for an InterHand2.6M-scale (366K-sample) train split.

Analytic FLOP model: ResNet-50 at 224^2 is ~4.14 GFLOP/img forward
(conv+fc MACs x2); backward ~2x forward => ~12.4 GFLOP/img fwd+bwd. The
MANO decode adds ~0.011 GFLOP/hand-pair (scripts/roofline.py mano_flops).
MFU is quoted against the v5e vendor bf16 peak (197 TFLOP/s) AND against
the measured MXU ceiling when available; the default train path is fp32,
so MFU-vs-bf16-peak undersells it by design — both numbers are printed.

    python scripts/train_bench.py [batch]

Results are recorded in BASELINE.md ("Measured (this rebuild)").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MLP_BATCH = int(os.environ.get("IHMR_MLP_BENCH_BATCH", "512"))
STEPS = int(os.environ.get("IHMR_TRAIN_BENCH_STEPS", "20"))
RESNET50_FWD_GFLOP_PER_IMG = 4.14  # 224^2, conv+fc MACs x2
VENDOR_BF16_PEAK = 197e12

def log(*a):
    print(*a, flush=True)


def bench_baseline_train(use_collision: bool, bf16: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ihmr_tpu.data.synthetic import generate
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.mano.loader import mirror_mano_model
    from ihmr_tpu.models import InterHandEncoder, build_mean_params
    from ihmr_tpu.train import BaselineBatch, TrainConfig, create_state, train_step

    dev = jax.devices()[0]
    mano_right = synthetic_mano_model()
    mano_left = mirror_mano_model(mano_right)
    import jax.numpy as _jnp

    encoder = InterHandEncoder(
        arch="resnet50", dtype=_jnp.bfloat16 if bf16 else _jnp.float32
    )
    config = TrainConfig(lr=1e-4, use_collision_loss=use_collision)

    with jax.default_device(jax.devices("cpu")[0]):
        mean = build_mean_params(np.zeros(48, np.float32), np.zeros(10, np.float32))
        state = create_state(encoder, mean, config, jax.random.PRNGKey(0), input_size=224)
        d = generate(mano_right, BATCH, seed=0, noise=0.1)
        rng = np.random.RandomState(0)
        ones = jnp.ones((BATCH, 42, 1), jnp.float32)
        batch = BaselineBatch(
            img=jnp.asarray(rng.randn(BATCH, 224, 224, 3).astype(np.float32) * 0.5),
            hand_type_array=jnp.ones((BATCH, 2)),
            hand_type_valid=jnp.ones((BATCH, 1)),
            joints_2d=jnp.concatenate([d["gt_j2"], ones], axis=-1),
            joints_3d=jnp.concatenate([d["gt_j3"], ones], axis=-1),
            gt_pose_params=d["gt_pose"],
            gt_shape_params=d["gt_shape"],
            mano_params_weight=jnp.ones((BATCH, 2)),
            hand_trans=jnp.concatenate([d["gt_trans"], jnp.ones((BATCH, 1))], axis=-1)[:, None, :],
            do_flip=jnp.zeros((BATCH,), jnp.int32),
        )
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    mano_right = jax.device_put(mano_right, dev)
    mano_left = jax.device_put(mano_left, dev)

    # Timing harness: STEPS chained steps inside ONE jitted lax.scan — a
    # single device dispatch covers the whole window. Per-call python
    # dispatch over the tunneled TPU measured wildly unstable (3-53 ms/step
    # for the identical program depending on whether dispatches pipelined);
    # the scan gives the honest device-side per-step time, with the final
    # loss returned so the work provably executed.
    @jax.jit
    def run_window(state):
        def body(s, _):
            s2, m = train_step(encoder, s, batch, mano_right, mano_left, config)
            return s2, m["total_loss"]
        return jax.lax.scan(body, state, None, length=STEPS)

    t0 = time.perf_counter()
    state, losses = run_window(state)
    jax.block_until_ready(losses)
    log(f"  compile+first window: {time.perf_counter() - t0:.1f}s "
        f"(loss {float(losses[0]):.2f} -> {float(losses[-1]):.2f})")

    t0 = time.perf_counter()
    state, losses = run_window(state)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / STEPS
    assert float(losses[-1]) == float(losses[-1]), "NaN loss"

    imgs_per_sec = BATCH / dt
    # fwd + bwd ~ 3x fwd FLOPs; 4 MANO decodes (pred+gt, L+R) are ~0.7% extra
    gflop_per_step = 3 * RESNET50_FWD_GFLOP_PER_IMG * BATCH
    tflops = gflop_per_step / dt / 1e3
    mfu = tflops * 1e12 / VENDOR_BF16_PEAK
    tag = ("collision ON " if use_collision else "collision off") + (
        " bf16" if bf16 else " fp32"
    )
    path = "bf16" if bf16 else "fp32"
    log(
        f"  baseline train_step ({tag}): {dt * 1e3:7.1f} ms/step  "
        f"{imgs_per_sec:7.1f} imgs/sec  ~{tflops:.1f} TFLOP/s  "
        f"MFU {100 * mfu:.1f}% ({path} path vs bf16 vendor peak)"
    )
    return dict(ms_per_step=dt * 1e3, imgs_per_sec=imgs_per_sec, tflops=tflops, mfu=mfu)


def bench_mlp_stage_train():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ihmr_tpu.data.synthetic import make_mlp_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.models.encoder import SubNetwork
    from ihmr_tpu.refine import OptConfig, mlp_default
    from ihmr_tpu.refine.mlp_engine import seed_from_backbone
    from ihmr_tpu.train.mlp import make_stage_train_step

    dev = jax.devices()[0]
    model = synthetic_mano_model()
    with jax.default_device(jax.devices("cpu")[0]):
        batch = make_mlp_inputs(model, batch=MLP_BATCH, seed=0, noise=0.15)
    model = jax.device_put(model, dev)
    batch = jax.device_put(batch, dev)
    prev_params = jax.tree_util.tree_map(jnp.asarray, seed_from_backbone(batch))

    stage = mlp_default[3]  # finger-pose stage: the widest update (90-dim)
    subnet = SubNetwork(update_dim=stage.update_dim)
    subnet_params = subnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024 + 122)))
    subnet_params = jax.device_put(subnet_params, dev)
    step, tx = make_stage_train_step(model, stage, subnet, OptConfig())
    opt_state = jax.device_put(tx.init(subnet_params), dev)

    @jax.jit
    def run_window(subnet_params, opt_state):
        def body(carry, _):
            sp, os_ = carry
            sp, os_, m = step(sp, os_, batch, prev_params)
            return (sp, os_), m["total_loss"]
        return jax.lax.scan(body, (subnet_params, opt_state), None, length=STEPS)

    t0 = time.perf_counter()
    (subnet_params, opt_state), losses = run_window(subnet_params, opt_state)
    jax.block_until_ready(losses)
    log(f"  compile+first window: {time.perf_counter() - t0:.1f}s "
        f"(loss {float(losses[0]):.3f} -> {float(losses[-1]):.3f})")

    t0 = time.perf_counter()
    (subnet_params, opt_state), losses = run_window(subnet_params, opt_state)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / STEPS

    sps = MLP_BATCH / dt
    epoch_366k = 366000 / sps
    log(
        f"  MLP stage train step (batch {MLP_BATCH}, pose stage): "
        f"{dt * 1e3:6.1f} ms/step  {sps:8.0f} samples/sec  "
        f"-> {epoch_366k:.0f} s per 366K-sample epoch"
    )
    return dict(ms_per_step=dt * 1e3, samples_per_sec=sps, epoch_366k_sec=epoch_366k)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}  baseline batch={BATCH}  mlp batch={MLP_BATCH}")

    log("baseline encoder training:")
    off = bench_baseline_train(use_collision=False)
    bf16 = bench_baseline_train(use_collision=False, bf16=True)
    on = bench_baseline_train(use_collision=True)
    log("MLP stage training:")
    mlp = bench_mlp_stage_train()

    import json

    log(json.dumps({"baseline_no_coll": off, "baseline_no_coll_bf16": bf16,
                    "baseline_coll": on, "mlp_stage": mlp}))


if __name__ == "__main__":
    main()
