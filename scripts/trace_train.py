"""Capture a jax.profiler trace of the baseline train_step and print the top
device ops by total time (same parser as scripts/trace_step.py).

    python scripts/trace_train.py [batch] [bf16 0/1] [collision 0/1]

Feeds the trace-driven optimization workflow in docs/PERFORMANCE.md — used
in round 3 to find where the ResNet-50 training step spends its time after
the bf16 backbone landed (MFU was 12.5% of the bf16 vendor peak at batch
256, far below a well-mapped conv net).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BF16 = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
COLLISION = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
TRACE_DIR = os.environ.get("IHMR_TRACE_DIR", "/tmp/ihmr_trace_train")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import generate
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.mano.loader import mirror_mano_model
    from ihmr_tpu.models import InterHandEncoder, build_mean_params
    from ihmr_tpu.train import BaselineBatch, TrainConfig, create_state, train_step

    dev = jax.devices()[0]
    print(f"device: {dev} batch={BATCH} bf16={BF16} collision={COLLISION}")
    mano_right = synthetic_mano_model()
    mano_left = mirror_mano_model(mano_right)
    encoder = InterHandEncoder(
        arch="resnet50", dtype=jnp.bfloat16 if BF16 else jnp.float32
    )
    config = TrainConfig(lr=1e-4, use_collision_loss=COLLISION)

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
            hand_trans=jnp.concatenate(
                [d["gt_trans"], jnp.ones((BATCH, 1))], axis=-1
            )[:, None, :],
            do_flip=jnp.zeros((BATCH,), jnp.int32),
        )
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    mano_right = jax.device_put(mano_right, dev)
    mano_left = jax.device_put(mano_left, dev)

    def one(s):
        s2, m = train_step(encoder, s, batch, mano_right, mano_left, config)
        return s2, m["total_loss"]

    stepf = jax.jit(one)
    state, loss = stepf(state)
    jax.block_until_ready(loss)  # compile + warm

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, loss = stepf(state)
        jax.block_until_ready(loss)

    traces = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {TRACE_DIR}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    tnames = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tnames[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for ev in data["traceEvents"]:
        if (
            ev.get("ph") == "X"
            and "dur" in ev
            and tnames.get((ev.get("pid"), ev.get("tid"))) == "XLA Ops"
        ):
            name = ev["name"]
            tot[name] += ev["dur"]
            cnt[name] += 1
            wall += ev["dur"]
    print(f"\ntotal TensorCore busy: {wall / 1e3:.2f} ms over {sum(cnt.values())} events (3 steps)")
    print(f"{'op':<72s} {'total ms':>9s} {'count':>6s}")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{name[:72]:<72s} {t / 1e3:9.3f} {cnt[name]:6d}")


if __name__ == "__main__":
    main()
