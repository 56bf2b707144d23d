"""IHMR-MLP stage training soak at realistic scale on the TPU.

VERDICT round-1 item 8: run the full 6-stage mlp_default training big enough
to show per-stage metric improvement and selection acceptance rates, with
the LossStat running-average telemetry. Uses the synthetic data generator
(the licensed assets are unavailable); dataset/batch sizes default to the
reference's shape (bash/train_mlp.sh: batch 64/GPU).

    python scripts/mlp_soak.py [n_samples] [batch]

Appends a result block to docs/MLP_SOAK.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import make_mlp_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import MLPCaches, OptConfig, mlp_default
    from ihmr_tpu.train.mlp import train_mlp_stages, warm_pass

    dev = jax.devices()[0]
    print(f"device: {dev}  n={N} batch={BATCH}", flush=True)
    model = jax.device_put(synthetic_mano_model(), dev)

    # synthetic "dataset": pre-generated MLP batches (annotation + cached
    # baseline predictions incl. img_feat), sharded into loader batches
    batches = []
    for i in range(N // BATCH):
        b = make_mlp_inputs(model, batch=BATCH, seed=100 + i, index_offset=i * BATCH)
        batches.append(jax.device_put(b, dev))

    class _Loader:
        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

        def set_epoch(self, e):
            pass

    caches = MLPCaches(N)
    cfg = OptConfig(save_mid_freq=10)
    t0 = time.perf_counter()
    warm_pass(model, _Loader(), caches, cfg, lambda raw: raw)
    print(f"warm pass: {time.perf_counter() - t0:.1f}s", flush=True)

    stage_stats = []
    t0 = time.perf_counter()
    train_mlp_stages(
        model,
        mlp_default,
        _Loader(),
        caches,
        cfg,
        lambda raw: raw,
        rng_key=jax.random.PRNGKey(0),
        print_freq=8,
        stage_stats=stage_stats,
    )
    total = time.perf_counter() - t0
    print(f"\n6-stage training: {total:.1f}s for {N} samples", flush=True)

    lines = [
        "",
        f"## Soak {time.strftime('%Y-%m-%d %H:%M')} — n={N}, batch={BATCH}, "
        f"device={dev} ({total:.0f}s train)",
        "",
        "| stage | groups | accept frac | select loss | before -> after |",
        "|---|---|---|---|---|",
    ]
    for s, stat in zip(mlp_default, stage_stats):
        lines.append(
            f"| {stat['stage']} | {','.join(s.update_params)} | "
            f"{stat['accepted_frac']:.3f} | {stat['select_loss']} | "
            f"{stat['select_before']:.5f} -> {stat['select_after']:.5f} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "MLP_SOAK.md")
    header = "" if os.path.exists(out) else (
        "# IHMR-MLP stage-training soak log\n\nPer-stage selection acceptance"
        " and select-loss improvement on the synthetic dataset (the"
        " reference's curriculum, ref src/strategies/mlp_default.py).\n")
    with open(out, "a") as f:
        if header:
            f.write(header)
        f.write("\n".join(lines) + "\n")
    print(f"appended to {out}")
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
