"""Paired quality study: fast vs exact in-loop collision in MLP stage training.

Round-3 change: the MLP stage-training GRADIENT pass defaults to the fast
nearest-centroid collision backend (the OPT engine's in-loop/metrics split,
OptConfig.loop_collision_fast) — measured 107.8 -> 48.6 ms/step at batch 512
on v5e. The warm pass and the end-of-stage selection pass always score on
the EXACT kernel, so the only thing the approximation can change is the
gradient trajectory inside a stage. This study bounds that effect.

Protocol (mirrors scripts/quality_study.py's paired design): for each seed,
build an identical synthetic MLP dataset and run the FULL stage-wise
training loop (warm pass -> every mlp_default stage -> selection/writeback)
twice from the same rng — once with loop_collision_fast=True (shipping
default) and once =False (exact gradients). Compare, per seed:

  * final cached select losses (joints_3d_p + collision; both runs score
    these with the exact kernel inside the selection pass);
  * per-stage acceptance fractions.

Output: one JSON line with paired deltas (fast - exact) mean +/- 2*stderr.
A delta within noise of 0 means the approximation does not change training
outcomes, only step cost.

    python scripts/mlp_fast_study.py [n_seeds] [batch]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NUM_BATCHES = int(os.environ.get("IHMR_MLP_STUDY_BATCHES", "2"))
STAGE_EPOCHS = int(os.environ.get("IHMR_MLP_STUDY_EPOCHS", "2"))


class _Loader:
    def __init__(self, model, seed):
        import jax

        from ihmr_tpu.data.synthetic import make_mlp_inputs

        dev = jax.devices()[0]
        self.batches = [
            jax.device_put(
                make_mlp_inputs(
                    model, batch=BATCH, seed=seed * 1000 + s, noise=0.15,
                    index_offset=s * BATCH,
                ),
                dev,
            )
            for s in range(NUM_BATCHES)
        ]

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


def run_one(model, seed: int, fast: bool):
    import jax

    from ihmr_tpu.refine import MLPCaches, OptConfig, mlp_default
    from ihmr_tpu.train.mlp import train_mlp_stages, warm_pass

    config = OptConfig(loop_collision_fast=fast)
    strategy = tuple(dataclasses.replace(s, epoch=STAGE_EPOCHS) for s in mlp_default)
    loader = _Loader(model, seed)
    caches = MLPCaches(num_data=BATCH * NUM_BATCHES)
    identity = lambda b: b
    warm_pass(model, loader, caches, config, identity)
    stats = []
    train_mlp_stages(
        model, strategy, loader, caches, config, identity,
        rng_key=jax.random.PRNGKey(seed), print_freq=10_000, stage_stats=stats,
    )
    return dict(
        j3d_p=float(np.mean(caches.prev_losses["joints_3d_loss_p_batch"])),
        coll=float(np.mean(caches.prev_losses["collision_loss_batch"])),
        accept=[s["accepted_frac"] for s in stats],
    )


def main():
    import jax

    from ihmr_tpu.mano import synthetic_mano_model

    model = jax.device_put(synthetic_mano_model(), jax.devices()[0])
    d_j3d, d_coll, d_acc = [], [], []
    for seed in range(N_SEEDS):
        t0 = time.time()
        fast = run_one(model, seed, fast=True)
        exact = run_one(model, seed, fast=False)
        d_j3d.append(fast["j3d_p"] - exact["j3d_p"])
        d_coll.append(fast["coll"] - exact["coll"])
        d_acc.append(np.mean(fast["accept"]) - np.mean(exact["accept"]))
        print(
            f"seed {seed}: d_j3d_p={d_j3d[-1]:+.5f} d_coll={d_coll[-1]:+.5f} "
            f"d_accept={d_acc[-1]:+.3f}  ({time.time() - t0:.0f}s)",
            flush=True,
        )

    def pm(xs):
        xs = np.asarray(xs)
        return dict(mean=float(xs.mean()), pm2se=float(2 * xs.std(ddof=1) / np.sqrt(len(xs))))

    out = dict(
        n_seeds=N_SEEDS, batch=BATCH, num_batches=NUM_BATCHES,
        stage_epochs=STAGE_EPOCHS,
        d_joints_3d_p=pm(d_j3d), d_collision=pm(d_coll), d_accept=pm(d_acc),
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
