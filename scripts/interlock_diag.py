"""Diagnose the deep-interlock collision gap (VERDICT round-3 item 1).

The round-3 grid study measured residual exact collision after full
opt_default refinement on the interlocked benchmark:

    grid (reference mechanism)      0.218
    strict nearest-face (in-loop)   3.56
    shipping default                6.63

but the study's "strict" config still uses the K=1 nearest-CENTROID
selection (loop_collision_fast=True) — the exact kernel never ran in-loop.
This script separates the two candidate explanations:

  (A) SELECTION/SIGN quality: the K=1 nearest-centroid pick is wrong for
      deeply buried vertices — the chosen face's normal-sign test misfires
      (phi=0, no gradient) or the depth is badly wrong. If so, an EXACT
      per-block selection fixes the gap at shipping speed.
  (B) FIELD mechanism: even exact point-triangle depths/gradients lose to
      the grid's smoothed field (coherent per-cell gradients). If so, a
      fast grid build is required.

Part 1 — static depth accuracy at the INIT params of the interlocked
benchmark: per-vertex depths from {K=1 centroid, K=8 xla, grid trilinear}
vs the exact pallas kernel. Reports the fraction of truly-penetrating
vertices each approximation ZEROES (sign/selection misfire) and depth RMSE.

Part 2 — end-to-end refinement with in-loop configs {strict-K1, exact-K8,
grid}; final metrics from the exact kernel as always.

Run on the real TPU: python scripts/interlock_diag.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = int(os.environ.get("IHMR_DIAG_SEEDS", "4"))
BATCH = int(os.environ.get("IHMR_DIAG_BATCH", "16"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.ops.collision import collision_loss
    from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch
    from ihmr_tpu.refine.opt_engine import forward

    dev = jax.devices()[0]
    print(f"device: {dev}  seeds={SEEDS} batch={BATCH}", flush=True)
    model = jax.device_put(synthetic_mano_model(), dev)
    faces_r = model.faces
    faces_l = model.faces[:, ::-1]

    # ---------------- Part 1: static depth accuracy at init -----------------
    @jax.jit
    def depth_variants(params, batch):
        rv, lv, _, _ = forward(model, params)
        ht = batch.hand_type_array
        _, _, d_exact = collision_loss(rv, lv, faces_r, faces_l, ht, backend="pallas")
        _, _, d_k1 = collision_loss(
            rv, lv, faces_r, faces_l, ht, backend="xla", num_candidates=1
        )
        _, _, d_k8 = collision_loss(
            rv, lv, faces_r, faces_l, ht, backend="xla", num_candidates=8
        )
        _, _, d_grid = collision_loss(rv, lv, faces_r, faces_l, ht, backend="grid")
        return d_exact, d_k1, d_k8, d_grid

    stats = {k: dict(zeroed=[], rmse=[], rel=[]) for k in ("k1", "k8", "grid")}
    for seed in range(SEEDS):
        params, batch = make_opt_inputs(model, batch=BATCH, seed=seed, interlocked=True)
        params = jax.device_put(params, dev)
        batch = jax.device_put(batch, dev)
        d_exact, d_k1, d_k8, d_grid = map(np.asarray, depth_variants(params, batch))
        pen = d_exact > 1e-4  # truly penetrating (by the exact kernel)
        for name, d in (("k1", d_k1), ("k8", d_k8), ("grid", d_grid)):
            zeroed = float((d[pen] < 1e-6).mean()) if pen.any() else 0.0
            err = d[pen] - d_exact[pen]
            stats[name]["zeroed"].append(zeroed)
            stats[name]["rmse"].append(float(np.sqrt((err**2).mean())))
            stats[name]["rel"].append(float(np.abs(err).mean() / d_exact[pen].mean()))
        print(
            f"seed {seed}: penetrating verts {int(pen.sum())}/{pen.size} "
            f"(exact mean depth {d_exact[pen].mean():.5f} max {d_exact.max():.5f})",
            flush=True,
        )

    part1 = {}
    for name, s in stats.items():
        part1[name] = {k: float(np.mean(v)) for k, v in s.items()}
        print(
            f"  {name:5s}: zeroed-frac {part1[name]['zeroed']:.3f}  "
            f"rmse {part1[name]['rmse']:.5f}  rel-err {part1[name]['rel']:.3f}",
            flush=True,
        )

    # ---------------- Part 2: end-to-end refinement ------------------------
    CONFIGS = {
        "strict_k1": dict(
            loop_collision_subsample=1,
            loop_collision_face_subsample=1,
            loop_collision_lazy_reselect=False,
        ),
        "exact_k8": dict(
            loop_collision_fast=False,
            collision_backend="xla",
            num_candidates=8,
            loop_collision_subsample=1,
            loop_collision_face_subsample=1,
        ),
        "grid": dict(
            loop_collision_fast=False,
            collision_backend="grid",
            loop_collision_subsample=1,
            loop_collision_face_subsample=1,
        ),
    }
    part2 = {}
    for name, over in CONFIGS.items():
        cfg = OptConfig(save_mid_freq=10, **over)
        coll, j3d = [], []
        t0 = time.perf_counter()
        for seed in range(SEEDS):
            params, batch = make_opt_inputs(model, batch=BATCH, seed=seed, interlocked=True)
            params = jax.device_put(params, dev)
            batch = jax.device_put(batch, dev)
            _, results = optimize_batch(model, params, batch, opt_default, cfg)
            coll.append(float(jnp.mean(results["collision_loss"])))
            j3d.append(float(jnp.mean(results["joints_3d_loss"])))
        dt = time.perf_counter() - t0
        part2[name] = dict(
            coll_mean=float(np.mean(coll)),
            coll_per_seed=[round(c, 5) for c in coll],
            j3d_mean=float(np.mean(j3d)),
            seconds=round(dt, 1),
        )
        print(
            f"{name:10s}: final exact coll={np.mean(coll):.4f} "
            f"(per-seed {[round(c, 3) for c in coll]}) j3d={np.mean(j3d):.4f} ({dt:.0f}s)",
            flush=True,
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "interlock_diag.json",
    )
    with open(out, "w") as f:
        json.dump({"seeds": SEEDS, "batch": BATCH, "part1": part1, "part2": part2}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
