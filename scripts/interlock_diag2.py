"""Margin-shell sweep for the in-loop collision loss (round 4).

Follow-up to scripts/interlock_diag.py, which showed the reference's 32^3
grid mechanism (ref src/models/loss_utils.py:174-193) wins deep interlocks
through its FIELD SHAPE — the trilinear sampling smears the surface ~1 cell
outward, so near-contact vertices feel outward pressure before penetrating —
not through depth accuracy (the grid's depths are measurably the worst).

OptConfig.loop_collision_margin reproduces that smear on the fast
nearest-face path at zero extra kernel cost: in-loop depths become
max(0, margin - signed_dist). This script sweeps the margin on BOTH
benchmarks with the SHIPPING config (stride-2 queries/faces, lazy reselect,
frozen positions — i.e. exactly what `optimize_batch` runs by default):

  * interlocked: does the margin close the 25x gap to the grid backend?
  * standard:    does the margin hurt ordinary contact (overshoot pushing
                 hands apart -> j3d error up)?

Final metrics always come from the exact pallas kernel at margin=0, like
every other study. Reference rows: shipping margin=0, and the grid backend.

Run on the real TPU: python scripts/interlock_diag2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = int(os.environ.get("IHMR_DIAG_SEEDS", "8"))
BATCH = int(os.environ.get("IHMR_DIAG_BATCH", "16"))
MARGINS = [0.0, 0.0025, 0.005, 0.01, 0.02]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch

    dev = jax.devices()[0]
    print(f"device: {dev}  seeds={SEEDS} batch={BATCH}", flush=True)
    model = jax.device_put(synthetic_mano_model(), dev)

    def run(cfg, interlocked):
        coll, j3d = [], []
        t0 = time.perf_counter()
        for seed in range(SEEDS):
            params, batch = make_opt_inputs(
                model, batch=BATCH, seed=seed, interlocked=interlocked
            )
            params = jax.device_put(params, dev)
            batch = jax.device_put(batch, dev)
            _, results = optimize_batch(model, params, batch, opt_default, cfg)
            coll.append(float(jnp.mean(results["collision_loss"])))
            j3d.append(float(jnp.mean(results["joints_3d_loss"])))
        return dict(
            coll_mean=float(np.mean(coll)),
            coll_per_seed=[round(c, 5) for c in coll],
            j3d_mean=float(np.mean(j3d)),
            seconds=round(time.perf_counter() - t0, 1),
        )

    out = {"seeds": SEEDS, "batch": BATCH}
    for bench, interlocked in (("interlocked", True), ("standard", False)):
        rows = {}
        for margin in MARGINS:
            cfg = OptConfig(loop_collision_margin=margin)
            rows[f"margin_{margin}"] = r = run(cfg, interlocked)
            print(
                f"{bench:11s} margin={margin:<7g}: coll={r['coll_mean']:.4f} "
                f"(per-seed {[round(c, 3) for c in r['coll_per_seed']]}) "
                f"j3d={r['j3d_mean']:.4f} ({r['seconds']:.0f}s)",
                flush=True,
            )
        grid_cfg = OptConfig(
            loop_collision_fast=False,
            collision_backend="grid",
            loop_collision_subsample=1,
            loop_collision_face_subsample=1,
        )
        rows["grid_ref"] = r = run(grid_cfg, interlocked)
        print(
            f"{bench:11s} grid_ref      : coll={r['coll_mean']:.4f} "
            f"j3d={r['j3d_mean']:.4f} ({r['seconds']:.0f}s)",
            flush=True,
        )
        out[bench] = rows

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "margin_sweep.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
