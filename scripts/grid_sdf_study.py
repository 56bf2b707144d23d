"""Grid-SDF in-loop cross-check study (VERDICT round-2 item 5 / Missing #2).

Question: does refining with the REFERENCE's in-loop collision mechanism —
the 32^3 per-hand penetration grid + trilinear sampling (ops.grid_sdf,
``collision_backend='grid'``) — lead to measurably different final quality or
filter decisions than this rebuild's shipping nearest-face approximation?

Protocol: PAIRED per-seed runs of the full opt_default refinement on the
standard and adversarial-interlocked benchmarks; three in-loop configs on the
SAME seeds:

  * strict   — every-vertex/every-step nearest-face (sub=1, fsub=1, no lazy)
  * shipping — the verified default (sub=2, fsub=2, lazy reselect)
  * grid     — the reference mechanism (grids rebuilt once per snapshot
               block; staleness <= one block, fresh at every snapshot)

FINAL metrics always use the exact full-resolution kernel (optimize_batch's
epilogue). Reported per cell: final exact collision loss, GT joints_3d loss,
penetration depth stats, plus the per-sample REFINEMENT-DECISION agreement
between grid and each nearest-face config (fraction of (sample, param-group)
cells where both configs agree on "kept the init" vs "accepted refinement").

Run on the real TPU:   python scripts/grid_sdf_study.py
Writes docs/grid_sdf_study.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = int(os.environ.get("IHMR_GRID_STUDY_SEEDS", "8"))
BATCH = int(os.environ.get("IHMR_GRID_STUDY_BATCH", "16"))

CONFIGS = {
    "strict": dict(loop_collision_subsample=1, loop_collision_face_subsample=1,
                   loop_collision_lazy_reselect=False),
    "shipping": dict(loop_collision_subsample=2, loop_collision_face_subsample=2,
                     loop_collision_lazy_reselect=True),
    "grid": dict(loop_collision_fast=False, collision_backend="grid",
                 loop_collision_subsample=1, loop_collision_face_subsample=1),
}


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
    groups = sorted({g for s in opt_default for g in s.update_params})

    rows = []
    decisions = {}  # (bench, name) -> list over seeds of (B, n_groups) bool
    for bench in ("standard", "interlocked"):
        for name, over in CONFIGS.items():
            cfg = OptConfig(save_mid_freq=10, **over)
            coll, j3d, dmean, dmax = [], [], [], []
            dec = []
            t0 = time.perf_counter()
            for seed in range(SEEDS):
                params, batch = make_opt_inputs(
                    model, batch=BATCH, seed=seed, interlocked=(bench == "interlocked")
                )
                params = jax.device_put(params, dev)
                batch = jax.device_put(batch, dev)
                out_params, results = optimize_batch(model, params, batch, opt_default, cfg)
                coll.append(float(jnp.mean(results["collision_loss"])))
                j3d.append(float(jnp.mean(results["joints_3d_loss"])))
                depths = np.asarray(results["collision_loss_origin_scale"])
                pen = depths[depths > 0]
                dmean.append(float(pen.mean()) if pen.size else 0.0)
                dmax.append(float(depths.max(axis=1).mean()))
                # per-sample, per-group refinement decision: accepted any
                # snapshot (param changed) vs kept the init
                dec.append(np.stack([
                    np.any(np.asarray(out_params[g]) != np.asarray(params[g]), axis=-1)
                    for g in groups
                ], axis=1))
            dt = time.perf_counter() - t0
            decisions[(bench, name)] = dec
            row = dict(
                bench=bench, config=name,
                coll_mean=float(np.mean(coll)), coll_std=float(np.std(coll)),
                j3d_mean=float(np.mean(j3d)), j3d_std=float(np.std(j3d)),
                depth_mean=float(np.mean(dmean)), depth_max_mean=float(np.mean(dmax)),
                coll_per_seed=[round(c, 5) for c in coll],
                j3d_per_seed=[round(j, 5) for j in j3d],
                accept_frac=float(np.mean([d.mean() for d in dec])),
                seconds=round(dt, 1),
            )
            rows.append(row)
            print(f"{bench:12s} {name:9s}: coll={row['coll_mean']:.4f}+/-{row['coll_std']:.4f} "
                  f"j3d={row['j3d_mean']:.3f}+/-{row['j3d_std']:.3f} "
                  f"pen={row['depth_mean']:.5f} max={row['depth_max_mean']:.5f} "
                  f"accept={row['accept_frac']:.3f} ({dt:.0f}s)", flush=True)

    # paired comparisons vs grid (the reference mechanism)
    print("\npaired per-seed diffs vs the grid (reference-mechanism) runs:")
    summary = {}
    for bench in ("standard", "interlocked"):
        g = next(r for r in rows if r["bench"] == bench and r["config"] == "grid")
        for name in ("strict", "shipping"):
            r = next(x for x in rows if x["bench"] == bench and x["config"] == name)
            d = np.asarray(r["coll_per_seed"]) - np.asarray(g["coll_per_seed"])
            se = float(np.std(d, ddof=1) / np.sqrt(len(d))) if len(d) > 1 else 0.0
            agree = np.mean([
                (a == b).mean()
                for a, b in zip(decisions[(bench, name)], decisions[(bench, "grid")])
            ])
            print(f"  {bench:12s} {name:9s} - grid: coll {d.mean():+.4f} +/- {2*se:.4f}  "
                  f"decision-agreement {agree:.3f}")
            summary[f"{bench}/{name}_minus_grid"] = dict(
                coll_diff_mean=float(d.mean()), coll_diff_2se=float(2 * se),
                decision_agreement=float(agree),
            )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "grid_sdf_study.json")
    with open(out, "w") as f:
        json.dump({"seeds": SEEDS, "batch": BATCH, "rows": rows, "summary": summary}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
