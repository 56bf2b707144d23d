"""Escalation study (round 4, VERDICT item 1): does two-pass grid
escalation close the measured deep-interlock residual-collision gap vs the
reference's 32^3 grid mechanism — at shipping speed on clean batches?

Protocol: PAIRED per-seed full opt_default refinements on the standard and
adversarial-interlocked benchmarks, same seeds across configs:

  shipping   the fast default, no escalation (the round-3 baseline)
  esc        escalate_collision=ESC_THRESHOLD over the shipping config
             (refine/escalation.py: flagged samples re-refine from init
             with the grid in-loop backend; keep-best merge)
  esc_fast   escalation whose grid PASS uses the fast-build knobs
             (grid_face_subsample=2, grid_num_candidates=4)
  grid       the reference mechanism for the whole batch (the quality
             anchor the gap is measured against; ~25x cost)

Reported per cell: final exact collision (mean + per-seed), GT joints_3d,
escalated-sample fraction, wall seconds. The headline number is
   esc residual collision / grid residual collision   (target <= ~2x)
on the interlocked benchmark, plus the esc-vs-shipping overhead on the
STANDARD benchmark (target ~0: clean batches must not pay for the grid).

Run on the real TPU:
    python scripts/escalation_study.py
Env: IHMR_ESC_SEEDS (16), IHMR_ESC_BATCH (16), IHMR_ESC_THRESHOLD (0.5).
Writes docs/escalation_study.json.
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

SEEDS = int(os.environ.get("IHMR_ESC_SEEDS", "16"))
BATCH = int(os.environ.get("IHMR_ESC_BATCH", "16"))
THRESHOLD = float(os.environ.get("IHMR_ESC_THRESHOLD", "0.5"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch

    configs = {
        "shipping": dict(),
        "esc": dict(escalate_collision=THRESHOLD),
        "esc_fast": dict(
            escalate_collision=THRESHOLD,
            grid_face_subsample=2,
            grid_num_candidates=4,
        ),
        # round-5 shipping candidate: warm-started half-length grid pass
        # over pass-1's output with the focused K=1 fast build at res 24
        # (the measured escalation_bench frontier; VERDICT r4 item 2c)
        "esc_warm": dict(
            escalate_collision=THRESHOLD,
            grid_face_subsample=2,
            grid_num_candidates=1,
            grid_focus=True,
            grid_res=24,
            escalate_warm_start=0.5,
        ),
        "grid": dict(
            loop_collision_fast=False,
            collision_backend="grid",
            loop_collision_subsample=1,
            loop_collision_face_subsample=1,
        ),
    }

    dev = jax.devices()[0]
    print(f"device: {dev}  seeds={SEEDS} batch={BATCH} thr={THRESHOLD}", flush=True)
    model = jax.device_put(synthetic_mano_model(), dev)

    rows = []
    for bench in ("standard", "interlocked"):
        for name, over in configs.items():
            cfg = OptConfig(save_mid_freq=10, **over)
            coll, j3d, esc_frac = [], [], []
            t0 = time.perf_counter()
            for seed in range(SEEDS):
                params, batch = make_opt_inputs(
                    model, batch=BATCH, seed=seed, interlocked=(bench == "interlocked")
                )
                params = jax.device_put(params, dev)
                batch = jax.device_put(batch, dev)
                _, results = optimize_batch(model, params, batch, opt_default, cfg)
                coll.append(float(jnp.mean(results["collision_loss"])))
                j3d.append(float(jnp.mean(results["joints_3d_loss"])))
                esc_frac.append(
                    float(np.mean(results["escalated"]))
                    if "escalated" in results
                    else 0.0
                )
            dt = time.perf_counter() - t0
            row = dict(
                bench=bench, config=name,
                coll_mean=float(np.mean(coll)), coll_std=float(np.std(coll)),
                j3d_mean=float(np.mean(j3d)), j3d_std=float(np.std(j3d)),
                esc_frac=float(np.mean(esc_frac)),
                coll_per_seed=[round(c, 5) for c in coll],
                j3d_per_seed=[round(j, 5) for j in j3d],
                seconds=round(dt, 1),
            )
            rows.append(row)
            print(
                f"{bench:12s} {name:9s}: coll={row['coll_mean']:.4f}+/-{row['coll_std']:.4f} "
                f"j3d={row['j3d_mean']:.4f} esc={row['esc_frac']:.3f} ({dt:.0f}s)",
                flush=True,
            )

    # paired headline ratios
    summary = {}
    for bench in ("standard", "interlocked"):
        by = {r["config"]: r for r in rows if r["bench"] == bench}
        g, s = by["grid"], by["shipping"]
        for nm in ("esc", "esc_fast", "esc_warm"):
            r = by[nm]
            d = np.asarray(r["coll_per_seed"]) - np.asarray(g["coll_per_seed"])
            se = float(np.std(d, ddof=1) / np.sqrt(len(d))) if len(d) > 1 else 0.0
            summary[f"{bench}/{nm}_minus_grid"] = dict(
                coll_diff_mean=float(d.mean()),
                coll_diff_2se=float(2 * se),
                coll_ratio=float(r["coll_mean"] / max(g["coll_mean"], 1e-9)),
                seconds_vs_shipping=float(r["seconds"] / max(s["seconds"], 1e-9)),
            )
            print(
                f"{bench:12s} {nm:9s} - grid: coll {d.mean():+.4f} +/- {2*se:.4f} "
                f"(ratio {summary[f'{bench}/{nm}_minus_grid']['coll_ratio']:.2f}x, "
                f"time vs shipping {summary[f'{bench}/{nm}_minus_grid']['seconds_vs_shipping']:.2f}x)",
                flush=True,
            )

    out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "docs", "escalation_study.json")
    with open(out, "w") as f:
        json.dump(
            {"seeds": SEEDS, "batch": BATCH, "threshold": THRESHOLD,
             "rows": rows, "summary": summary},
            f, indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
