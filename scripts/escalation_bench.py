"""Steady-state cost of two-pass grid escalation at serving batch size.

The escalation STUDY (scripts/escalation_study.py) establishes quality; its
wall times are compile-polluted (every config change re-traces the stage
programs). This probe times warm programs only: full opt_default refinement
at B=128 on the standard and interlocked benchmarks, fast default vs
escalated vs escalated-with-fast-grid-build, printing hands/sec, escalated
count, and final exact collision — the quality-speed frontier recorded in
docs/ROUND4.md.

Run on the real TPU:  python scripts/escalation_bench.py
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# comma list of config names to run (default all), e.g.
#   IHMR_ESC_CONFIGS=base,esc_default python scripts/escalation_bench.py
_ONLY = os.environ.get("IHMR_ESC_CONFIGS", "")
_BENCHES = os.environ.get("IHMR_ESC_BENCHES", "standard,interlocked").split(",")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch

    dev = jax.devices()[0]
    print("dev:", dev, flush=True)
    model = jax.device_put(synthetic_mano_model(), dev)
    for bench in _BENCHES:
        params, batch = make_opt_inputs(
            model, batch=128, seed=0, interlocked=(bench == "interlocked")
        )
        params = jax.device_put(params, dev)
        batch = jax.device_put(batch, dev)
        # escalate_fast_build=False so each leg's explicit grid_* knobs
        # reach pass 2 (the round-5 default profile otherwise overrides
        # them; the esc_default leg below measures that shipping profile)
        # (warm start pinned off too — the esc_warm/esc_all legs opt in
        # explicitly; round-5 defaults are warm 0.5 + fast build)
        fast = dict(escalate_collision=0.5, grid_face_subsample=2,
                    grid_num_candidates=1, grid_focus=True,
                    escalate_fast_build=False, escalate_warm_start=0.0)
        for name, kw in (
            ("base", {}),
            # round-4 fast-build profile: K=1 (the K-gather epilogue was
            # ~90% of the build) + focused intersection-box lattice (finer
            # cells where phi is read) + stride-2 surface
            ("esc_fast", dict(fast)),
            # round-5 levers (VERDICT r4 item 2): coarser focused lattice,
            # grid rebuild every k snapshot blocks, warm-started short
            # pass 2, and the combination
            ("esc_r16", dict(fast, grid_res=16)),
            ("esc_r24", dict(fast, grid_res=24)),
            ("esc_k4", dict(fast, reselect_every_blocks=4)),
            ("esc_warm", dict(fast, escalate_warm_start=0.5)),
            ("esc_all", dict(fast, grid_res=24, reselect_every_blocks=4,
                             escalate_warm_start=0.5)),
            # the round-5 SHIPPING default profile: escalate_collision set,
            # everything else OptConfig defaults (kre2 pass 1 / kre1 pass 2,
            # warm 0.5, fast build r24 focused K=1 fsub2)
            ("esc_default", dict(escalate_collision=0.5)),
        ):
            if _ONLY and name not in _ONLY.split(","):
                continue
            cfg = OptConfig(save_mid_freq=10, **kw)
            t0 = time.perf_counter()
            out = optimize_batch(model, params, batch, opt_default, cfg)
            jax.block_until_ready(out[0])
            print(f"{bench} {name}: first {time.perf_counter()-t0:.1f}s", flush=True)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = optimize_batch(model, params, batch, opt_default, cfg)
                jax.block_until_ready(out[0])
                times.append(time.perf_counter() - t0)
            esc = float(out[1].get("escalated", jnp.zeros(1)).sum())
            coll = float(jnp.mean(out[1]["collision_loss"]))
            print(
                f"{bench} {name}: best {min(times):.3f}s -> "
                f"{128/min(times):.1f} hands/sec  esc_n={esc:.0f} coll={coll:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
