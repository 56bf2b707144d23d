"""Per-stage timing of the OPT refinement schedule (hoisted engine).

The stage-hoisted engine (OptConfig.stage_hoist_decode) runs one compiled
program per stage with the MANO decode partially evaluated against the
stage's frozen parameter groups. This script times each stage's program
separately at the shipping configuration so the next optimization target is
measured, not guessed: after the round-3 hoists, only the pose stage runs
the generic decode — if it dominates, the level-parallel FK experiment
(rejected twice inside the fused nested scans, docs/PERFORMANCE.md) becomes
worth re-running in the pose stage's now-standalone program.

Usage (real TPU, one chip):
    python scripts/stage_bench.py [--batch 128] [--repeats 3] [--cpu]
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--subsample", type=int, default=2)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--no_hoist", action="store_true",
                    help="time the stages with the generic decode instead")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default
    from ihmr_tpu.refine.opt_engine import _run_one_stage_hoisted

    print(f"devices: {jax.devices()}  batch={args.batch}", file=sys.stderr)
    model = synthetic_mano_model()
    params, batch = make_opt_inputs(model, batch=args.batch, seed=0)
    device = jax.devices()[0]
    model = jax.device_put(model, device)
    params = jax.device_put(params, device)
    batch = jax.device_put(batch, device)
    config = OptConfig(
        save_mid_freq=10,
        loop_collision_subsample=args.subsample,
        stage_hoist_decode=not args.no_hoist,
    )

    total = 0.0
    for i, stage in enumerate(opt_default):
        fn = jax.jit(
            lambda p, stage=stage: _run_one_stage_hoisted(
                model, p, batch, stage, config
            )
        )
        t0 = time.perf_counter()
        out = fn(params)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(params)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        steps = stage.epoch + 1
        total += best
        print(
            f"stage {i} ({'+'.join(stage.update_params):28s}) "
            f"{steps:4d} steps: {best*1e3:8.1f} ms "
            f"({best/steps*1e6:7.1f} us/step)  [compile {compile_s:.1f}s]"
        )
        params = out  # chain: each stage times at realistic entry params
    print(f"total (sum of stage programs): {total:.3f} s "
          f"-> {args.batch/total:.1f} hands/sec equivalent (excl. encoder)")


if __name__ == "__main__":
    main()
