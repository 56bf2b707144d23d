"""Measured reference-vs-rebuild anchor on the SAME hardware (host CPU).

BASELINE.md's `vs_baseline` was an analytical A100 estimate (the reference
cannot run its CUDA SDF here). This script produces a MEASURED anchor
instead: the reference's actual ``OptimizeModel.optimize()`` (torch CPU,
python-loop Adam; collision stubbed to zero both sides) against our fused
engine on the same host CPU and the same inputs/schedule. It reports
hands/sec for both and the speedup — an apples-to-apples engine comparison
(decode + losses + optimizer + snapshot selection), independent of the TPU.

    python scripts/ref_cpu_bench.py [batch] [steps-per-stage]
"""

import contextlib
import os
import sys
import time
import types
from types import SimpleNamespace

# CPU-only run: the axon TPU plugin ignores JAX_PLATFORMS, so also set
# JAX_PLATFORM_NAME and pin via jax.config IMMEDIATELY after the first jax
# import, BEFORE any jax.devices() call initializes the backend registry
# (same ordering as tests/conftest.py; doing the config update later leaves
# the axon platform active and pallas tries to lower for TPU on CPU).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
EPOCH = int(sys.argv[2]) if len(sys.argv) > 2 else 300


def main():
    import numpy as np
    import torch

    import test_ref_e2e_opt as h  # reuse the harness from the parity test

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model

    # schedule: the opt_default shape (4 stages x EPOCH steps) but
    # collision-free (the CUDA SDF cannot run here; zero both sides)
    stages = []
    for groups in (
        ["pred_hand_trans"],
        ["pred_left_orient", "pred_right_orient"],
        ["pred_right_pose_params", "pred_left_pose_params"],
        ["pred_right_shape_params", "pred_left_shape_params"],
    ):
        stages.append(
            dict(
                update_params=groups,
                loss_weights=dict(h._WEIGHTS),
                lr=1e-3,
                epoch=EPOCH,
                filter_loss=[("joints_3d_loss_p", "+0")],
                select_loss="joints_3d_loss_p",
            )
        )
    h._REF_STAGES.clear()
    h._REF_STAGES.extend(stages)
    h._EPOCH = EPOCH
    h._FREQ = 10  # snapshot cadence of bash/optimize.sh:11

    model = synthetic_mano_model()
    params, batch = make_opt_inputs(model, batch=BATCH, seed=0)

    # ---- reference (torch CPU)
    gen = h.ref_env.__wrapped__  # the undecorated fixture generator
    it = gen()
    ref_env = next(it)
    try:
        ref = h._build_ref_model(ref_env, BATCH)
        ref.set_input(h._ref_input_from_batch(params, batch))
        ref.init_optimize()
        t0 = time.perf_counter()
        ref.optimize(iter_id=0, num_iter=1)
        t_ref = time.perf_counter() - t0
    finally:
        with contextlib.suppress(StopIteration):
            next(it)
    n_steps = 4 * (EPOCH + 1)
    ref_hps = BATCH / t_ref
    print(f"reference torch-CPU OPT: {t_ref:.1f}s for batch {BATCH} "
          f"({n_steps} steps, {1e3 * t_ref / n_steps:.1f} ms/step) "
          f"-> {ref_hps:.2f} hands/sec")

    # ---- ours (jax CPU, same schedule)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ihmr_tpu.refine.opt_engine import OptConfig, optimize_batch

    cfg = OptConfig(save_mid_freq=h._FREQ)
    strategy = h._our_stages()
    out, _ = optimize_batch(model, params, batch, strategy, cfg)  # compile
    jax.block_until_ready(out["trans"])
    t0 = time.perf_counter()
    out, _ = optimize_batch(model, params, batch, strategy, cfg)
    jax.block_until_ready(out["trans"])
    t_ours = time.perf_counter() - t0
    ours_hps = BATCH / t_ours
    print(f"rebuild jax-CPU OPT:     {t_ours:.1f}s "
          f"({1e3 * t_ours / n_steps:.1f} ms/step) -> {ours_hps:.2f} hands/sec")
    print(
        f"apples-to-apples: SAME schedule ({n_steps} steps), SAME inputs, "
        f"BOTH collision-free (the reference's CUDA SDF cannot run here; our "
        f"engine statically skips the kernel at collision weight 0). "
        f"per-step ratio ours/ref: {t_ref / t_ours:.2f}x "
        f"(XLA:CPU is not the design point; see bench.py for the TPU number)."
    )


if __name__ == "__main__":
    main()
