"""Ablation profile of the fused IHMR-OPT step on the current jax backend.

Splits the per-step cost into: MANO decode (forward), full loss gradient
with / without the in-loop collision term, and the fused scan step
(gradient + masked Adam + running-best bookkeeping). Run on the real TPU:

    python scripts/profile_step.py [batch]

Results feed docs/PERFORMANCE.md ("known remaining headroom").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(os.environ.get("IHMR_PROFILE_ITERS", "20"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.losses import losses as L
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default
    from ihmr_tpu.refine.opt_engine import (
        compute_losses,
        forward,
        run_all_stages_fused,
    )
    from ihmr_tpu.refine.schedule import OPT_DEFAULT_LOSS_WEIGHTS

    dev = jax.devices()[0]
    print(f"device: {dev}  batch={BATCH}  iters={ITERS}", flush=True)

    model = synthetic_mano_model()
    params, batch = make_opt_inputs(model, batch=BATCH, seed=0)
    model, params, batch = jax.device_put((model, params, batch), dev)
    cfg = OptConfig(save_mid_freq=10)
    w = dict(OPT_DEFAULT_LOSS_WEIGHTS)

    def timeit(name, body):
        """Time `body(params) -> scalar` amortized inside one lax.scan —
        per-call dispatch over the device tunnel (~1.5 ms) would otherwise
        swamp millisecond kernels."""

        @jax.jit
        def looped(p):
            def step(carry, _):
                # tiny carry-dependence keeps XLA from hoisting the body
                pj = {k: v + 1e-20 * carry for k, v in p.items()}
                return body(pj), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
            return out

        jax.block_until_ready(looped(params))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(looped(params))
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:42s} {ms:8.2f} ms", flush=True)
        return ms

    # 1. decode only (fwd)
    t_fwd = timeit(
        "decode forward",
        lambda p: sum(jnp.mean(x) for x in forward(model, p)),
    )

    # 2. losses without collision, fwd+bwd
    def loss_nocoll(p):
        _, _, joints3d, joints2d = forward(model, p)
        j2d, _ = L.joints_2d_loss(
            batch.init_joints_2d[:, :, :2], joints2d, batch.init_joints_2d[:, :, 2:3]
        )
        j3d, _ = L.joints_3d_loss(
            batch.init_joints_3d[:, :, :3], joints3d, batch.init_joints_3d[:, :, 3:4]
        )
        tr = L.hand_trans_loss(
            batch.init_hand_trans_j[:, :, :3], p["trans"], batch.init_hand_trans_j[:, :, 3:4]
        )
        sh, _ = L.shape_reg_loss(jnp.concatenate([p["right_shape"], p["left_shape"]], 1))
        fr, _ = L.finger_reg_loss(joints3d)
        return (
            j2d * w["joints_2d_loss"]
            + j3d * w["joints_3d_loss"]
            + tr * w["trans_loss_weight"]
            + sh * w["shape_reg_loss_weight"]
            + fr * w["finger_reg_loss_weight"]
        )

    t_nocoll = timeit(
        "grad(losses w/o collision)",
        lambda p: jnp.mean(jax.grad(loss_nocoll)(p)["trans"]),
    )

    # 3. full in-loop gradient at each subsample level
    t_full = {}
    for sub in (1, 2, 4):
        c = OptConfig(save_mid_freq=10, loop_collision_subsample=sub)
        t_full[sub] = timeit(
            f"grad(full in-loop losses, sub={sub})",
            lambda p, _c=c: jnp.mean(
                jax.grad(
                    lambda q: compute_losses(model, q, batch, w, _c, in_loop=True)[0]
                )(p)["trans"]
            ),
        )

    # 4. fused stage step (grad + masked Adam + running-best), amortized
    import dataclasses

    strategy = tuple(dataclasses.replace(s, epoch=100) for s in opt_default[:1])
    t_fused = {}
    # (vertex_sub, face_sub); (8, 8) ~ collision mostly ablated, same program
    # shape. NOTE: sub=64 reproducibly faults the v5e (13-vertex collision
    # tensors inside the grad scan) — do not use it as the ablation point.
    for sub, fsub in ((2, 1), (2, 2), (2, 4), (8, 8)):
        cfg2 = OptConfig(
            save_mid_freq=10,
            loop_collision_subsample=sub,
            loop_collision_face_subsample=fsub,
        )
        fused = jax.jit(
            lambda p, _c=cfg2: run_all_stages_fused(model, p, batch, strategy, _c)
        )
        out = fused(params)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = max(1, ITERS // 10)
        for _ in range(reps):
            out = fused(params)
        jax.block_until_ready(out)
        t_fused[(sub, fsub)] = (time.perf_counter() - t0) / reps / 101 * 1000
        print(f"fused step, sub={sub} fsub={fsub:<18d} {t_fused[(sub, fsub)]:8.2f} ms", flush=True)

    # NOTE: ablation deltas are not strictly additive — XLA fuses/DCEs across
    # component boundaries — but the fused-step pair shares one program
    # structure, so its delta isolates the in-scan collision cost well.
    print("\n--- split (batch %d, fused step %.2f ms) ---" % (BATCH, t_fused[(2, 1)]))
    print(f"decode fwd (standalone)      {t_fwd:6.2f} ms")
    print(f"in-scan collision (sub=2)    {t_fused[(2, 1)] - t_fused[(8, 8)]:6.2f} ms")
    print(f"decode bwd+losses+adam+best  {t_fused[(8, 8)] - t_fwd:6.2f} ms")


if __name__ == "__main__":
    main()
