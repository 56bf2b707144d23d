"""Micro-benchmark of the per-block collision-payload REBUILD variants.

The round-4 stage traces (trace_stage.py) show the block-boundary payload
rebuild costs ~0.9-1.9 ms at B=128 — amortized ~90-190 us/step, a shared
floor under EVERY hoisted stage (the lean steps themselves are 70-280 us).
Its two dominant device ops are the per-direction fused rank+argmin
(iota_reduce_fusion, ~126 us each) and the selected-triangle position
gather (~155 us each). This script times isolated variants so the engine
change is measured, not guessed:

  rank2   two per-direction nearest-face rank+argmin calls (current)
  rank1   ONE merged (2B)-batch call (concat amortizes per block now, not
          per step — the old per-STEP merge was a measured negative,
          ops/collision.py::pair_depths_at)
  tri_gather   (B, V) row gather from per-sample (F, 9) tri arrays (current)
  tri_onehot   one-hot (V, F) bf16 selection MATMUL against (F, 9) tris:
          the one-hot is generated from iota==idx (never read from HBM);
          if XLA fuses the generation into the dot operand this replaces a
          thin-row gather with an MXU pass
  tri_gather2b one merged (2B) gather

Usage (real TPU):  python scripts/rebuild_bench.py [--batch 128]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--fsub", type=int, default=2)
    ap.add_argument("--sub", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.ops.collision import nearest_face_indices, pair_indices, pair_tris_at
    from ihmr_tpu.refine.opt_engine import forward, params_from_init

    dev = jax.devices()[0]
    print(f"device: {dev}  batch={args.batch} sub={args.sub} fsub={args.fsub}")
    model = synthetic_mano_model()
    params, _ = make_opt_inputs(model, batch=args.batch, seed=0)
    model, params = jax.device_put((model, params), dev)
    rv, lv, _, _ = jax.jit(lambda p: forward(model, p))(params)
    q_r, q_l = rv[:, :: args.sub], lv[:, :: args.sub]
    faces_r = model.faces[:: args.fsub]
    faces_l = model.faces[:, ::-1][:: args.fsub]
    B, V = q_r.shape[0], q_r.shape[1]
    F = faces_r.shape[0]
    print(f"V={V} F={F}")

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*xs))  # compile
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = f(*xs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats
        print(f"{name:14s}: {dt*1e6:9.1f} us")
        return out

    # --- selection ---------------------------------------------------------
    idx_r, idx_l = timeit(
        "rank2", lambda qr, ql, mr, ml: pair_indices(qr, ql, mr, ml, faces_r, faces_l),
        q_r, q_l, rv, lv,
    )

    def rank1(qr, ql, mr, ml):
        # merged (2B): right queries scan LEFT mesh tris, and vice versa.
        # Tri arrays are built per-half with the correct winding, then the
        # batched nearest-centroid rank runs once over 2B samples.
        q = jnp.concatenate([qr, ql], axis=0)  # (2B, V, 3)
        tri_l = ml[:, faces_l]  # (B, F, 3, 3)
        tri_r = mr[:, faces_r]
        cent = jnp.mean(jnp.concatenate([tri_l, tri_r], axis=0), axis=2)  # (2B, F, 3)
        qb = jax.lax.stop_gradient(q).astype(jnp.bfloat16)
        cb = jax.lax.stop_gradient(cent).astype(jnp.bfloat16)
        rank = jnp.sum(cb * cb, axis=-1)[:, None, :] - 2.0 * jnp.einsum(
            "bvc,bfc->bvf", qb, cb
        )
        idx = jnp.argmin(rank, axis=-1)
        return idx[:B], idx[B:]

    timeit("rank1", rank1, q_r, q_l, rv, lv)

    # --- triangle materialization ------------------------------------------
    timeit(
        "tri_gather",
        lambda mr, ml, ir, il: pair_tris_at(mr, ml, faces_r, faces_l, ir, il),
        rv, lv, idx_r, idx_l,
    )

    def tri_onehot(mr, ml, ir, il):
        def one(mesh, faces, idx):
            tri = mesh[:, faces].reshape(mesh.shape[0], -1, 9)  # (B, F, 9)
            hot = (idx[:, :, None] == jnp.arange(tri.shape[1])[None, None, :]).astype(
                jnp.bfloat16
            )
            sel = jnp.einsum(
                "bvf,bfn->bvn", hot, tri.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return sel.reshape(mesh.shape[0], -1, 3, 3)

        return one(ml, faces_l, ir), one(mr, faces_r, il)

    timeit("tri_onehot", tri_onehot, rv, lv, idx_r, idx_l)

    def tri_gather2b(mr, ml, ir, il):
        tri_l = ml[:, faces_l].reshape(ml.shape[0], -1, 9)
        tri_r = mr[:, faces_r].reshape(mr.shape[0], -1, 9)
        tri = jnp.concatenate([tri_l, tri_r], axis=0)  # (2B, F, 9)
        idx = jnp.concatenate([ir, il], axis=0)  # (2B, V)
        sel = jnp.take_along_axis(tri, idx[:, :, None], axis=1)
        return sel[:B].reshape(B, -1, 3, 3), sel[B:].reshape(B, -1, 3, 3)

    timeit("tri_gather2b", tri_gather2b, rv, lv, idx_r, idx_l)

    def tri_onehot_hilo(mr, ml, ir, il):
        # near-f32 one-hot selection: hot has exactly one 1.0 per row, so
        # the only error is bf16 quantization of the tri values; splitting
        # tri = hi + lo (each bf16) and summing two MXU passes recovers
        # ~16 mantissa bits (rel err ~2^-17)
        def one(mesh, faces, idx):
            tri = mesh[:, faces].reshape(mesh.shape[0], -1, 9)
            hi = tri.astype(jnp.bfloat16)
            lo = (tri - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            hot = (idx[:, :, None] == jnp.arange(tri.shape[1])[None, None, :]).astype(
                jnp.bfloat16
            )
            sel = jnp.einsum(
                "bvf,bfn->bvn", hot, hi, preferred_element_type=jnp.float32
            ) + jnp.einsum(
                "bvf,bfn->bvn", hot, lo, preferred_element_type=jnp.float32
            )
            return sel.reshape(mesh.shape[0], -1, 3, 3)

        return one(ml, faces_l, ir), one(mr, faces_r, il)

    timeit("tri_onehot_hilo", tri_onehot_hilo, rv, lv, idx_r, idx_l)

    # --- fused: selection + materialization in one pass ---------------------
    def fused2b(qr, ql, mr, ml):
        ir, il = rank1(qr, ql, mr, ml)
        return tri_onehot_hilo(mr, ml, ir, il)

    timeit("rank+tri fused", fused2b, q_r, q_l, rv, lv)

    # correctness of the hi-lo selection vs the exact f32 gather
    import numpy as np

    ref_r, ref_l = jax.jit(
        lambda mr, ml, ir, il: pair_tris_at(mr, ml, faces_r, faces_l, ir, il)
    )(rv, lv, idx_r, idx_l)
    got_r, got_l = jax.jit(tri_onehot_hilo)(rv, lv, idx_r, idx_l)
    err = max(
        float(jnp.max(jnp.abs(got_r - ref_r))), float(jnp.max(jnp.abs(got_l - ref_l)))
    )
    scale = float(jnp.max(jnp.abs(ref_r)))
    print(f"hi-lo max abs err vs f32 gather: {err:.3e} (coord scale {scale:.3f})")


if __name__ == "__main__":
    main()
