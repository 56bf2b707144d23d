"""Pallas TPU kernel: fused exact point-to-mesh penetration depth.

Replaces the XLA composite in ihmr_tpu.ops.collision (centroid-distance
matmul + approx_min_k + gathered exact refinement) with ONE kernel that
streams triangle tiles through VMEM and keeps a running per-query best —
no (V, F) matrix in HBM, no gathers, EXACT distances (no candidate
approximation at all):

    for each query tile (grid):                      # 128 queries
        for each triangle tile (fori_loop):          # 128 triangles
            d2  = exact point-triangle squared distances  (T x Q, VPU)
            dot = sign test dot(q - closest, face normal) (T x Q)
            best, best_dot = running min merge            (VPU select)
    depth = where(best_dot < 0, sqrt(best), 0)

Per direction this is V x F x ~70 VPU flops ~= 84 MFLOP — arithmetic bound,
the speed-of-light shape for this op on TPU (the MXU cannot help:
point-triangle distance is not a contraction).

TPU layout note: everything is TRANSPOSED — queries are (3, V) and triangles
(9, F) so the 128-wide LANE dimension carries queries/triangles and tiles are
(T_TILE, Q_TILE) = (sublane, lane) aligned; small trailing dims like 3 or 9
as the minor axis would break Mosaic's (8, 128) tiling.

The kernel is forward-only; the gradient comes from jax.custom_vjp with the
analytic derivative d depth / d q = (q - closest)/|q - closest| (the inward
normal direction at the closest point), mesh side detached exactly like
ihmr_tpu.ops.collision (the reference's phi grid is non-differentiable). The
backward pass reuses the kernel's auxiliary direction output — no second
sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 128  # queries per grid step (lane dimension)
T_TILE = 128  # triangles per inner loop step (sublane dimension)

_BIG = 1e30  # python float: jnp scalars would be captured tracers

from ihmr_tpu.ops.collision import _TIE_REL  # noqa: E402  shared tie tolerance


def _tile_d2_dot(q, tri):
    """q: tuple of 3 (1, Q) arrays; tri: (9, T) block.

    Returns (d2, dot, (dx, dy, dz)) of shape (T, Q): exact squared distance,
    inside-sign dot with the face normal, and q - closest components.
    Branchless Ericson region selection (same math as
    ihmr_tpu.ops.collision.point_triangle_closest)."""
    qx, qy, qz = q  # (1, Q)
    ax = tri[0, :][:, None]  # (T, 1)
    ay = tri[1, :][:, None]
    az = tri[2, :][:, None]
    bx = tri[3, :][:, None]
    by = tri[4, :][:, None]
    bz = tri[5, :][:, None]
    cx = tri[6, :][:, None]
    cy = tri[7, :][:, None]
    cz = tri[8, :][:, None]

    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az
    apx, apy, apz = qx - ax, qy - ay, qz - az  # (T, Q)

    d1 = abx * apx + aby * apy + abz * apz
    d2_ = acx * apx + acy * apy + acz * apz
    bpx, bpy, bpz = qx - bx, qy - by, qz - bz
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz
    cpx, cpy, cpz = qx - cx, qy - cy, qz - cz
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_

    eps = 1e-12

    def safe_div(num, den):
        den = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
        return num / den

    v_ab = safe_div(d1, d1 - d3)
    v_ac = safe_div(d2_, d2_ - d6)
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    denom = safe_div(jnp.float32(1.0), va + vb + vc)
    v_f = vb * denom
    w_f = vc * denom

    px = ax + v_f * abx + w_f * acx
    py = ay + v_f * aby + w_f * acy
    pz = az + v_f * abz + w_f * acz
    in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    px = jnp.where(in_bc, bx + w_bc * (cx - bx), px)
    py = jnp.where(in_bc, by + w_bc * (cy - by), py)
    pz = jnp.where(in_bc, bz + w_bc * (cz - bz), pz)
    in_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
    px = jnp.where(in_ac, ax + v_ac * acx, px)
    py = jnp.where(in_ac, ay + v_ac * acy, py)
    pz = jnp.where(in_ac, az + v_ac * acz, pz)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    px = jnp.where(in_ab, ax + v_ab * abx, px)
    py = jnp.where(in_ab, ay + v_ab * aby, py)
    pz = jnp.where(in_ab, az + v_ab * abz, pz)
    in_c = (d6 >= 0) & (d5 <= d6)
    px = jnp.where(in_c, cx + 0 * px, px)
    py = jnp.where(in_c, cy + 0 * py, py)
    pz = jnp.where(in_c, cz + 0 * pz, pz)
    in_b = (d3 >= 0) & (d4 <= d3)
    px = jnp.where(in_b, bx + 0 * px, px)
    py = jnp.where(in_b, by + 0 * py, py)
    pz = jnp.where(in_b, bz + 0 * pz, pz)
    in_a = (d1 <= 0) & (d2_ <= 0)
    px = jnp.where(in_a, ax + 0 * px, px)
    py = jnp.where(in_a, ay + 0 * py, py)
    pz = jnp.where(in_a, az + 0 * pz, pz)

    dx, dy, dz = qx - px, qy - py, qz - pz
    d2 = dx * dx + dy * dy + dz * dz
    nx = aby * acz - abz * acy
    ny = abz * acx - abx * acz
    nz = abx * acy - aby * acx
    dot = dx * nx + dy * ny + dz * nz
    return d2, dot, (dx, dy, dz)


def _kernel(qt_ref, tri_ref, cent_ref, bounds_ref, nt_ref, depth_ref, dir_ref):
    """One grid step: Q_TILE queries (lanes) x all triangle tiles.

    qt_ref:    (3, Q_TILE) query components (VMEM)
    tri_ref:   (9, F_pad) triangle components (VMEM)
    cent_ref:  (4, F_pad) per-triangle centroid cx,cy,cz + circumradius (VMEM)
    bounds_ref:(4, n_tiles) per-triangle-tile bounding spheres cx,cy,cz,r (SMEM)
    nt_ref:    (1, 1) SMEM — true triangle count
    depth_ref: (1, Q_TILE) penetration depth
    dir_ref:   (3, Q_TILE) unit inward direction of the best closest point

    Two-phase exact search:
      pass 1 (cheap, ~10 ops/pair): per-query UPPER bound on the true min
        distance via centroid distance + triangle circumradius;
      pass 2 (exact, ~110 ops/pair): a triangle tile is evaluated only if its
        bounding-sphere LOWER bound beats some query's upper bound — with
        Morton-sorted faces almost every (query-tile, tri-tile) pair prunes,
        leaving the few tiles that can actually contain a query's argmin.
    Exactness is preserved: a pruned tile provably contains no query's
    nearest triangle.
    """
    n_tri = nt_ref[0, 0]
    num_t_tiles = tri_ref.shape[1] // T_TILE
    q = (qt_ref[0:1, :], qt_ref[1:2, :], qt_ref[2:3, :])
    qx, qy, qz = q

    # NOTE: a cheap centroid-distance pre-pass establishing per-query upper
    # bounds was measured (v5e, B=128) to cost more than its extra pruning
    # recovers — the incremental best below converges within a few tiles, and
    # tile-level pruning is limited by query-tile spatial spread, not bound
    # quality. cent_ref is kept in the signature for future hierarchical
    # variants but unused.
    del cent_ref

    def scoped(best_ref):
        # best_ref rows: 0 best_d2, 1 best_dot, 2..4 (q - closest) components
        best_ref[0:1, :] = jnp.full((1, Q_TILE), _BIG, jnp.float32)
        best_ref[1:5, :] = jnp.zeros((4, Q_TILE), jnp.float32)

        def compute_tile(t):
            tri = tri_ref[:, pl.ds(t * T_TILE, T_TILE)]  # (9, T)
            d2, dot, (dx, dy, dz) = _tile_d2_dot(q, tri)  # (T, Q)
            t_ids = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, Q_TILE), 0) + t * T_TILE
            d2 = jnp.where(t_ids < n_tri, d2, _BIG)

            # TIE-SET pseudonormal aggregation (round-5 fix): the closest
            # point can lie on a silhouette edge/vertex shared by front- and
            # back-facing triangles whose fp32 d2 differ by last-ulp noise —
            # exact-equality ties miss them and the single winner's normal
            # gives the WRONG inside sign (points 0.1 outside a curled hand
            # read as 0.1 deep; see ops/collision.py::_TIE_REL). Aggregate
            # dot over every triangle within a relative d2 tolerance, both
            # WITHIN the tile and ACROSS tiles (a strictly better tile
            # replaces the accumulator; a tying tile adds its dot-sum).
            tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, Q)
            is_min = d2 <= tile_min * (1.0 + _TIE_REL) + 1e-12
            pick = jnp.where(is_min, 1.0, 0.0)
            norm = jnp.maximum(jnp.sum(pick, axis=0, keepdims=True), 1.0)
            tile_dot = jnp.sum(jnp.where(is_min, dot, 0.0), axis=0, keepdims=True) / norm
            tile_dx = jnp.sum(jnp.where(is_min, dx, 0.0), axis=0, keepdims=True) / norm
            tile_dy = jnp.sum(jnp.where(is_min, dy, 0.0), axis=0, keepdims=True) / norm
            tile_dz = jnp.sum(jnp.where(is_min, dz, 0.0), axis=0, keepdims=True) / norm

            best_d2 = best_ref[0:1, :]
            better = tile_min < best_d2 * (1.0 - _TIE_REL)
            tied = jnp.logical_and(
                jnp.logical_not(better), tile_min <= best_d2 * (1.0 + _TIE_REL) + 1e-12
            )
            best_ref[0:1, :] = jnp.where(
                better, tile_min, jnp.minimum(best_d2, jnp.where(tied, tile_min, _BIG))
            )
            for row, val in ((1, tile_dot), (2, tile_dx), (3, tile_dy), (4, tile_dz)):
                cur = best_ref[row : row + 1, :]
                best_ref[row : row + 1, :] = jnp.where(
                    better, val, jnp.where(tied, cur + val, cur)
                )

        def body(t, _):
            cxt = bounds_ref[0, t]
            cyt = bounds_ref[1, t]
            czt = bounds_ref[2, t]
            rt = bounds_ref[3, t]
            ddx = qx - cxt
            ddy = qy - cyt
            ddz = qz - czt
            lb = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz) - rt  # (1, Q)
            lb = jnp.maximum(lb, 0.0)
            # tile may contain some query's argmin only if its lower bound
            # beats that query's current best distance
            needed = jnp.max(best_ref[0:1, :] - lb * lb) >= 0.0

            @pl.when(needed)
            def _():
                compute_tile(t)

            return 0

        jax.lax.fori_loop(0, num_t_tiles, body, 0)

        best_d2 = best_ref[0:1, :]
        dist = jnp.sqrt(jnp.maximum(best_d2, 1e-12))
        inside = best_ref[1:2, :] < 0
        depth_ref[:, :] = jnp.where(inside, dist, 0.0)
        scale = jnp.where(inside, 1.0 / dist, 0.0)
        dir_ref[0:1, :] = best_ref[2:3, :] * scale
        dir_ref[1:2, :] = best_ref[3:4, :] * scale
        dir_ref[2:3, :] = best_ref[4:5, :] * scale

    pl.run_scoped(scoped, pltpu.VMEM((5, Q_TILE), jnp.float32))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _forward(query: jnp.ndarray, tri_flat: jnp.ndarray):
    """query (V, 3) fp32; tri_flat (F, 9) fp32 -> (depth (V,), dirs (V, 3))."""
    V = query.shape[0]
    F = tri_flat.shape[0]
    Vp = _round_up(V, Q_TILE)
    Fp = _round_up(F, T_TILE)
    n_tiles = Fp // T_TILE
    qT = query.T.astype(jnp.float32)
    # pad queries by REPEATING the first query: duplicates are sliced off and
    # (unlike far-away pad values) do not poison the tile-pruning bound
    qt = jnp.concatenate([qT, jnp.broadcast_to(qT[:, :1], (3, Vp - V))], axis=1)
    tT = tri_flat.T.astype(jnp.float32)
    # pad triangles by repeating the first triangle (masked out by n_tri in
    # the kernel; keeps the last tile's bounding sphere tight and valid)
    tt = jnp.concatenate([tT, jnp.broadcast_to(tT[:, :1], (9, Fp - F))], axis=1)
    nt = jnp.asarray([[F]], jnp.int32)

    # per-tile bounding spheres over all 3 triangle vertices
    tiles = tt.reshape(9, n_tiles, T_TILE)
    vx = jnp.stack([tiles[0], tiles[3], tiles[6]], 0)  # (3, n_tiles, T)
    vy = jnp.stack([tiles[1], tiles[4], tiles[7]], 0)
    vz = jnp.stack([tiles[2], tiles[5], tiles[8]], 0)
    cx = (vx.min((0, 2)) + vx.max((0, 2))) * 0.5  # (n_tiles,)
    cy = (vy.min((0, 2)) + vy.max((0, 2))) * 0.5
    cz = (vz.min((0, 2)) + vz.max((0, 2))) * 0.5
    r = jnp.sqrt(
        (
            (vx - cx[None, :, None]) ** 2
            + (vy - cy[None, :, None]) ** 2
            + (vz - cz[None, :, None]) ** 2
        ).max((0, 2))
    )
    bounds = jnp.stack([cx, cy, cz, r], 0)  # (4, n_tiles)

    # per-TRIANGLE centroid + circumradius for the pass-1 upper bound
    tcx = (tt[0] + tt[3] + tt[6]) / 3.0  # (Fp,)
    tcy = (tt[1] + tt[4] + tt[7]) / 3.0
    tcz = (tt[2] + tt[5] + tt[8]) / 3.0
    tr2 = jnp.maximum(
        (tt[0] - tcx) ** 2 + (tt[1] - tcy) ** 2 + (tt[2] - tcz) ** 2,
        jnp.maximum(
            (tt[3] - tcx) ** 2 + (tt[4] - tcy) ** 2 + (tt[5] - tcz) ** 2,
            (tt[6] - tcx) ** 2 + (tt[7] - tcy) ** 2 + (tt[8] - tcz) ** 2,
        ),
    )
    cent = jnp.stack([tcx, tcy, tcz, jnp.sqrt(tr2)], 0)  # (4, Fp)

    interpret = jax.devices()[0].platform != "tpu"  # CPU tests use interpreter
    depth, dirs = pl.pallas_call(
        _kernel,
        grid=(Vp // Q_TILE,),
        in_specs=[
            pl.BlockSpec((3, Q_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_tiles), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Q_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
            jax.ShapeDtypeStruct((3, Vp), jnp.float32),
        ],
        interpret=interpret,
    )(qt, tt, cent, bounds, nt)
    return depth[0, :V], dirs[:, :V].T


@jax.custom_vjp
def penetration_depth_pallas(query: jnp.ndarray, tri_flat: jnp.ndarray) -> jnp.ndarray:
    depth, _dirs = _forward(query, tri_flat)
    return depth


# residual = dirs (the analytic depth gradient direction); the triangle input
# gets a zero cotangent (mesh side detached, like ops.collision).
def _vjp_fwd(query, tri_flat):
    depth, dirs = _forward(query, tri_flat)
    return depth, (dirs, tri_flat.shape)


def _vjp_bwd(res, g):
    dirs, tri_shape = res
    dq = g[:, None] * dirs
    return dq, jnp.zeros(tri_shape, jnp.float32)


penetration_depth_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Fast nearest-centroid kernel (the in-loop collision variant).
#
# The XLA "fast" path still materializes a (V, F) ranking matrix in HBM —
# memory-bound at ~8 ms per step. This kernel streams centroid tiles through
# VMEM and emits only each query's argmin triangle INDEX (~10 VPU ops/pair,
# nothing materialized); the single-triangle exact refinement happens as a
# tiny XLA epilogue (gather of V rows).


def _nearest_kernel(qt_ref, cent_ref, nt_ref, idx_ref):
    """One grid instance = one SAMPLE: loops over query tiles internally
    (per-instance Mosaic overhead dominates tiny kernels — measured ~10 us
    per instance — so fewer, fatter instances win).

    qt_ref (3, V_pad); cent_ref (4, F_pad) rows cx,cy,cz,|c|^2;
    nt_ref (1,1) SMEM; idx_ref (1, V_pad) f32 argmin triangle index."""
    n_tri = nt_ref[0, 0]
    num_t_tiles = cent_ref.shape[1] // T_TILE
    num_q_tiles = qt_ref.shape[1] // Q_TILE

    def q_body(i, _):
        qsl = pl.ds(i * Q_TILE, Q_TILE)
        qx = qt_ref[0:1, qsl]
        qy = qt_ref[1:2, qsl]
        qz = qt_ref[2:3, qsl]

        def body(t, carry):
            best_rank, best_idx = carry
            sl = pl.ds(t * T_TILE, T_TILE)
            cx = cent_ref[0, sl][:, None]  # (T, 1)
            cy = cent_ref[1, sl][:, None]
            cz = cent_ref[2, sl][:, None]
            c2 = cent_ref[3, sl][:, None]
            # rank = |c|^2 - 2 q.c  (per-query |q|^2 is rank-invariant)
            rank = c2 - 2.0 * (cx * qx + cy * qy + cz * qz)  # (T, Q)
            t_ids = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, Q_TILE), 0) + t * T_TILE
            rank = jnp.where(t_ids < n_tri, rank, _BIG)

            tile_min = jnp.min(rank, axis=0, keepdims=True)  # (1, Q)
            is_min = rank <= tile_min
            pick = jnp.where(is_min, 1.0, 0.0)
            norm = jnp.maximum(jnp.sum(pick, axis=0, keepdims=True), 1.0)
            tile_idx = (
                jnp.sum(
                    jnp.where(is_min, t_ids.astype(jnp.float32), 0.0), axis=0, keepdims=True
                )
                / norm
            )
            better = tile_min < best_rank
            best_rank = jnp.where(better, tile_min, best_rank)
            best_idx = jnp.where(better, tile_idx, best_idx)
            return best_rank, best_idx

        init = (
            jnp.full((1, Q_TILE), _BIG, jnp.float32),
            jnp.zeros((1, Q_TILE), jnp.float32),
        )
        _, best_idx = jax.lax.fori_loop(0, num_t_tiles, body, init)
        idx_ref[0:1, qsl] = best_idx
        return 0

    jax.lax.fori_loop(0, num_q_tiles, q_body, 0)


def nearest_centroid_pallas(query: jnp.ndarray, centroid: jnp.ndarray) -> jnp.ndarray:
    """query (V, 3), centroid (F, 3) -> (V,) int32 nearest-centroid index."""
    V = query.shape[0]
    F = centroid.shape[0]
    Vp = _round_up(V, Q_TILE)
    Fp = _round_up(F, T_TILE)
    qT = query.T.astype(jnp.float32)
    qt = jnp.concatenate([qT, jnp.broadcast_to(qT[:, :1], (3, Vp - V))], axis=1)
    cT = centroid.T.astype(jnp.float32)
    cT = jnp.concatenate([cT, jnp.broadcast_to(cT[:, :1], (3, Fp - F))], axis=1)
    c2 = jnp.sum(cT * cT, axis=0, keepdims=True)  # (1, Fp)
    cent = jnp.concatenate([cT, c2], axis=0)  # (4, Fp)
    nt = jnp.asarray([[F]], jnp.int32)

    interpret = jax.devices()[0].platform != "tpu"
    idx = pl.pallas_call(
        _nearest_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        interpret=interpret,
    )(qt, cent, nt)
    return idx[0, :V].astype(jnp.int32)


def pair_depths_pallas(
    right_verts: jnp.ndarray,  # (778, 3)
    left_verts: jnp.ndarray,  # (778, 3)
    faces_right: jnp.ndarray,  # (F, 3)
    faces_left: jnp.ndarray,  # (F, 3)
) -> jnp.ndarray:
    """(1556,) raw penetration depths (right-into-left then left-into-right),
    drop-in for ops.collision._pair_depths."""
    lv = jax.lax.stop_gradient(left_verts)
    rv = jax.lax.stop_gradient(right_verts)
    tri_l = lv[faces_left].reshape(-1, 9)
    tri_r = rv[faces_right].reshape(-1, 9)
    d_r = penetration_depth_pallas(right_verts, tri_l)
    d_l = penetration_depth_pallas(left_verts, tri_r)
    return jnp.concatenate([d_r, d_l], axis=0)
