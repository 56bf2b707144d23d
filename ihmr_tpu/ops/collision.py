"""SDF-style interpenetration loss between two hand meshes, pure JAX.

Replaces the reference's CUDA ``sdf`` extension (the SDF_ihmr package; see
ref src/models/loss_utils.py:13,34-38,174-193). The reference voxelizes each
hand into a 32^3 signed-distance grid on GPU and trilinearly samples the other
hand's vertices against it — an approximation chosen for GPU rasterization.

TPU-first redesign — three interchangeable backends behind ``collision_loss``:
  * 'pallas' (default on TPU): the fused EXACT kernel in
    ihmr_tpu.ops.pallas_collision (streams triangle tiles through VMEM,
    nothing materialized, 1e-9 agreement with brute force) — the
    metrics/eval path;
  * 'xla': centroid-ranking matmul (bf16, MXU) + approx_min_k candidates +
    exact point-triangle refinement (fp32, VPU; branchless Ericson) with
    sign from the winning triangle's outward normal — the portable path;
  * num_candidates=1 (the refinement HOT-LOOP variant): single
    nearest-centroid candidate — the reference's own in-loop phi is a coarse
    32^3 grid, so this matches its accuracy class at ~4x the speed.

Everything is static-shaped, differentiable, and ``vmap``s over the batch, so
it fuses inside the refinement ``lax.scan``.

Outputs reproduce the reference triple contract
(ref loss_utils.py:174-193):
    (scalar batch-mean loss,
     per-sample loss (B,),
     per-vertex ORIGIN-SCALE penetration depths (B, 1556))
with the per-vert origin-scale being raw penetration depth in mesh units
(consumed by the collision_ave / collision_max metrics, ref
src/utils/evaluator.py:163-181) and the per-sample loss being the sum of
squared normalized depths with optional GMoF robustifier (the reference
robustifier caps large penetrations during training; exact CUDA semantics are
not recoverable without the closed-source-adjacent package, so the robustifier
here is the standard Geman-McClure x^2/(x^2+rho^2)).

Vertex ordering of the 1556-vector: [right 778 | left 778] — matching the
evaluator's flip-back which swaps halves (ref evaluator.py:118-120).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12
# relative distance^2 tolerance defining the pseudonormal TIE SET in the
# inside tests (penetration_depth K>1 and the pallas kernel): candidates
# within 0.1% of the best squared distance are treated as the same closest
# point (silhouette edge/vertex) and their normals aggregated. fp32 edge
# ties land ~1e-7 apart; genuinely distinct faces at hand scale differ by
# >> 1e-3 relative once the query is off the surface.
_TIE_REL = 1e-3

# frozen-path triangle build strategy (see penetration_depth_at)
import os as _os

_TRI_VIA_MATMUL = _os.environ.get("IHMR_TRI_VIA_MATMUL", "0") == "1"


def point_triangle_closest(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Closest point on triangle(s) to point(s).

    p: (..., 3); tri: (..., 3, 3) [three vertices]. Returns (..., 3).
    Branchless Ericson region test (safe denominators for autodiff).
    """
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe_div(num, den):
        den = jnp.where(jnp.abs(den) < _EPS, jnp.where(den < 0, -_EPS, _EPS), den)
        return num / den

    # candidate closest points for every region
    v_ab = safe_div(d1, d1 - d3)
    p_ab = a + v_ab[..., None] * ab
    v_ac = safe_div(d2, d2 - d6)
    p_ac = a + v_ac[..., None] * ac
    v_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    p_bc = b + v_bc[..., None] * (c - b)
    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    v_f = vb * denom
    w_f = vc * denom
    p_face = a + v_f[..., None] * ab + w_f[..., None] * ac

    # region predicates (applied in priority order, innermost wins last)
    out = p_face
    in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    out = jnp.where(in_bc[..., None], p_bc, out)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    out = jnp.where(in_ac[..., None], p_ac, out)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    out = jnp.where(in_ab[..., None], p_ab, out)
    in_c = (d6 >= 0) & (d5 <= d6)
    out = jnp.where(in_c[..., None], c, out)
    in_b = (d3 >= 0) & (d4 <= d3)
    out = jnp.where(in_b[..., None], b, out)
    in_a = (d1 <= 0) & (d2 <= 0)
    out = jnp.where(in_a[..., None], a, out)
    return out


def penetration_depth(
    query: jnp.ndarray,  # (V, 3)
    mesh_verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3) int, outward winding
    num_candidates: int = 8,
    margin: float = 0.0,
) -> jnp.ndarray:
    """Per-query penetration depth into a closed mesh; 0 outside (or an
    outward shell when ``margin`` > 0 — see _shell_depth). (V,)

    The MESH side is detached (stop_gradient): the reference's CUDA phi-grid
    voxelization is non-differentiable, so its collision gradients only push
    the sampled (penetrating) vertices, never deform the penetrated mesh.
    Matching that here also removes the (V, K)->(F, 3, 3) scatter from the
    VJP — a large win in both compile and step time inside the refinement
    scan. Both hands still receive gradients because each is the query of one
    of the two directions.
    """
    mesh_verts = jax.lax.stop_gradient(mesh_verts)
    tri = mesh_verts[faces]  # (F, 3, 3)
    centroid = jnp.mean(tri, axis=1)  # (F, 3)

    # (V, F) squared distances. Candidate RANKING tolerates low precision, so
    # the matmul runs in bf16 (exact refinement below is fp32); measured on
    # v5e this plus approx_min_k is ~5x faster than fp32 + lax.top_k with a
    # worst-case depth deviation of 2e-4 x hand size.
    qb = query.astype(jnp.bfloat16)
    cb = centroid.astype(jnp.bfloat16)
    c2 = jnp.sum(cb * cb, axis=-1)[None, :]
    qc = qb @ cb.T  # (V, F) matmul on the MXU
    # rank on c^2 - 2 q.c: the per-row q^2 term cannot change the argmin, and
    # dropping it keeps the ranking matrix in bf16 (half the HBM traffic of a
    # materialized fp32 d2 — this op is memory-bound)
    rank = c2 - 2.0 * qc

    # K nearest candidate triangles (static K); approx_min_k is the
    # TPU-native partial reduction (no full sort like lax.top_k). For K=1 a
    # plain argmin fuses into the matmul consumer (no (V, F) materialization)
    # and measures ~2x faster still.
    if num_candidates == 1:
        # K=1 hot-loop path: no inner argmin/take_along at all — profiled on
        # v5e, the K-general epilogue lowered the (V, 1) identity selects to
        # real gather fusions (~480+450+160 us each, per direction, per step:
        # the bulk of the in-loop collision cost; scripts/profile_step.py).
        # Only the one true gather of the winning triangle remains.
        idx = jnp.argmin(rank, axis=-1)  # (V,)
        tri_best = tri.reshape(-1, 9)[idx].reshape(-1, 3, 3)  # (V, 3, 3)
        closest_best = point_triangle_closest(query, tri_best)  # (V, 3)
        diff = query - closest_best
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), _EPS))
        normal = jnp.cross(tri_best[:, 1] - tri_best[:, 0], tri_best[:, 2] - tri_best[:, 0])
        inside = jnp.sum((query - closest_best) * normal, axis=-1) < 0
        return _shell_depth(dist, inside, margin)

    _, idx = jax.lax.approx_min_k(rank, num_candidates)  # (V, K)
    tri_k = tri.reshape(-1, 9)[idx].reshape(idx.shape[0], num_candidates, 3, 3)

    # exact refinement on candidates
    closest = point_triangle_closest(query[:, None, :], tri_k)  # (V, K, 3)
    diff = query[:, None, :] - closest
    dist2 = jnp.sum(diff * diff, axis=-1)  # (V, K)
    d2_best = jnp.min(dist2, axis=-1)  # (V,)
    dist = jnp.sqrt(jnp.maximum(d2_best, _EPS))

    # PSEUDONORMAL inside test over the TIE SET (round-5 fix): when the
    # closest point lies on a silhouette edge/vertex, the adjacent front-
    # and back-facing triangles tie on distance and a single argmin face's
    # normal gives the WRONG sign for up to half the queries — measured as
    # points 0.1 units OUTSIDE a curled hand reading as 0.1 "deep"
    # (197/778 vertices on the round-5 grazing benchmark). Summing
    # dot(q - closest_k, area-weighted normal_k) over every candidate
    # within a relative distance tolerance is the Baerentzen-Aanaes
    # angle-weighted-pseudonormal test restricted to the tie set: the edge
    # case aggregates both adjacent faces, the face case degenerates to
    # the single true face (the tolerance window shrinks with distance, so
    # near-contact depths never mix distinct faces).
    normal_k = jnp.cross(
        tri_k[:, :, 1] - tri_k[:, :, 0], tri_k[:, :, 2] - tri_k[:, :, 0]
    )  # (V, K, 3)
    dot_k = jnp.sum(diff * normal_k, axis=-1)  # (V, K)
    tie = dist2 <= d2_best[:, None] * (1.0 + _TIE_REL) + _EPS
    inside = jnp.sum(jnp.where(tie, dot_k, 0.0), axis=-1) < 0
    return _shell_depth(dist, inside, margin)


def _pair_depths(
    right_verts: jnp.ndarray,  # (778, 3)
    left_verts: jnp.ndarray,  # (778, 3)
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
    num_candidates: int,
    query_subsample: int = 1,
    margin: float = 0.0,
) -> jnp.ndarray:
    """(2*Vq,) raw penetration depths: right verts into left mesh, then
    left verts into right mesh.

    ``query_subsample`` strides the QUERY side only — the mesh side must
    stay full because ``faces`` index the full vertex array (passing a
    strided array as the mesh silently clamps out-of-bounds gathers under
    jit into degenerate triangles; this was a real round-1 bug in the
    subsampled in-loop path, caught by an eager numpy IndexError)."""
    s = query_subsample
    d_r = penetration_depth(right_verts[::s], left_verts, faces_left, num_candidates, margin)
    d_l = penetration_depth(left_verts[::s], right_verts, faces_right, num_candidates, margin)
    return jnp.concatenate([d_r, d_l], axis=0)


def penetration_depth_2level(
    query: jnp.ndarray,  # (V, 3)
    mesh_verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3) int, outward winding, MORTON-SORTED
    group: int = 8,
) -> jnp.ndarray:
    """Hot-loop penetration depth via a 2-level nearest-centroid hierarchy.

    The flat K=1 path ranks every query against every face centroid — a
    (V, F) matrix that the v5e trace shows dominating the fused refinement
    step (materialize + argmin re-read = ~60% of step time at batch 128).
    Faces are Morton-sorted at load (mano/loader.py), so ``group``
    consecutive faces form a spatially tight cluster: rank the V queries
    against the F/group cluster mean-centroids, gather ONLY the winning
    cluster's member centroids, pick the nearest member, then refine exactly
    on that one triangle — (V*F/g + V*g) rank work instead of V*F, ~7x less
    at g=8, with no large intermediate. Same accuracy class as flat
    nearest-centroid (both are coarser than the reference's own in-loop
    32^3 SDF grid; ref src/models/loss_utils.py:174-193); the exact kernel
    still serves the final metrics pass. Quality impact measured nil by
    scripts/quality_study.py (incl. the interlocked-fingers benchmark).
    """
    mesh_verts = jax.lax.stop_gradient(mesh_verts)
    tri = mesh_verts[faces]  # (F, 3, 3)
    centroid = jnp.mean(tri, axis=1)  # (F, 3)
    F = tri.shape[0]
    nc = -(-F // group)  # clusters
    pad = nc * group - F
    if pad:
        centroid_p = jnp.concatenate([centroid, jnp.broadcast_to(centroid[-1:], (pad, 3))], 0)
    else:
        centroid_p = centroid
    cent_g = centroid_p.reshape(nc, group, 3)
    sup = jnp.mean(cent_g, axis=1)  # (nc, 3) cluster representatives

    # level 1: TOP-2 nearest cluster reps (bf16 rank like the flat path).
    # A single cluster errs badly near cluster boundaries (measured: 3.4x
    # loss overestimate on the interlocked benchmark); the second-best
    # cluster recovers almost all of it at negligible cost.
    qb = query.astype(jnp.bfloat16)
    sb = sup.astype(jnp.bfloat16)
    rank1 = jnp.sum(sb * sb, -1)[None, :] - 2.0 * (qb @ sb.T)  # (V, nc)
    c1 = jnp.argmin(rank1, axis=-1)  # (V,)
    masked = jnp.where(
        jax.nn.one_hot(c1, nc, dtype=jnp.bool_), jnp.bfloat16(3.4e38), rank1
    )
    c2 = jnp.argmin(masked, axis=-1)  # (V,)

    # level 2: nearest member centroid within the union of both clusters
    # (fp32, tiny (V, 2*group) work on gathered members)
    cand = jnp.concatenate([cent_g[c1], cent_g[c2]], axis=1)  # (V, 2g, 3)
    diff = query[:, None, :] - cand
    d2 = jnp.sum(diff * diff, axis=-1)  # (V, 2g)
    g_idx = jnp.argmin(d2, axis=-1)  # (V,)
    c_win = jnp.where(g_idx < group, c1, c2)
    f_idx = jnp.minimum(c_win * group + g_idx % group, F - 1)

    # exact refinement on the ONE winning triangle (identical to K=1 path)
    tri_best = tri.reshape(-1, 9)[f_idx].reshape(-1, 3, 3)  # (V, 3, 3)
    closest_best = point_triangle_closest(query, tri_best)  # (V, 3)
    dvec = query - closest_best
    dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, axis=-1), _EPS))
    normal = jnp.cross(tri_best[:, 1] - tri_best[:, 0], tri_best[:, 2] - tri_best[:, 0])
    inside = jnp.sum(dvec * normal, axis=-1) < 0
    return jnp.where(inside, dist, 0.0)


def _pair_depths_2level(
    query_r, query_l, mesh_r, mesh_l, faces_right, faces_left, group
):
    """Queries may be strided; mesh sides must be the FULL vertex arrays."""
    d_r = penetration_depth_2level(query_r, mesh_l, faces_left, group)
    d_l = penetration_depth_2level(query_l, mesh_r, faces_right, group)
    return jnp.concatenate([d_r, d_l], axis=0)


def nearest_face_indices(
    query: jnp.ndarray,  # (V, 3)
    mesh_verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3)
) -> jnp.ndarray:
    """(V,) int32 nearest-centroid face index (the K=1 ranking, selection
    only — no depth). Everything under stop_gradient: selection is a
    discrete decision, never a gradient path."""
    query = jax.lax.stop_gradient(query)
    mesh_verts = jax.lax.stop_gradient(mesh_verts)
    tri = mesh_verts[faces]
    centroid = jnp.mean(tri, axis=1)
    qb = query.astype(jnp.bfloat16)
    cb = centroid.astype(jnp.bfloat16)
    rank = jnp.sum(cb * cb, axis=-1)[None, :] - 2.0 * (qb @ cb.T)
    return jnp.argmin(rank, axis=-1)


def penetration_depth_at(
    query: jnp.ndarray,  # (V, 3)
    mesh_verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3)
    idx: jnp.ndarray,  # (V,) face index per query (e.g. nearest_face_indices)
    margin: float = 0.0,
) -> jnp.ndarray:
    """Penetration depth against the GIVEN face per query — the exact
    point-triangle refinement of the K=1 path with the selection factored
    out. Lets the refinement hot loop reuse a nearest-face selection across
    several steps (the (V, F) rank+argmin dominates the fused step; the
    faces' POSITIONS still track the current mesh every step, only the
    discrete selection is reused). Mesh side detached like all in-loop
    variants."""
    mesh_verts = jax.lax.stop_gradient(mesh_verts)
    # Triangle build as a one-hot SELECTION MATMUL instead of a gather — a
    # MEASURED NEGATIVE RESULT, kept env-gated for the record: the gather of
    # F x 3 12-byte vertex rows runs ~6x off streaming bandwidth (thin rows;
    # traced as the dominant pair of per-step fusions, ~0.31 ms both
    # directions at B=128), and the hoped-for fix — a loop-invariant
    # (F*3, Vm) one-hot matrix times the verts on the MXU at Precision.HIGH
    # — measured 131.5 -> 123.7 hands/sec end-to-end: the 3-pass HIGH
    # product costs more MXU time than the gather costs pipeline time.
    if _TRI_VIA_MATMUL:
        G = jax.nn.one_hot(faces.reshape(-1), mesh_verts.shape[0], dtype=mesh_verts.dtype)
        tri = jnp.matmul(G, mesh_verts, precision=jax.lax.Precision.HIGH).reshape(-1, 9)
    else:
        # same gather shape as the eager K=1 path: build (F, 9) then one
        # 9-wide row gather — gathering (V*3,) 3-wide rows instead was
        # measured ~2x slower end-to-end (TPU gathers want fat rows)
        tri = mesh_verts[faces].reshape(-1, 9)  # (F, 9)
    tri_best = tri[idx].reshape(-1, 3, 3)  # (V, 3, 3)
    closest = point_triangle_closest(query, tri_best)
    diff = query - closest
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), _EPS))
    normal = jnp.cross(tri_best[:, 1] - tri_best[:, 0], tri_best[:, 2] - tri_best[:, 0])
    inside = jnp.sum(diff * normal, axis=-1) < 0
    return _shell_depth(dist, inside, margin)


def pair_indices(
    query_r: jnp.ndarray,  # (B, Vq, 3) possibly-strided right QUERY verts
    query_l: jnp.ndarray,  # (B, Vq, 3)
    mesh_r: jnp.ndarray,  # (B, 778, 3) FULL vertex arrays (faces index these)
    mesh_l: jnp.ndarray,  # (B, 778, 3)
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched nearest-face selections for both directions: (idx_r, idx_l),
    each (B, Vq) int32 — right queries vs FULL left mesh, and vice versa.

    (A merged one-(2B)-call variant was measured slower — see
    pair_depths_at.)"""
    idx_r = jax.vmap(lambda q, m: nearest_face_indices(q, m, faces_left))(
        query_r, mesh_l
    )
    idx_l = jax.vmap(lambda q, m: nearest_face_indices(q, m, faces_right))(
        query_l, mesh_r
    )
    return idx_r, idx_l


def pair_depths_at(
    query_r: jnp.ndarray,  # (B, Vq, 3) possibly-strided right QUERY verts
    query_l: jnp.ndarray,  # (B, Vq, 3)
    mesh_r: jnp.ndarray,  # (B, 778, 3) FULL vertex arrays (faces index these)
    mesh_l: jnp.ndarray,  # (B, 778, 3)
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
    idx_r: jnp.ndarray,  # (B, Vq)
    idx_l: jnp.ndarray,  # (B, Vq)
    margin: float = 0.0,
) -> jnp.ndarray:
    """(B, 2*Vq) depths at frozen face selections (both directions).

    NOTE: merging both directions into one (2B) batched call (shared tri
    build via the winding-sign trick in _penetration_depth_at_signed) was
    MEASURED SLOWER end-to-end, 131.5 -> 108.9 hands/sec: the per-step
    (2B, V, 3) concatenations of queries/meshes/indices cost more than the
    kernel fusion saves. Two per-direction calls stay."""
    d_r = jax.vmap(lambda q, m, i: penetration_depth_at(q, m, faces_left, i, margin))(
        query_r, mesh_l, idx_r
    )
    d_l = jax.vmap(lambda q, m, i: penetration_depth_at(q, m, faces_right, i, margin))(
        query_l, mesh_r, idx_l
    )
    return jnp.concatenate([d_r, d_l], axis=1)


def pair_tris_at(
    mesh_r: jnp.ndarray,  # (B, 778, 3) FULL vertex arrays
    mesh_l: jnp.ndarray,  # (B, 778, 3)
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
    idx_r: jnp.ndarray,  # (B, Vq) nearest-face ids for right queries (vs LEFT mesh)
    idx_l: jnp.ndarray,  # (B, Vq)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize the selected triangles' vertex positions for both
    directions: (tri_r, tri_l), each (B, Vq, 3, 3).

    This is the expensive triangle build (mesh_verts[faces] + row gather —
    the dominant per-step fusion pair when done inside the step); calling it
    once per snapshot block and feeding ``pair_depths_at_tris`` hoists that
    cost out of the hot loop entirely (OptConfig.loop_collision_freeze_
    positions)."""

    def build(mesh, faces, idx):
        tri = jax.lax.stop_gradient(mesh)[faces].reshape(-1, 9)  # (F, 9)
        return tri[idx].reshape(-1, 3, 3)

    tri_r = jax.vmap(lambda m, i: build(m, faces_left, i))(mesh_l, idx_r)
    tri_l = jax.vmap(lambda m, i: build(m, faces_right, i))(mesh_r, idx_l)
    return tri_r, tri_l


def pair_select_tris(
    query_r: jnp.ndarray,  # (B, Vq, 3) possibly-strided right QUERY verts
    query_l: jnp.ndarray,  # (B, Vq, 3)
    mesh_r: jnp.ndarray,  # (B, 778, 3) FULL vertex arrays
    mesh_l: jnp.ndarray,  # (B, 778, 3)
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused per-block payload build: nearest-face selection AND frozen
    triangle-position materialization for both directions in one merged
    (2B)-batch pass — (tri_r, tri_l), each (B, Vq, 3, 3) f32.

    Why one call (round 4): the separate pair_indices + pair_tris_at pair
    builds the (B, F, 3, 3) triangle array from mesh[faces] TWICE (once for
    centroids, once for row selection) and runs every kernel once per
    direction; traced at B=128 the rebuild is ~0.9-1.9 ms per snapshot
    block — an amortized ~90-190 us/step floor under every hoisted stage
    (docs/PERFORMANCE.md round-4 table). Sharing a single tri build across
    centroid rank, argmin, and row selection, and batching both directions
    to (2B), measured 2141 -> ~1040 us isolated (scripts/rebuild_bench.py)
    and is exact: the rank is the same bf16 nearest-centroid formula as
    nearest_face_indices, and the selected POSITIONS are a plain f32 row
    gather (no one-hot-matmul precision games — XLA's dot merger folds the
    hi+lo split back to bf16, measured in rebuild_bench.py).

    IN-ENGINE this is a MEASURED NEGATIVE, kept for the record (like the
    per-STEP direction merge before it, pair_depths_at docstring): XLA
    already CSEs the duplicate mesh[faces] builds inside the jitted payload
    program, so the merge only adds (2B) concat/split copies — stage_bench
    at B=128: trans 204->238, orient 268->330, pose 378->401, shape
    267->327 us/step. Gated off by default (opt_engine._PAYLOAD_FUSED;
    IHMR_PAYLOAD_FUSED=1 to re-measure)."""
    B = query_r.shape[0]
    mr = jax.lax.stop_gradient(mesh_r)
    ml = jax.lax.stop_gradient(mesh_l)
    # one (2B, F, 9) triangle array: right queries scan the LEFT mesh and
    # vice versa, so the left tris stack first
    tri = jnp.concatenate(
        [
            ml[:, faces_left].reshape(B, -1, 9),
            mr[:, faces_right].reshape(B, -1, 9),
        ],
        axis=0,
    )
    q = jax.lax.stop_gradient(jnp.concatenate([query_r, query_l], axis=0))
    cent = (tri[..., 0:3] + tri[..., 3:6] + tri[..., 6:9]) / 3.0  # (2B, F, 3)
    qb = q.astype(jnp.bfloat16)
    cb = cent.astype(jnp.bfloat16)
    rank = jnp.sum(cb * cb, axis=-1)[:, None, :] - 2.0 * jnp.einsum(
        "bvc,bfc->bvf", qb, cb
    )
    idx = jnp.argmin(rank, axis=-1)  # (2B, Vq)
    sel = jnp.take_along_axis(tri, idx[:, :, None], axis=1)  # (2B, Vq, 9) f32
    sel = sel.reshape(2 * B, -1, 3, 3)
    return sel[:B], sel[B:]


def _shell_depth(dist: jnp.ndarray, inside: jnp.ndarray, margin: float) -> jnp.ndarray:
    """Penetration depth with an outward SHELL of ``margin`` mesh units:
    phi = max(0, margin - signed_dist) — margin + dist inside the mesh,
    linearly decaying to 0 at ``margin`` outside it; margin=0 reproduces the
    plain inside-only depth exactly.

    Why (round-4 interlock diagnosis, docs/interlock_diag.json): the
    reference's 32^3 grid field trilinearly SMEARS the surface by ~1 cell
    (~5-10 mm at hand scale), so near-contact vertices feel outward pressure
    BEFORE penetrating and pushed-out vertices are pressed PAST the surface
    instead of resting on it. That field shape — not depth accuracy, which
    the grid is measurably WORSE at (rel-err 0.57 vs 0.26 for K=8) — is what
    resolves deep interlocks: final exact collision 0.199 (grid) vs 2.73
    (near-exact K=8 depths) vs 4.93 (shipping K=1). The shell reproduces the
    smear on the nearest-face path at zero extra kernel cost. In-loop only;
    the final metrics pass always measures true penetration (margin=0)."""
    if margin == 0.0:
        return jnp.where(inside, dist, 0.0)
    signed = jnp.where(inside, -dist, dist)
    return jnp.maximum(margin - signed, 0.0)


def _depth_at_tris_single(
    query: jnp.ndarray, tri_best: jnp.ndarray, margin: float = 0.0
) -> jnp.ndarray:
    """(V, 3) live queries vs (V, 3, 3) PRE-BUILT triangles -> (V,) depths.
    The triangle positions are block-frozen (stop_gradient'd at build); the
    gradient path is the query side only — identical to the per-step variant,
    whose mesh side is detached too (penetration_depth_at)."""
    closest = point_triangle_closest(query, tri_best)
    diff = query - closest
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), _EPS))
    normal = jnp.cross(tri_best[:, 1] - tri_best[:, 0], tri_best[:, 2] - tri_best[:, 0])
    inside = jnp.sum(diff * normal, axis=-1) < 0
    return _shell_depth(dist, inside, margin)


def pair_depths_at_tris(
    query_r: jnp.ndarray,  # (B, Vq, 3)
    query_l: jnp.ndarray,  # (B, Vq, 3)
    tri_r: jnp.ndarray,  # (B, Vq, 3, 3) from pair_tris_at
    tri_l: jnp.ndarray,  # (B, Vq, 3, 3)
    margin: float = 0.0,
) -> jnp.ndarray:
    """(B, 2*Vq) depths of live queries against block-frozen triangles —
    the zero-gather per-step variant of pair_depths_at."""
    fn = lambda q, t: _depth_at_tris_single(q, t, margin)
    d_r = jax.vmap(fn)(query_r, tri_r)
    d_l = jax.vmap(fn)(query_l, tri_l)
    return jnp.concatenate([d_r, d_l], axis=1)


def penetration_depth_fast(
    query: jnp.ndarray,  # (V, 3)
    mesh_verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3)
) -> jnp.ndarray:
    """Single-candidate penetration depth for the refinement hot loop.

    Nearest-centroid triangle via the streaming pallas kernel (nothing
    materialized in HBM), exact point-triangle refinement on that ONE
    triangle as a tiny epilogue. Accuracy class of the reference's 32^3
    in-loop grid; the exact kernel serves the final metrics pass.
    """
    from ihmr_tpu.ops.pallas_collision import nearest_centroid_pallas

    mesh_verts = jax.lax.stop_gradient(mesh_verts)
    tri = mesh_verts[faces]  # (F, 3, 3)
    centroid = jnp.mean(tri, axis=1)
    idx = nearest_centroid_pallas(jax.lax.stop_gradient(query), centroid)  # (V,)
    tri_b = tri[idx]  # (V, 3, 3)
    closest = point_triangle_closest(query, tri_b)  # (V, 3)
    diff = query - closest
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), _EPS))
    normal = jnp.cross(tri_b[:, 1] - tri_b[:, 0], tri_b[:, 2] - tri_b[:, 0])
    inside = jnp.sum(diff * normal, axis=-1) < 0
    return jnp.where(inside, dist, 0.0)


def _pair_depths_fast(right_verts, left_verts, faces_right, faces_left, query_subsample=1):
    s = query_subsample
    d_r = penetration_depth_fast(right_verts[::s], left_verts, faces_left)
    d_l = penetration_depth_fast(left_verts[::s], right_verts, faces_right)
    return jnp.concatenate([d_r, d_l], axis=0)


@partial(
    jax.jit,
    static_argnames=(
        "num_candidates",
        "robustifier",
        "backend",
        "cluster_group",
        "query_subsample",
        "margin",
        "parity_filter",
    ),
)
def collision_loss(
    right_verts: jnp.ndarray,  # (B, 778, 3)
    left_verts: jnp.ndarray,  # (B, 778, 3)
    faces_right: jnp.ndarray,  # (F, 3)
    faces_left: jnp.ndarray,  # (F, 3)
    hand_type_array: jnp.ndarray,  # (B, 2)
    robustifier: Optional[float] = None,
    num_candidates: int = 8,
    backend: str = "auto",
    cluster_group: int = 8,
    query_subsample: int = 1,
    margin: float = 0.0,
    parity_filter: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference-contract collision loss (see module docstring).

    ``parity_filter=True`` (the round-5 exact-METRICS default,
    OptConfig.exact_parity_filter) ANDs the depths with the ray-parity
    inside test (ray_parity_inside) — removes the phantom depths every
    local nearest-face sign test produces on self-intersecting poses.

    Returns (mean_loss (), per_sample (B,), per_vert_origin_scale (B, 2*Vq);
    Vq = 778 // query_subsample). Non-interacting samples
    (sum(hand_type) <= 1.5) contribute zero loss but keep their raw
    origin-scale depths (ref loss_utils.py:186-189).

    ``query_subsample`` strides the query vertices of EACH direction; the
    mesh side always stays full (faces index the full vertex array — see
    _pair_depths).

    backend: 'auto' (pallas on TPU, xla elsewhere), 'xla' (candidate +
    refine composite), 'pallas' (fused exact single-pass kernel; see
    ihmr_tpu.ops.pallas_collision — exact to 1e-9 vs brute force, while the
    bf16 candidate path deviates up to ~2e-2 on TPU), or '2level'
    (hierarchical nearest-centroid hot-loop variant; ``cluster_group``
    consecutive Morton-sorted faces per cluster).
    """
    s = query_subsample
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    assert margin == 0.0 or backend in ("xla", "fast"), (
        f"margin shell is implemented for the xla/fast nearest-face paths, not {backend}"
    )
    if backend == "2level":
        depths = jax.vmap(
            lambda r, l: _pair_depths_2level(
                r[::s], l[::s], r, l, faces_right, faces_left, cluster_group
            )
        )(right_verts, left_verts)
    elif backend == "fast":
        # hot-loop variant: nearest-centroid pallas kernel on TPU; on other
        # platforms the single-candidate XLA path (pallas interpret mode would
        # dominate CPU test time)
        if jax.devices()[0].platform == "tpu":
            depths = jax.vmap(
                lambda r, l: _pair_depths_fast(r, l, faces_right, faces_left, s)
            )(right_verts, left_verts)
        else:
            depths = jax.vmap(
                lambda r, l: _pair_depths(r, l, faces_right, faces_left, 1, s, margin)
            )(right_verts, left_verts)
    elif backend == "pallas":
        from ihmr_tpu.ops.pallas_collision import pair_depths_pallas

        assert s == 1, "the exact metrics kernel always runs at full sampling"
        depths = jax.vmap(
            lambda r, l: pair_depths_pallas(r, l, faces_right, faces_left)
        )(right_verts, left_verts)  # (B, 1556)
    elif backend == "grid":
        # the REFERENCE's mechanism: 32^3 per-hand penetration grid +
        # trilinear sampling (ihmr_tpu.ops.grid_sdf; used by the in-loop
        # cross-check study, scripts/grid_sdf_study.py)
        from ihmr_tpu.ops.grid_sdf import pair_depths_grid, pair_grids

        grids = pair_grids(right_verts, left_verts, faces_right, faces_left)
        depths = pair_depths_grid(right_verts[:, ::s], left_verts[:, ::s], grids)
    else:
        assert backend == "xla", backend
        depths = jax.vmap(
            lambda r, l: _pair_depths(
                r, l, faces_right, faces_left, num_candidates, s, margin
            )
        )(right_verts, left_verts)  # (B, 2*Vq)

    if parity_filter:
        depths = pair_parity_filter(
            depths, right_verts, left_verts, faces_right, faces_left, s
        )
    return depths_to_loss(depths, right_verts, left_verts, hand_type_array, robustifier)


# fixed ray direction for the parity inside test: an irregular non-axis
# direction so grazing an edge/vertex exactly requires a measure-zero
# coincidence even on structured meshes
_PARITY_DIR = (0.57738027, 0.57725433, 0.57745315)


def ray_parity_inside(
    query: jnp.ndarray,  # (V, 3)
    mesh_verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3)
    chunk: int = 128,
) -> jnp.ndarray:
    """(V,) bool: ray-crossing PARITY inside test (round 5).

    Why it exists: every local nearest-face sign test — single argmin face,
    tie-set pseudonormal, even a perfect angle-weighted pseudonormal — is
    provably wrong on SELF-INTERSECTING geometry: a strongly curled
    synthetic hand pinches its fingertip surface into the palm, the global
    nearest point of a query 0.1 units OUTSIDE the hand lands on that
    pinched concave crease, and both incident faces' normals point away
    (winding number 0.0005 confirms the query is outside; the round-5
    grazing benchmark measured 197/778 vertices reading ~0.1 'deep' this
    way). Ray parity classifies against the mesh as an even-odd solid:
    phantom 'inside' verdicts vanish; a query genuinely buried in the
    OTHER hand's clean volume still counts 1 crossing. The known
    undercount — a query inside the other hand's self-overlap pocket reads
    2 crossings = outside — is the conservative direction for a metric and
    affects only doubly-degenerate contact.

    Cost: ~30 flops per (query, face) pair, no transcendentals (a true
    winding number needs an atan2 per pair — measured orders of magnitude
    too slow at metric shapes). Evaluated in face chunks via lax.scan so
    no (V, F) intermediate materializes at trace width beyond ``chunk``.
    Möller-Trumbore with a fixed irregular ray direction (_PARITY_DIR).
    Detached: the parity is a discrete classification, not a gradient path.
    """
    mesh_verts = jax.lax.stop_gradient(mesh_verts)
    query = jax.lax.stop_gradient(query)
    tri = mesh_verts[faces]  # (F, 3, 3)
    F = tri.shape[0]
    pad = (-F) % chunk
    if pad:
        tri = jnp.concatenate([tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    d = jnp.asarray(_PARITY_DIR, query.dtype)

    # Möller-Trumbore barycentrics are AFFINE in the query for a fixed ray
    # direction — with s = q - v0, p = d x e2, m = e1 x d, n = e1 x e2:
    #   u = (q.p - v0.p)/det,  v = (q.m - v0.m)/det,  t = (q.n - v0.n)/det
    # so the whole test is three (V,3)x(3,F) matmuls plus per-face affine
    # constants; no (V,F,3) cross-product intermediates ever materialize
    # (the first formulation cost ~24 ms at metric shapes, ~8% of the
    # optimize_batch headline; this one is matmul + fused compares).
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]  # (F', 3)
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
    m = jnp.cross(e1, jnp.broadcast_to(d, e1.shape))
    n = jnp.cross(e1, e2)
    det = jnp.sum(e1 * p, axis=-1)
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    cu = jnp.sum(v0 * p, axis=-1)
    cv = jnp.sum(v0 * m, axis=-1)
    ct = jnp.sum(v0 * n, axis=-1)

    def plane(vecs):  # (F', 3) -> (V, F') fp32-exact (sign decisions)
        return jax.lax.dot_general(
            query, vecs.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    xs = tuple(
        a.reshape(-1, chunk, a.shape[-1]) if a.ndim == 2 else a.reshape(-1, chunk)
        for a in (p, m, n, cu, cv, ct, inv, ok)
    )

    def body(acc, c):
        pc, mc, nc, cuc, cvc, ctc, invc, okc = c
        u = (plane(pc) - cuc[None]) * invc[None]  # (V, C)
        v = (plane(mc) - cvc[None]) * invc[None]
        t = (plane(nc) - ctc[None]) * invc[None]
        hit = okc[None] & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        return acc + jnp.sum(hit.astype(jnp.int32), axis=-1), None

    crossings, _ = jax.lax.scan(body, jnp.zeros(query.shape[0], jnp.int32), xs)
    return (crossings % 2) == 1


def pair_parity_filter(
    depths: jnp.ndarray,  # (B, 2*Vq) raw depths from any backend
    right_verts: jnp.ndarray,  # (B, 778, 3)
    left_verts: jnp.ndarray,
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
    query_subsample: int = 1,
) -> jnp.ndarray:
    """AND the per-vertex depths with the ray-parity inside test.

    Truth table vs the backends' local sign test: (local-in, parity-in)
    keeps the depth (true burial); (local-in, parity-out) zeroes a phantom;
    (local-out, parity-in) stays 0 — for watertight non-self-intersecting
    geometry that combination cannot occur at the true nearest point, and
    in self-overlap pockets it is the conservative undercount documented at
    ray_parity_inside."""
    s = query_subsample

    def one(r, l):
        in_r = ray_parity_inside(r[::s], l, faces_left)
        in_l = ray_parity_inside(l[::s], r, faces_right)
        return jnp.concatenate([in_r, in_l], axis=0)

    inside = jax.vmap(one)(right_verts, left_verts)  # (B, 2*Vq) bool
    return depths * inside.astype(depths.dtype)


def pair_aabb_scale(right_verts: jnp.ndarray, left_verts: jnp.ndarray) -> jnp.ndarray:
    """(B, 1) normalization scale: half the max extent of the two-hand union
    AABB (detached, like the reference's grid scale)."""
    allv = jax.lax.stop_gradient(jnp.concatenate([right_verts, left_verts], axis=1))
    extent = jnp.max(allv, axis=1) - jnp.min(allv, axis=1)  # (B, 3)
    scale = 0.5 * jnp.max(extent, axis=-1, keepdims=True)  # (B, 1)
    return jnp.maximum(scale, 1e-6)


def depths_to_loss(
    depths: jnp.ndarray,  # (B, 2*Vq) raw penetration depths
    right_verts: jnp.ndarray,
    left_verts: jnp.ndarray,
    hand_type_array: jnp.ndarray,
    robustifier: Optional[float] = None,
    scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Depths -> the reference loss triple (normalize, robustify, mask).

    ``scale`` substitutes a precomputed (e.g. block-frozen) normalization
    scale; it is gradient-free either way (the live AABB is stop_gradient'd).
    A stale scale rescales the collision gradient (d(loss)/d(depth) carries
    1/scale^2, shifting the collision term's weight relative to the other
    losses within a block) and, with a robustifier set, shifts the
    Geman-McClure saturation knee (which vertices saturate depends on
    d_norm) — both bounded by one-block staleness and fresh at every
    snapshot, and bit-equivalent to the live scale at save_mid_freq=1.
    It also frees the per-step program from the only full-vertex reduce,
    letting XLA slice the decode down to the strided query rows
    (OptConfig.loop_collision_freeze_positions)."""
    if scale is None:
        scale = pair_aabb_scale(right_verts, left_verts)

    d_norm = depths / scale
    per_vert_loss = d_norm * d_norm
    if robustifier is not None:
        # Geman-McClure: ~x for x << rho^2, saturating at rho^2 for deep
        # penetrations (caps the gradient like the reference's robustifier).
        rho2 = float(robustifier) ** 2
        per_vert_loss = rho2 * per_vert_loss / (per_vert_loss + rho2)

    per_sample = jnp.sum(per_vert_loss, axis=-1)  # (B,)
    interacting = (jnp.sum(hand_type_array, axis=-1) > 1.5).astype(per_sample.dtype)
    per_sample = per_sample * interacting
    return jnp.mean(per_sample), per_sample, depths


def mesh_volume(verts: np.ndarray, faces: np.ndarray) -> float:
    """Signed volume of a closed mesh (host-side sanity helper)."""
    tri = np.asarray(verts)[np.asarray(faces)]
    return float(np.sum(np.einsum("fi,fi->f", tri[:, 0], np.cross(tri[:, 1], tri[:, 2]))) / 6.0)
