"""Grid-SDF collision backend: the REFERENCE's mechanism, rebuilt.

The reference's CUDA ``sdf`` extension voxelizes each hand into a 32^3
penetration-depth grid and trilinearly samples the OTHER hand's vertices
against it (ref src/models/loss_utils.py:174-193; install docs/install.md:
37-38; the SDF_ihmr/multiperson lineage builds the grid without gradients and
backpropagates only through the sampled query points). The shipping in-loop
backend of this rebuild is a nearest-face point-triangle approximation
instead; this module implements the reference's grid mechanism so the two
in-loop profiles can be COMPARED empirically (VERDICT round-2 item 5 /
Missing #2: turn "matches its accuracy class" from an argument into a
measurement — scripts/grid_sdf_study.py).

Mechanism:
  * per hand: take the vertex AABB, grow it to a padded cube, place a
    ``res``^3 lattice of voxel centers;
  * penetration depth at each voxel center via the exact point-triangle
    machinery (top-k centroid candidates + exact refinement + normal-sign
    inside test — ihmr_tpu.ops.collision.penetration_depth), giving a dense
    phi >= 0 field (0 outside the mesh);
  * phi at an arbitrary query point = trilinear interpolation of the grid
    (differentiable wrt the query; the grid itself is detached, matching
    both the CUDA extension and this rebuild's mesh-side stop_gradient
    convention).

Structural differences vs the shipping nearest-face path that the study
quantifies: grid discretization (cell ~ bbox/32, ~5 mm at hand scale),
trilinear smoothing of the field (gradients exist across cell boundaries and
point along the interpolated field rather than at the exact nearest face),
and depth saturation for contacts thinner than a cell.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ihmr_tpu.ops.collision import penetration_depth


def build_penetration_grid(
    verts: jnp.ndarray,  # (Vm, 3)
    faces: jnp.ndarray,  # (F, 3)
    res: int = 32,
    pad: float = 0.2,
    num_candidates: int = 8,
    chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (phi grid (res, res, res), cube center (3,), cube half-extent ()).

    The cube is the padded isotropic AABB of the mesh (the reference grid is
    likewise a per-hand box). Detached: voxelization takes no gradients.

    ``chunk=0`` (default) evaluates the whole res^3 lattice in ONE
    penetration_depth call — the (res^3, F) bf16 rank matrix is ~50 MB at
    res=32 / F=769, well within VMEM-friendly tiling, and the single call
    lets XLA pipeline the matmul/argmin instead of 8 sequential chunks
    (round-4 fast-build work for the escalation engine; chunking remains
    available for memory-constrained experiments).
    """
    verts = jax.lax.stop_gradient(verts)
    vmin = jnp.min(verts, axis=0)
    vmax = jnp.max(verts, axis=0)
    center = 0.5 * (vmin + vmax)
    half = 0.5 * jnp.max(vmax - vmin) * (1.0 + pad)

    lin = jnp.linspace(-1.0, 1.0, res)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = center[None, :] + half * jnp.stack(
        [gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=-1
    )  # (res^3, 3)

    n = pts.shape[0]
    if chunk <= 0 or chunk >= n:
        phi = penetration_depth(pts, verts, faces, num_candidates)
    else:
        assert n % chunk == 0
        phi = jnp.concatenate(
            [
                penetration_depth(pts[i : i + chunk], verts, faces, num_candidates)
                for i in range(0, n, chunk)
            ]
        )
    return phi.reshape(res, res, res), center, half


def trilinear_sample(
    grid: jnp.ndarray,  # (res, res, res) phi
    center: jnp.ndarray,  # (3,)
    half: jnp.ndarray,  # ()
    q: jnp.ndarray,  # (V, 3) query points
) -> jnp.ndarray:
    """Trilinearly-interpolated phi at the queries; 0 outside the cube
    (clamped-to-border with a zero-padded shell, like sampling a texture
    whose border is empty space). Differentiable wrt ``q``."""
    res = grid.shape[0]
    # pad with a zero shell so border clamping yields phi -> 0 outside
    g = jnp.pad(grid, 1)
    # continuous voxel coordinates in the PADDED grid
    u = (q - center[None, :]) / (2.0 * half) + 0.5  # [0,1] inside the cube
    x = u * (res - 1) + 1.0  # padded-grid coords
    x = jnp.clip(x, 0.0, res + 1 - 1.0 - 1e-6)
    x0 = jnp.floor(x)
    f = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1

    def at(ix, iy, iz):
        return g[ix, iy, iz]

    c000 = at(i0[:, 0], i0[:, 1], i0[:, 2])
    c100 = at(i1[:, 0], i0[:, 1], i0[:, 2])
    c010 = at(i0[:, 0], i1[:, 1], i0[:, 2])
    c110 = at(i1[:, 0], i1[:, 1], i0[:, 2])
    c001 = at(i0[:, 0], i0[:, 1], i1[:, 2])
    c101 = at(i1[:, 0], i0[:, 1], i1[:, 2])
    c011 = at(i0[:, 0], i1[:, 1], i1[:, 2])
    c111 = at(i1[:, 0], i1[:, 1], i1[:, 2])

    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def pair_grids(
    mesh_r: jnp.ndarray,  # (B, 778, 3)
    mesh_l: jnp.ndarray,  # (B, 778, 3)
    faces_right: jnp.ndarray,
    faces_left: jnp.ndarray,
    res: int = 32,
    num_candidates: int = 8,
    face_subsample: int = 1,
):
    """Batched per-hand grids for both directions:
    ((grid_l, c_l, h_l), (grid_r, c_r, h_r)) — grid_l is sampled by RIGHT
    queries (right verts against the left hand's field) and vice versa.

    ``face_subsample`` builds the field from every k-th Morton-sorted face
    (a spatially uniform sub-mesh over the FULL vertex array, the same
    contract as the in-loop nearest-face knob): the grid is a ~cell-size
    smoothing mechanism already, so a stride-2 surface costs half the rank
    arithmetic of the build — the escalation engine's fast-build knob,
    quality-measured by scripts/grid_fast_study.py."""
    if face_subsample > 1:
        faces_right = faces_right[::face_subsample]
        faces_left = faces_left[::face_subsample]
    build_l = jax.vmap(
        lambda m: build_penetration_grid(m, faces_left, res, num_candidates=num_candidates)
    )
    build_r = jax.vmap(
        lambda m: build_penetration_grid(m, faces_right, res, num_candidates=num_candidates)
    )
    return build_l(mesh_l), build_r(mesh_r)


def pair_depths_grid(
    query_r: jnp.ndarray,  # (B, Vq, 3)
    query_l: jnp.ndarray,  # (B, Vq, 3)
    grids,  # output of pair_grids
) -> jnp.ndarray:
    """(B, 2*Vq) trilinear phi of live queries against the per-hand grids."""
    (g_l, c_l, h_l), (g_r, c_r, h_r) = grids
    d_r = jax.vmap(trilinear_sample)(g_l, c_l, h_l, query_r)
    d_l = jax.vmap(trilinear_sample)(g_r, c_r, h_r, query_l)
    return jnp.concatenate([d_r, d_l], axis=1)
