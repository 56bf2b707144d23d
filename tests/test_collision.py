import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihmr_tpu.ops.collision import (
    collision_loss,
    mesh_volume,
    penetration_depth,
    point_triangle_closest,
)


def icosphere(radius=1.0, center=(0, 0, 0), n=200):
    """Closed convex triangulated sphere via convex hull of a fibonacci set."""
    from scipy.spatial import ConvexHull

    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    pts = np.stack([np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], 1)
    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int64)
    tri = pts[faces]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = np.einsum("fd,fd->f", normals, tri.mean(1)) > 0
    faces[~outward] = faces[~outward][:, ::-1]
    verts = pts * radius + np.asarray(center)
    return verts.astype(np.float32), faces


class TestPointTriangle:
    def test_face_projection(self):
        tri = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        p = jnp.asarray([[0.25, 0.25, 5.0]])
        out = np.asarray(point_triangle_closest(p, tri))
        np.testing.assert_allclose(out, [[0.25, 0.25, 0.0]], atol=1e-6)

    def test_vertex_region(self):
        tri = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        p = jnp.asarray([[-1.0, -1.0, 0.0]])
        out = np.asarray(point_triangle_closest(p, tri))
        np.testing.assert_allclose(out, [[0, 0, 0]], atol=1e-6)

    def test_edge_region(self):
        tri = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        p = jnp.asarray([[0.5, -2.0, 0.0]])
        out = np.asarray(point_triangle_closest(p, tri))
        np.testing.assert_allclose(out, [[0.5, 0, 0]], atol=1e-6)

    def test_random_brute_force(self):
        rng = np.random.RandomState(0)
        tri = jnp.asarray(rng.randn(64, 3, 3).astype(np.float32))
        p = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        ours = np.asarray(point_triangle_closest(p, tri))
        # dense barycentric sampling as ground truth
        u = np.linspace(0, 1, 80)
        uu, vv = np.meshgrid(u, u)
        mask = uu + vv <= 1
        bary = np.stack([1 - uu[mask] - vv[mask], uu[mask], vv[mask]], 1)  # (M, 3)
        pts = np.einsum("mk,fkd->fmd", bary, np.asarray(tri))
        brute = np.min(np.linalg.norm(pts - np.asarray(p)[:, None], axis=2), axis=1)
        d_ours = np.linalg.norm(ours - np.asarray(p), axis=1)
        assert np.all(d_ours <= brute + 1e-3)


class TestPenetrationDepth:
    def test_sphere_depths(self):
        verts, faces = icosphere(1.0)
        rng = np.random.RandomState(1)
        dirs = rng.randn(50, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radii = rng.uniform(0.2, 1.6, size=(50, 1))
        q = (dirs * radii).astype(np.float32)
        depth = np.asarray(penetration_depth(jnp.asarray(q), jnp.asarray(verts), jnp.asarray(faces)))
        expected = np.maximum(1.0 - radii[:, 0], 0.0)
        np.testing.assert_allclose(depth, expected, atol=0.03)  # faceted sphere tolerance

    def test_outside_is_zero(self):
        verts, faces = icosphere(1.0)
        q = np.asarray([[2.0, 0, 0], [0, 3, 0], [0, 0, -5]], np.float32)
        depth = np.asarray(penetration_depth(jnp.asarray(q), jnp.asarray(verts), jnp.asarray(faces)))
        np.testing.assert_allclose(depth, 0.0, atol=1e-6)

    def test_winding_flip_inverts_sign(self):
        verts, faces = icosphere(1.0)
        q = np.zeros((1, 3), np.float32)
        inside = np.asarray(penetration_depth(jnp.asarray(q), jnp.asarray(verts), jnp.asarray(faces)))
        flipped = np.asarray(
            penetration_depth(jnp.asarray(q), jnp.asarray(verts), jnp.asarray(faces[:, ::-1]))
        )
        assert inside[0] > 0.5
        assert flipped[0] == 0.0


class TestCollisionLoss:
    def _two_spheres(self, gap):
        rv, faces = icosphere(0.5, center=(0, 0, 0))
        lv, _ = icosphere(0.5, center=(1.0 + gap, 0, 0))
        return (
            jnp.asarray(rv)[None],
            jnp.asarray(lv)[None],
            jnp.asarray(faces),
            jnp.asarray(faces),
        )

    def test_separated_is_zero(self):
        rv, lv, fr, fl = self._two_spheres(gap=0.2)
        loss, per_sample, origin = collision_loss(rv, lv, fr, fl, jnp.ones((1, 2)))
        assert float(loss) == 0.0
        np.testing.assert_allclose(np.asarray(origin), 0.0, atol=1e-6)

    def test_overlapping_positive(self):
        rv, lv, fr, fl = self._two_spheres(gap=-0.2)
        loss, per_sample, origin = collision_loss(rv, lv, fr, fl, jnp.ones((1, 2)))
        assert float(loss) > 0
        origin = np.asarray(origin[0])
        # deepest penetration ~ 0.2 (sphere overlap), origin scale is raw units
        assert 0.1 < origin.max() < 0.3
        # both halves (right-into-left and left-into-right) see penetration
        half = origin.shape[0] // 2
        assert origin[:half].max() > 0.05 and origin[half:].max() > 0.05

    def test_non_interacting_zeroed_but_origin_kept(self):
        rv, lv, fr, fl = self._two_spheres(gap=-0.2)
        ht = jnp.asarray([[1.0, 0.0]])  # right-only sample
        loss, per_sample, origin = collision_loss(rv, lv, fr, fl, ht)
        assert float(loss) == 0.0 and float(per_sample[0]) == 0.0
        assert np.asarray(origin).max() > 0.1  # raw depths still reported

    def test_robustifier_caps(self):
        rv, lv, fr, fl = self._two_spheres(gap=-0.4)
        loss_plain, _, _ = collision_loss(rv, lv, fr, fl, jnp.ones((1, 2)))
        loss_rob, _, _ = collision_loss(rv, lv, fr, fl, jnp.ones((1, 2)), robustifier=0.1)
        assert float(loss_rob) < float(loss_plain)

    def test_gradient_pushes_apart(self):
        rv, lv, fr, fl = self._two_spheres(gap=-0.2)

        def f(shift):
            return collision_loss(rv, lv + shift, fr, fl, jnp.ones((1, 2)))[0]

        g = jax.grad(f)(jnp.zeros(3))
        # moving left sphere further +x reduces the loss -> negative x-gradient...
        # (gradient points uphill, so g[0] < 0 means loss decreases as shift_x grows)
        assert float(g[0]) < 0
        assert np.isfinite(np.asarray(g)).all()

    def test_batch_and_jit(self):
        rv, lv, fr, fl = self._two_spheres(gap=-0.1)
        rv4 = jnp.tile(rv, (4, 1, 1))
        lv4 = jnp.tile(lv, (4, 1, 1))
        loss, per_sample, origin = collision_loss(rv4, lv4, fr, fl, jnp.ones((4, 2)))
        assert per_sample.shape == (4,)
        assert origin.shape == (4, 2 * rv.shape[1])
        np.testing.assert_allclose(np.asarray(per_sample), float(per_sample[0]), rtol=1e-5)

    def test_volume_helper(self):
        verts, faces = icosphere(1.0)
        vol = mesh_volume(verts, faces)
        assert abs(vol - 4 / 3 * np.pi) < 0.3


class TestGridBackend:
    """The reference-mechanism 32^3 grid backend (ops.grid_sdf; the in-loop
    cross-check of scripts/grid_sdf_study.py)."""

    def test_grid_matches_exact_on_sphere(self):
        """Known geometry: phi of a unit sphere is r - |x| inside. The grid
        build + trilinear sample must reproduce it (validates voxelization,
        inside test, cube mapping, interpolation in one shot)."""
        import jax.numpy as jnp

        from ihmr_tpu.ops.grid_sdf import build_penetration_grid, trilinear_sample

        nu, nv = 12, 24
        th = np.pi * np.arange(nu + 1) / nu
        ph = 2 * np.pi * np.arange(nv) / nv
        verts = np.stack(
            [
                np.outer(np.sin(th), np.cos(ph)),
                np.outer(np.sin(th), np.sin(ph)),
                np.outer(np.cos(th), np.ones(nv)),
            ],
            axis=-1,
        ).reshape(-1, 3)
        vid = lambda i, j: i * nv + (j % nv)
        faces = []
        for i in range(nu):
            for j in range(nv):
                faces.append([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)])
                faces.append([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)])
        v = jnp.asarray(verts, jnp.float32)
        f = jnp.asarray(faces, jnp.int32)

        grid, c, h = build_penetration_grid(v, f)
        pts = jnp.asarray(
            [[0, 0, 0], [0.5, 0, 0], [0, 0.8, 0], [1.5, 0, 0]], jnp.float32
        )
        phi = np.asarray(trilinear_sample(grid, c, h, pts))
        np.testing.assert_allclose(phi, [1.0, 0.5, 0.2, 0.0], atol=0.12)

    def test_grid_tracks_exact_on_realistic_contacts(self):
        """On realistic interlocked contact states (the noisy-init decode the
        refinement actually sees) the grid must register super-cell contacts
        and track the exact backend's per-sample losses on most interacting
        samples. Contacts thinner than a voxel legitimately vanish
        (documented discretization), and occasional DEEPLY-tangled samples
        can disagree — there the inside-sign heuristics of BOTH backends are
        evaluated at different points of a non-watertight tangle and neither
        is ground truth. Measured calibration (batch 8, seed 0): 97% of
        >=1-cell contacts register; per-sample losses track within ~2% on
        agreeing samples."""
        import jax.numpy as jnp

        from ihmr_tpu.data.synthetic import make_opt_inputs
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.ops.collision import collision_loss
        from ihmr_tpu.refine.opt_engine import forward

        m = synthetic_mano_model()
        p, b = make_opt_inputs(m, batch=8, seed=0, interlocked=True)
        rv, lv, _, _ = forward(m, p)
        fl = m.faces[:, ::-1]
        ht = jnp.ones((8, 2))
        _, ps_grid, d_grid = collision_loss(rv, lv, m.faces, fl, ht, backend="grid")
        _, ps_xla, d_xla = collision_loss(rv, lv, m.faces, fl, ht, backend="xla")
        d_grid, d_xla = np.asarray(d_grid), np.asarray(d_xla)
        ps_grid, ps_xla = np.asarray(ps_grid), np.asarray(ps_xla)

        span = float(np.max(np.asarray(lv)) - np.min(np.asarray(lv)))
        cell = (1.2 * span) / 31  # padded cube / (res-1)
        deep = d_xla > cell
        assert deep.sum() > 10, "benchmark must produce super-cell contacts"
        assert (d_grid[deep] > 0.25 * d_xla[deep]).mean() > 0.8

        # per-sample losses: most samples the exact backend flags as
        # substantially colliding must also be flagged by the grid
        hot = ps_xla > 0.05
        assert hot.sum() >= 2
        agree = (ps_grid[hot] > 0.25 * ps_xla[hot]) & (ps_grid[hot] < 4 * ps_xla[hot])
        assert agree.mean() >= 0.5, (ps_grid, ps_xla)

    def test_trilinear_gradient_points_outward(self):
        """phi decreases toward the surface: the gradient wrt a penetrating
        query must be nonzero and finite (the in-loop use is a gradient)."""
        import jax
        import jax.numpy as jnp

        from ihmr_tpu.data.synthetic import make_opt_inputs
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.ops.grid_sdf import build_penetration_grid, trilinear_sample
        from ihmr_tpu.refine.opt_engine import forward

        from ihmr_tpu.mano.layer import two_hand_decode_mirrored

        m = synthetic_mano_model()
        p, b = make_opt_inputs(m, batch=1, seed=0, interlocked=True)
        # GT params: guaranteed-deep interlock (init params are noisy and may
        # not overlap at batch 1)
        rv, lv, _ = two_hand_decode_mirrored(
            m,
            b.gt_pose_params[:, 0:3], b.gt_pose_params[:, 48:51],
            b.gt_pose_params[:, 3:48], b.gt_pose_params[:, 51:96],
            b.gt_shape_params[:, :10], b.gt_shape_params[:, 10:],
            b.hand_trans[:, 0, :3],
        )
        grid, c, h = build_penetration_grid(lv[0], m.faces[:, ::-1])
        phi = trilinear_sample(grid, c, h, rv[0])
        assert float(jnp.max(phi)) > 0, "interlocked pair must penetrate"
        g = jax.grad(lambda q: jnp.sum(trilinear_sample(grid, c, h, q)))(rv[0])
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g[np.asarray(phi) > 0]).max() > 0

    def test_phi_zero_outside_cube_and_far_points(self):
        import jax.numpy as jnp

        from ihmr_tpu.data.synthetic import make_opt_inputs
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.ops.grid_sdf import build_penetration_grid, trilinear_sample
        from ihmr_tpu.refine.opt_engine import forward

        m = synthetic_mano_model()
        p, _ = make_opt_inputs(m, batch=1, seed=1)
        rv, lv, _, _ = forward(m, p)
        grid, c, h = build_penetration_grid(lv[0], m.faces[:, ::-1])
        far = c[None, :] + jnp.asarray([[10.0, 10.0, 10.0]]) * h
        assert float(trilinear_sample(grid, c, h, far)[0]) == 0.0


class TestGridFastBuild:
    """Round-4 grid fast-build: flat-gather trilinear sampler, K=1 build,
    focused intersection-box lattice (ops/grid_sdf.py; the knobs the
    escalation engine's pass 2 ships with)."""

    @staticmethod
    def _hands(seed=0, batch=2):
        import jax.numpy as jnp

        from ihmr_tpu.data.synthetic import make_opt_inputs
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.refine.opt_engine import forward

        m = synthetic_mano_model()
        p, _ = make_opt_inputs(m, batch=batch, seed=seed, interlocked=True)
        rv, lv, _, _ = forward(m, p)
        return m, rv, lv

    def test_flat_sampler_matches_dense_indexing(self):
        """The flat base+offset gather must reproduce the original
        triple-advanced-index formulation bit-for-bit (same padded grid,
        same clamped coords, same corner elements)."""
        import jax.numpy as jnp

        from ihmr_tpu.ops.grid_sdf import build_penetration_grid, trilinear_sample

        m, rv, lv = self._hands()
        grid, c, h = build_penetration_grid(lv[0], m.faces[:, ::-1])

        def reference_sample(grid, center, half, q):
            res = grid.shape[0]
            g = jnp.pad(grid, 1)
            u = (q - center[None, :]) / (2.0 * half) + 0.5
            x = u * (res - 1) + 1.0
            x = jnp.clip(x, 0.0, res + 1 - 1.0 - 1e-6)
            x0 = jnp.floor(x)
            f = x - x0
            i0 = x0.astype(jnp.int32)
            i1 = i0 + 1
            at = lambda ix, iy, iz: g[ix, iy, iz]
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

        # queries spanning inside, surface-adjacent and outside-the-cube
        q = jnp.concatenate(
            [rv[0], c[None, :] + jnp.asarray([[3.0, 0.0, -2.0]]) * h], axis=0
        )
        got = np.asarray(trilinear_sample(grid, c, h, q))
        want = np.asarray(reference_sample(grid, c, h, q))
        np.testing.assert_array_equal(got, want)

    def test_k1_build_tracks_k8(self):
        """num_candidates=1 (argmin face, no top-k epilogue — the measured
        40x build speedup) must track the K=8 field: identical at most
        lattice points, differences bounded by the cell size where a
        re-labeled winner changes the exact refinement."""
        import jax.numpy as jnp

        from ihmr_tpu.ops.grid_sdf import build_penetration_grid

        m, rv, lv = self._hands()
        fl = m.faces[:, ::-1]
        g8, c8, h8 = build_penetration_grid(lv[0], fl, num_candidates=8)
        g1, c1, h1 = build_penetration_grid(lv[0], fl, num_candidates=1)
        assert float(jnp.abs(c8 - c1).max()) == 0.0 and float(h8) == float(h1)
        d = np.abs(np.asarray(g8) - np.asarray(g1))
        cell = 2 * float(h8) / 31
        # inside-ness and depth agree except where candidate re-ranking
        # relabels the winning face; those deviations stay ~cell-scale
        assert (d < 1e-5).mean() > 0.85, (d < 1e-5).mean()
        assert float(np.median(d[d > 1e-5])) < cell if (d > 1e-5).any() else True

    def test_focused_build_at_least_as_faithful_as_full_box(self):
        """focus=True (intersection-box lattice) has FINER cells at equal
        res, so its sampled field must be at least as close to the exact
        point-triangle depths at the query points as the whole-hand box —
        the focused box must never LOSE fidelity (measured on this seed it
        clearly gains: mae 0.0102 vs 0.0156, deep-contact agreement 0.51 vs
        0.00 — the full 32-box smears deep interlocks)."""
        import jax.numpy as jnp

        from ihmr_tpu.ops.collision import penetration_depth
        from ihmr_tpu.ops.grid_sdf import pair_depths_grid, pair_grids

        m, rv, lv = self._hands(seed=3, batch=2)
        fr, fl = jnp.asarray(m.faces), jnp.asarray(m.faces[:, ::-1])
        g_full = pair_grids(rv, lv, fr, fl, res=32, num_candidates=1)
        g_foc = pair_grids(rv, lv, fr, fl, res=32, num_candidates=1, focus=True)
        d_full = np.asarray(pair_depths_grid(rv[:, ::2], lv[:, ::2], g_full))
        d_foc = np.asarray(pair_depths_grid(rv[:, ::2], lv[:, ::2], g_foc))

        mae_full, mae_foc, n_deep, reg_full, reg_foc = 0.0, 0.0, 0, 0.0, 0.0
        for b in range(rv.shape[0]):
            ex = np.concatenate(
                [
                    np.asarray(penetration_depth(rv[b, ::2], lv[b], fl, num_candidates=8)),
                    np.asarray(penetration_depth(lv[b, ::2], rv[b], fr, num_candidates=8)),
                ]
            )
            mae_full += float(np.abs(ex - d_full[b]).mean())
            mae_foc += float(np.abs(ex - d_foc[b]).mean())
            deep = ex > 0.01
            n_deep += int(deep.sum())
            reg_full += float((d_full[b][deep] > 0.25 * ex[deep]).sum())
            reg_foc += float((d_foc[b][deep] > 0.25 * ex[deep]).sum())
        assert n_deep > 10, "benchmark must produce deep contacts"
        assert mae_foc <= mae_full * 1.05, (mae_foc, mae_full)
        assert reg_foc >= reg_full, (reg_foc, reg_full)

    def test_focused_no_overlap_zero_field(self):
        import jax.numpy as jnp

        from ihmr_tpu.ops.grid_sdf import pair_depths_grid, pair_grids

        m, rv, lv = self._hands(seed=1, batch=1)
        lv_far = lv + 10.0  # disjoint AABBs
        fr, fl = jnp.asarray(m.faces), jnp.asarray(m.faces[:, ::-1])
        g = pair_grids(rv, lv_far, fr, fl, res=16, num_candidates=1, focus=True)
        d = np.asarray(pair_depths_grid(rv[:, ::2], lv_far[:, ::2], g))
        assert float(np.abs(d).max()) == 0.0


class TestRayParityInside:
    """Ray-parity inside test + the exact-metrics phantom-depth fix (round 5).

    Every local nearest-face sign test misclassifies queries whose global
    nearest point lies on a self-intersection crease of a strongly curled
    hand (both incident normals point away): the grazing benchmark measured
    197/778 vertices of a cleanly separated pair reading ~0.1 'deep'.
    ray_parity_inside classifies by ray-crossing parity instead; validated
    at 100% agreement with the generalized winding number on 12,448
    inter-hand classifications (interlocked + grazing GT poses).
    """

    def test_sphere_classification(self):
        from ihmr_tpu.ops.collision import ray_parity_inside

        verts, faces = icosphere(1.0)
        rng = np.random.RandomState(0)
        pts = rng.randn(200, 3).astype(np.float32)
        r = np.linalg.norm(pts, axis=1)
        inside = np.asarray(
            jax.jit(
                lambda q: ray_parity_inside(q, jnp.asarray(verts), jnp.asarray(faces))
            )(jnp.asarray(pts))
        )
        clear = np.abs(r - 1.0) > 0.02  # skip the polyhedral ambiguity band
        assert np.array_equal(inside[clear], r[clear] < 1.0)

    def test_matches_winding_number_on_hands(self):
        from ihmr_tpu.data.synthetic import generate_interlocked
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.ops.collision import ray_parity_inside
        from ihmr_tpu.refine.opt_engine import forward, params_from_init

        model = synthetic_mano_model()
        faces = np.asarray(model.faces)[:, ::-1]  # left-mesh winding
        d = generate_interlocked(model, 2, 3, 0.15)
        p = params_from_init(d["gt_cam"], d["gt_pose"], d["gt_shape"], d["gt_trans"])
        rv, lv, _, _ = jax.jit(lambda q: forward(model, q))(p)
        for b in range(2):
            q = np.asarray(rv[b])
            mesh = np.asarray(lv[b])
            par = np.asarray(
                ray_parity_inside(jnp.asarray(q), jnp.asarray(mesh), jnp.asarray(faces))
            )
            # generalized winding number (van Oosterom-Strackee solid angles)
            a = mesh[faces[:, 0]][None] - q[:, None]
            bb = mesh[faces[:, 1]][None] - q[:, None]
            c = mesh[faces[:, 2]][None] - q[:, None]
            la, lb, lc = (np.linalg.norm(x, axis=2) for x in (a, bb, c))
            num = np.einsum("vfi,vfi->vf", a, np.cross(bb, c))
            den = (
                la * lb * lc
                + np.einsum("vfi,vfi->vf", a, bb) * lc
                + np.einsum("vfi,vfi->vf", bb, c) * la
                + np.einsum("vfi,vfi->vf", c, a) * lb
            )
            w = np.sum(2 * np.arctan2(num, den), axis=1) / (4 * np.pi) > 0.5
            assert np.array_equal(par, w)

    def test_grazing_gt_reads_zero_with_parity(self):
        """The round-5 phantom regression: a cleanly separated grazing pair
        must measure EXACTLY zero collision with the parity filter, while
        the raw local sign test reads phantom depth."""
        from ihmr_tpu.data.synthetic import generate_grazing
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.refine.opt_engine import forward, params_from_init

        model = synthetic_mano_model()
        d = generate_grazing(model, 16, 3, 0.15)
        p = params_from_init(d["gt_cam"], d["gt_pose"], d["gt_shape"], d["gt_trans"])
        rv, lv, _, _ = jax.jit(lambda q: forward(model, q))(p)
        args = (rv, lv, model.faces, model.faces[:, ::-1], jnp.ones((16, 2)))
        _, per_raw, _ = collision_loss(*args, backend="xla", parity_filter=False)
        _, per_fix, _ = collision_loss(*args, backend="xla", parity_filter=True)
        assert float(jnp.max(per_raw)) > 1.0  # the phantom is real
        assert float(jnp.max(per_fix)) == 0.0

    def test_parity_filter_keeps_clean_overlap(self):
        """On clean convex geometry the filter must be a no-op: two
        overlapping spheres report identical depths either way."""
        v1, f1 = icosphere(1.0, center=(0, 0, 0))
        v2, f2 = icosphere(1.0, center=(1.2, 0, 0))
        args = (
            jnp.asarray(v1)[None],
            jnp.asarray(v2)[None],
            jnp.asarray(f1),
            jnp.asarray(f2),
            jnp.ones((1, 2)),
        )
        _, per_raw, d_raw = collision_loss(*args, backend="xla", parity_filter=False)
        _, per_fix, d_fix = collision_loss(*args, backend="xla", parity_filter=True)
        assert float(jnp.max(d_raw)) > 0.0  # they really overlap
        np.testing.assert_array_equal(np.asarray(d_raw), np.asarray(d_fix))
