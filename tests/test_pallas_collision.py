"""Pallas fused collision kernel vs the XLA composite (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihmr_tpu.ops.collision import collision_loss, penetration_depth
from ihmr_tpu.ops.pallas_collision import pair_depths_pallas, penetration_depth_pallas
from tests.test_collision import icosphere


class TestPallasKernel:
    def test_sphere_depths_match_exact(self):
        verts, faces = icosphere(1.0)
        rng = np.random.RandomState(0)
        dirs = rng.randn(40, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radii = rng.uniform(0.2, 1.6, size=(40, 1))
        q = jnp.asarray((dirs * radii).astype(np.float32))
        tri_flat = jnp.asarray(verts)[jnp.asarray(faces)].reshape(-1, 9)
        depth_pallas = np.asarray(penetration_depth_pallas(q, tri_flat))
        expected = np.maximum(1.0 - radii[:, 0], 0.0)
        np.testing.assert_allclose(depth_pallas, expected, atol=0.03)

    def test_matches_xla_op(self):
        """Pallas (exact, all triangles) must agree with the XLA candidate
        path up to the candidate approximation."""
        verts, faces = icosphere(0.5)
        rng = np.random.RandomState(1)
        q = jnp.asarray((rng.randn(64, 3) * 0.4).astype(np.float32))
        xla = np.asarray(penetration_depth(q, jnp.asarray(verts), jnp.asarray(faces)))
        tri_flat = jnp.asarray(verts)[jnp.asarray(faces)].reshape(-1, 9)
        pallas = np.asarray(penetration_depth_pallas(q, tri_flat))
        np.testing.assert_allclose(pallas, xla, atol=1e-3)

    def test_gradient_direction(self):
        """Gradient of depth wrt an inside query is the unit direction from
        the closest surface point (pushes the point deeper => depth grows)."""
        verts, faces = icosphere(1.0)
        tri_flat = jnp.asarray(verts)[jnp.asarray(faces)].reshape(-1, 9)
        q = jnp.asarray([[0.5, 0.0, 0.0]], jnp.float32)  # inside, closest +x

        g = jax.grad(lambda x: jnp.sum(penetration_depth_pallas(x, tri_flat)))(q)
        g = np.asarray(g[0])
        # moving toward center (-x) increases depth => gradient ~ -x direction
        assert g[0] < -0.9
        assert abs(g[1]) < 0.2 and abs(g[2]) < 0.2

    def test_outside_zero_grad(self):
        verts, faces = icosphere(1.0)
        tri_flat = jnp.asarray(verts)[jnp.asarray(faces)].reshape(-1, 9)
        q = jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32)
        d = penetration_depth_pallas(q, tri_flat)
        assert float(d[0]) == 0.0
        g = jax.grad(lambda x: jnp.sum(penetration_depth_pallas(x, tri_flat)))(q)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_collision_loss_backend(self):
        """backend='pallas' plugs into the full loss with matching outputs."""
        rv, faces = icosphere(0.5, center=(0, 0, 0))
        lv, _ = icosphere(0.5, center=(0.8, 0, 0))
        rvb = jnp.asarray(rv)[None]
        lvb = jnp.asarray(lv)[None]
        fr = jnp.asarray(faces)
        out_x = collision_loss(rvb, lvb, fr, fr, jnp.ones((1, 2)), backend="xla")
        out_p = collision_loss(rvb, lvb, fr, fr, jnp.ones((1, 2)), backend="pallas")
        np.testing.assert_allclose(float(out_p[0]), float(out_x[0]), atol=1e-3, rtol=1e-2)
        np.testing.assert_allclose(
            np.asarray(out_p[2]), np.asarray(out_x[2]), atol=1e-3
        )

    def test_nonmultiple_sizes_padded(self):
        """Query/triangle counts not multiples of the tile sizes must work."""
        verts, faces = icosphere(1.0, n=150)  # odd face count
        tri_flat = jnp.asarray(verts)[jnp.asarray(faces)].reshape(-1, 9)
        q = jnp.asarray(np.random.RandomState(2).randn(77, 3).astype(np.float32) * 0.5)
        d = penetration_depth_pallas(q, tri_flat)
        assert d.shape == (77,)
        assert np.isfinite(np.asarray(d)).all()
