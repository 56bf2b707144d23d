import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ihmr_tpu.mano import (
    FINGERTIP_VERTEX_IDS,
    ManoModel,
    synthetic_mano_model,
    mano_decode,
    two_hand_decode,
    two_hand_decode_mirrored,
)
from ihmr_tpu.mano.loader import mirror_mano_model
from ihmr_tpu.mano.model import MANO_PARENTS


@pytest.fixture(scope="module")
def model():
    return synthetic_mano_model()


def _numpy_mano_reference(model, orient, pose, betas):
    """Independent NumPy implementation of the SMPL/MANO formulation."""
    vt = np.asarray(model.v_template, np.float64)
    sd = np.asarray(model.shapedirs, np.float64)
    pd = np.asarray(model.posedirs, np.float64)
    jr = np.asarray(model.j_regressor, np.float64)
    w = np.asarray(model.lbs_weights, np.float64)

    aa = np.concatenate([orient, pose]).reshape(16, 3)
    rots = R.from_rotvec(aa + 1e-8 * (np.linalg.norm(aa, axis=1, keepdims=True) < 1e-12)).as_matrix()

    v_shaped = vt + np.einsum("vcs,s->vc", sd, betas)
    j_rest = jr @ v_shaped
    pose_feat = (rots[1:] - np.eye(3)).reshape(135)
    v_posed = v_shaped + (pose_feat @ pd).reshape(778, 3)

    G_rot = np.zeros((16, 3, 3))
    G_pos = np.zeros((16, 3))
    G_rot[0], G_pos[0] = rots[0], j_rest[0]
    for k in range(1, 16):
        p = MANO_PARENTS[k]
        G_rot[k] = G_rot[p] @ rots[k]
        G_pos[k] = G_pos[p] + G_rot[p] @ (j_rest[k] - j_rest[p])
    t_rel = G_pos - np.einsum("jik,jk->ji", G_rot, j_rest)

    Rv = np.einsum("vj,jik->vik", w, G_rot)
    tv = np.einsum("vj,ji->vi", w, t_rel)
    verts = np.einsum("vik,vk->vi", Rv, v_posed) + tv
    return verts, G_pos


class TestManoDecode:
    def test_shapes(self, model):
        B = 4
        verts, joints = mano_decode(
            model, jnp.zeros((B, 3)), jnp.zeros((B, 45)), jnp.zeros((B, 10))
        )
        assert verts.shape == (B, 778, 3)
        assert joints.shape == (B, 16, 3)

    def test_rest_pose_is_template(self, model):
        verts, _ = mano_decode(model, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10)))
        np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5)

    def test_matches_numpy_reference(self, model):
        rng = np.random.RandomState(0)
        orient = rng.randn(3) * 0.5
        pose = rng.randn(45) * 0.3
        betas = rng.randn(10)
        verts, joints = mano_decode(
            model, jnp.asarray(orient)[None], jnp.asarray(pose)[None], jnp.asarray(betas)[None]
        )
        ref_verts, ref_joints = _numpy_mano_reference(model, orient, pose, betas)
        np.testing.assert_allclose(np.asarray(verts[0]), ref_verts, atol=2e-5)
        np.testing.assert_allclose(np.asarray(joints[0]), ref_joints, atol=2e-5)

    def test_global_orient_rotates_rigidly(self, model):
        """With zero articulation, a global orient must rotate the whole mesh
        about the root joint."""
        aa = np.array([0.0, 0.0, np.pi / 2])
        verts0, joints0 = mano_decode(model, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10)))
        verts1, _ = mano_decode(model, jnp.asarray(aa)[None], jnp.zeros((1, 45)), jnp.zeros((1, 10)))
        root = np.asarray(joints0[0, 0])
        rot = R.from_rotvec(aa).as_matrix()
        expected = (np.asarray(verts0[0]) - root) @ rot.T + root
        np.testing.assert_allclose(np.asarray(verts1[0]), expected, atol=1e-5)

    def test_hands_mean_offset(self, model):
        rng = np.random.RandomState(1)
        mean = jnp.asarray(rng.randn(45) * 0.1)
        pose = jnp.asarray(rng.randn(1, 45) * 0.1)
        v1, _ = mano_decode(model, jnp.zeros((1, 3)), pose, jnp.zeros((1, 10)), hands_mean=mean)
        v2, _ = mano_decode(model, jnp.zeros((1, 3)), pose + mean, jnp.zeros((1, 10)))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)

    def test_fk_levels_equals_chain(self, model):
        """The level-parallel FK (IHMR_FK_LEVELS experiment) must reproduce
        the sequential chain exactly — same recursion, grouped by depth."""
        from ihmr_tpu.core.rotations import axis_angle_to_matrix
        from ihmr_tpu.mano.layer import _fk_chain, _fk_levels
        from ihmr_tpu.mano.model import MANO_PARENTS

        rng = np.random.RandomState(0)
        B = 6
        pose = jnp.asarray(rng.randn(B, 16, 3).astype(np.float32) * 0.6)
        rots = axis_angle_to_matrix(pose)
        j_rest = jnp.asarray(rng.randn(B, 16, 3).astype(np.float32) * 0.02)
        rel_j = j_rest - jnp.where(
            (MANO_PARENTS >= 0)[None, :, None],
            j_rest[:, jnp.maximum(MANO_PARENTS, 0)],
            0.0,
        )
        Rc, tc = _fk_chain(rots, rel_j)
        Rl, tl = _fk_levels(rots, rel_j)
        np.testing.assert_allclose(np.asarray(Rl), np.asarray(Rc), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tl), np.asarray(tc), atol=1e-6)

    def test_fk_elem_equals_chain(self, model):
        """The elementwise-DAG FK (IHMR_FK_ELEM, round 5) must reproduce the
        sequential chain: identical recursion with every 3x3 product
        unrolled to per-component FMAs, also under grad."""
        import jax

        from ihmr_tpu.core.rotations import axis_angle_to_matrix
        from ihmr_tpu.mano.layer import _fk_chain, _fk_elem
        from ihmr_tpu.mano.model import MANO_PARENTS

        rng = np.random.RandomState(1)
        B = 6
        pose = jnp.asarray(rng.randn(B, 16, 3).astype(np.float32) * 0.6)
        rots = axis_angle_to_matrix(pose)
        j_rest = jnp.asarray(rng.randn(B, 16, 3).astype(np.float32) * 0.02)
        rel_j = j_rest - jnp.where(
            (MANO_PARENTS >= 0)[None, :, None],
            j_rest[:, jnp.maximum(MANO_PARENTS, 0)],
            0.0,
        )
        Rc, tc = _fk_chain(rots, rel_j)
        Re, te = jax.jit(_fk_elem)(rots, rel_j)
        np.testing.assert_allclose(np.asarray(Re), np.asarray(Rc), atol=1e-6)
        np.testing.assert_allclose(np.asarray(te), np.asarray(tc), atol=1e-6)

        def s(fk):
            return lambda r: jnp.sum(fk(r, rel_j)[0] ** 2) + jnp.sum(
                fk(r, rel_j)[1] ** 2
            )

        gc = jax.grad(s(_fk_chain))(rots)
        ge = jax.grad(s(_fk_elem))(rots)
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gc), atol=1e-5)

    def test_jit_and_grad(self, model):
        def loss(pose):
            verts, _ = mano_decode(model, jnp.zeros((2, 3)), pose, jnp.zeros((2, 10)))
            return jnp.sum(verts**2)

        g = jax.jit(jax.grad(loss))(jnp.full((2, 45), 0.1))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestMirroredDecode:
    def test_mirrored_equals_explicit_left_model(self, model):
        """Decoding a left hand via the mirrored-right trick must equal
        decoding with an explicitly mirrored left model."""
        left_model = mirror_mano_model(model)
        rng = np.random.RandomState(2)
        orient = jnp.asarray(rng.randn(2, 3) * 0.4)
        pose = jnp.asarray(rng.randn(2, 45) * 0.2)
        betas = jnp.asarray(rng.randn(2, 10) * 0.5)
        trans = jnp.asarray(rng.randn(2, 3) * 0.05)

        # mirrored path (single right model)
        _, left_verts_m, joints_m = two_hand_decode_mirrored(
            model, orient, orient, pose, pose, betas, betas, trans
        )
        # explicit two-model path
        pose_params = jnp.concatenate([orient, pose, orient, pose], axis=1)
        shape_params = jnp.concatenate([betas, betas], axis=1)
        _, left_verts_e, joints_e = two_hand_decode(
            model, left_model, pose_params, shape_params, trans
        )
        np.testing.assert_allclose(np.asarray(left_verts_m), np.asarray(left_verts_e), atol=1e-4)
        np.testing.assert_allclose(np.asarray(joints_m), np.asarray(joints_e), atol=1e-4)

    def test_left_wrist_anchored(self, model):
        rng = np.random.RandomState(3)
        trans = jnp.asarray(rng.randn(1, 3) * 0.1)
        _, _, joints = two_hand_decode_mirrored(
            model,
            jnp.zeros((1, 3)),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 45)),
            jnp.zeros((1, 45)),
            jnp.zeros((1, 10)),
            jnp.zeros((1, 10)),
            trans,
        )
        right_wrist = np.asarray(joints[0, 0])
        left_wrist = np.asarray(joints[0, 21])
        np.testing.assert_allclose(left_wrist - right_wrist, np.asarray(trans[0]), atol=1e-5)

    def test_joint_count_and_tips(self, model):
        _, _, joints = two_hand_decode_mirrored(
            model,
            jnp.zeros((1, 3)),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 45)),
            jnp.zeros((1, 45)),
            jnp.zeros((1, 10)),
            jnp.zeros((1, 10)),
            jnp.zeros((1, 3)),
        )
        assert joints.shape == (1, 42, 3)
        # right-hand tip joints are the fingertip vertices
        verts, _, _ = (
            mano_decode(model, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10)))[0],
            None,
            None,
        )
        tips = np.asarray(verts[0])[list(FINGERTIP_VERTEX_IDS)]
        np.testing.assert_allclose(np.asarray(joints[0, 16:21]), tips, atol=1e-5)


class TestHandParams:
    def test_flat_roundtrip(self):
        from ihmr_tpu.mano.layer import HandParams

        rng = np.random.RandomState(4)
        flat = jnp.asarray(rng.randn(5, 122).astype(np.float32))
        hp = HandParams.from_flat(flat)
        np.testing.assert_allclose(np.asarray(hp.to_flat()), np.asarray(flat))
        assert hp.pose_params.shape == (5, 96)
        assert hp.shape_params.shape == (5, 20)
        # layout: right pose then left pose
        np.testing.assert_allclose(np.asarray(hp.pose_params), np.asarray(flat[:, 3:99]))
