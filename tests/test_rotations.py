import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ihmr_tpu.core import procrustes, projection, rotations


def _rand_aa(rng, n):
    axis = rng.randn(n, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.01, np.pi - 0.05, size=(n, 1))
    return axis * angle


class TestAxisAngle:
    def test_matches_scipy(self):
        rng = np.random.RandomState(0)
        aa = _rand_aa(rng, 64)
        ours = np.asarray(rotations.axis_angle_to_matrix(jnp.asarray(aa)))
        ref = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_zero_angle_is_identity(self):
        m = np.asarray(rotations.axis_angle_to_matrix(jnp.zeros((4, 3))))
        np.testing.assert_allclose(m, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-4)

    def test_roundtrip(self):
        rng = np.random.RandomState(1)
        aa = _rand_aa(rng, 128)
        m = rotations.axis_angle_to_matrix(jnp.asarray(aa))
        back = np.asarray(rotations.matrix_to_axis_angle(m))
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_quaternion_matches_scipy(self):
        rng = np.random.RandomState(2)
        aa = _rand_aa(rng, 32)
        q = np.asarray(rotations.matrix_to_quaternion(rotations.axis_angle_to_matrix(jnp.asarray(aa))))
        ref = R.from_rotvec(aa).as_quat()  # (x, y, z, w)
        ref_wxyz = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(q * ref_wxyz, axis=1, keepdims=True))
        np.testing.assert_allclose(q * sign, ref_wxyz, atol=1e-5)


class TestFlip:
    def test_flip_pose_is_mirror_conjugation(self):
        """flip_yz(aa) must satisfy R(flip(aa)) == M R(aa) M with M=diag(-1,1,1)."""
        rng = np.random.RandomState(3)
        aa = _rand_aa(rng, 16)
        M = np.diag([-1.0, 1.0, 1.0])
        flipped = np.asarray(rotations.flip_hand_pose(jnp.asarray(aa)))
        lhs = np.asarray(rotations.axis_angle_to_matrix(jnp.asarray(flipped)))
        rhs = M @ np.asarray(rotations.axis_angle_to_matrix(jnp.asarray(aa))) @ M
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_flip_flat_pose_shape(self):
        pose = jnp.arange(48.0)
        out = rotations.flip_hand_pose(pose)
        assert out.shape == (48,)
        np.testing.assert_allclose(np.asarray(out)[0::3], np.arange(48.0)[0::3])
        np.testing.assert_allclose(np.asarray(out)[1::3], -np.arange(48.0)[1::3])

    def test_flip_joints(self):
        j = jnp.asarray(np.random.RandomState(0).randn(5, 3))
        out = np.asarray(rotations.flip_hand_joints_3d(j))
        np.testing.assert_allclose(out[:, 0], -np.asarray(j)[:, 0])
        np.testing.assert_allclose(out[:, 1:], np.asarray(j)[:, 1:])


class TestRotateAug:
    def test_rotate_orient_composes(self):
        rng = np.random.RandomState(4)
        orient = _rand_aa(rng, 1)[0]
        out = rotations.rotate_orient_z(orient, 36.0)
        ref = (R.from_rotvec([0, 0, -np.pi / 5]) * R.from_rotvec(orient)).as_rotvec()
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_rotate_joints_2d_identity(self):
        j = np.random.RandomState(0).rand(10, 2) * 100
        origin = np.array([[50.0, 50.0]])
        np.testing.assert_allclose(rotations.rotate_joints_2d(j, origin, 0.0), j, atol=1e-6)

    def test_rotate_joints_3d_matches_2d_convention(self):
        """The image-frame 2D rotation and the 3D z-rotation must agree on xy."""
        j3 = np.random.RandomState(1).randn(6, 3)
        angle = 40.0
        r3 = rotations.rotate_joints_3d(j3, angle)
        r2 = rotations.rotate_joints_2d(j3[:, :2], np.zeros((1, 2)), angle)
        np.testing.assert_allclose(r3[:, :2], r2, atol=1e-5)


class TestProjection:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(5)
        X = rng.randn(4, 7, 3).astype(np.float32)
        cam = rng.randn(4, 3).astype(np.float32)
        out = np.asarray(projection.orthographic_project(jnp.asarray(X), jnp.asarray(cam)))
        ref = cam[:, None, 0:1] * (X[:, :, :2] + cam[:, None, 1:3])
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestProcrustes:
    def test_similarity_align_recovers_transform(self):
        rng = np.random.RandomState(6)
        S2 = rng.randn(20, 3)
        rot = R.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
        S1 = (S2 @ rot.T) * 0.5 + np.array([1.0, -2.0, 0.3])
        aligned = procrustes.similarity_align(S1, S2)
        np.testing.assert_allclose(aligned, S2, atol=1e-8)

    def test_no_rot_align_normalizes_scale_translation(self):
        rng = np.random.RandomState(7)
        S2 = rng.randn(15, 3)
        S1 = S2 * 3.0 + 5.0
        aligned = procrustes.no_rot_align(S1, S2)
        np.testing.assert_allclose(aligned, S2, atol=1e-8)

    def test_no_rot_does_not_fix_rotation(self):
        rng = np.random.RandomState(8)
        S2 = rng.randn(15, 3)
        rot = R.from_rotvec([0, 0, np.pi / 2]).as_matrix()
        S1 = S2 @ rot.T
        aligned = procrustes.no_rot_align(S1, S2)
        assert np.abs(aligned - S2).max() > 0.1
