import jax
import jax.numpy as jnp
import numpy as np

from ihmr_tpu.losses import (
    finger_reg_loss,
    hand_trans_loss,
    hand_type_loss,
    joints_2d_loss,
    joints_3d_loss,
    mano_pose_loss,
    mano_shape_loss,
    shape_reg_loss,
    shape_residual_loss,
)


class TestSimpleLosses:
    def test_hand_type_bce(self):
        gt = jnp.asarray([[1.0, 0.0]])
        pred = jnp.asarray([[0.9, 0.1]])
        valid = jnp.ones((1, 1))
        loss = float(hand_type_loss(gt, pred, valid))
        expected = -np.mean([np.log(0.9), np.log(0.9)])
        np.testing.assert_allclose(loss, expected, rtol=1e-5)

    def test_hand_type_invalid_masks(self):
        gt = jnp.asarray([[1.0, 0.0]])
        pred = jnp.asarray([[0.2, 0.8]])
        assert float(hand_type_loss(gt, pred, jnp.zeros((1, 1)))) == 0.0

    def test_shape_loss_weighted_l1(self):
        gt = jnp.zeros((2, 10))
        pred = jnp.ones((2, 10))
        w = jnp.asarray([[1.0], [0.0]])
        np.testing.assert_allclose(float(mano_shape_loss(gt, pred, w)), 0.5)

    def test_trans_loss(self):
        gt = jnp.zeros((2, 1, 3))
        pred = jnp.ones((2, 3)) * 2.0
        w = jnp.asarray([[[1.0]], [[0.0]]])
        np.testing.assert_allclose(float(hand_trans_loss(gt, pred, w)), 2.0)

    def test_shape_reg_symmetry(self):
        shape = jnp.concatenate([jnp.ones((3, 10)), jnp.zeros((3, 10))], axis=1)
        loss, batch = shape_reg_loss(shape)
        np.testing.assert_allclose(float(loss), 1.0)
        assert batch.shape == (3,)
        shape_sym = jnp.tile(jnp.ones((3, 10)), (1, 2))
        assert float(shape_reg_loss(shape_sym)[0]) == 0.0

    def test_shape_residual(self):
        np.testing.assert_allclose(
            float(shape_residual_loss(jnp.ones((2, 10)), jnp.zeros((2, 10)))), 1.0
        )


class TestPoseLoss:
    def test_zero_for_equal(self):
        rng = np.random.RandomState(0)
        pose = jnp.asarray(rng.randn(4, 48) * 0.3)
        assert float(mano_pose_loss(pose, pose, jnp.ones((4, 1)))) < 1e-10

    def test_global_orient_dropped_by_default(self):
        rng = np.random.RandomState(1)
        pose = jnp.asarray(rng.randn(2, 48) * 0.3).at[:, :3].set(0.0)
        pose_rot = pose.at[:, :3].set(1.0)  # only differ in global orient
        loss = float(mano_pose_loss(pose, pose_rot, jnp.ones((2, 1))))
        assert loss < 1e-10
        loss_with = float(mano_pose_loss(pose, pose_rot, jnp.ones((2, 1)), use_hand_rotation=True))
        assert loss_with > 1e-3

    def test_45_dim_keeps_all(self):
        rng = np.random.RandomState(2)
        a = jnp.asarray(rng.randn(2, 45) * 0.3)
        b = jnp.asarray(rng.randn(2, 45) * 0.3)
        assert float(mano_pose_loss(a, b, jnp.ones((2, 1)))) > 0


class TestJointLosses:
    def test_joints_2d(self):
        gt = jnp.zeros((2, 5, 2))
        pred = jnp.ones((2, 5, 2))
        w = jnp.ones((2, 5, 1)).at[1].set(0.0)
        loss, batch = joints_2d_loss(gt, pred, w)
        np.testing.assert_allclose(np.asarray(batch), [1.0, 0.0])
        np.testing.assert_allclose(float(loss), 0.5)

    def test_joints_3d_root_alignment_right(self):
        """A constant offset must vanish after right-wrist alignment."""
        rng = np.random.RandomState(3)
        gt = jnp.asarray(rng.randn(2, 42, 3))
        pred = gt + 5.0  # constant shift
        w = jnp.ones((2, 42, 1))
        loss, _ = joints_3d_loss(gt, pred, w)
        assert float(loss) < 1e-10

    def test_joints_3d_left_fallback(self):
        rng = np.random.RandomState(4)
        gt = jnp.asarray(rng.randn(1, 42, 3))
        pred = gt + 2.0
        w = jnp.ones((1, 42, 1)).at[:, 0, 0].set(0.0)  # right wrist invalid
        loss, _ = joints_3d_loss(gt, pred, w)
        assert float(loss) < 1e-10  # aligned by left wrist (joint 21) instead

    def test_joints_3d_nonrigid_penalized(self):
        rng = np.random.RandomState(5)
        gt = jnp.asarray(rng.randn(1, 42, 3))
        pred = jnp.asarray(rng.randn(1, 42, 3))
        loss, batch = joints_3d_loss(gt, pred, jnp.ones((1, 42, 1)))
        assert float(loss) > 0.1
        assert batch.shape == (1,)


class TestFingerReg:
    def test_straight_fingers_zero(self):
        """Collinear chains: C1 = 0 and C2 = 0 -> zero loss."""
        joints = np.zeros((1, 42, 3), np.float32)
        from ihmr_tpu.losses.losses import FINGER_JOINT_IDXS

        # place every chain along x with increasing offsets
        chains = FINGER_JOINT_IDXS.reshape(10, 4)
        for f in range(10):
            for k in range(4):
                joints[0, chains[f, k]] = [k * 0.1, f * 1.0, 0.0]
        loss, batch = finger_reg_loss(jnp.asarray(joints))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_planar_curl_zero(self):
        """A consistently curled planar finger has C1 = 0, C2 > 0 -> 0 loss."""
        joints = np.zeros((1, 42, 3), np.float32)
        from ihmr_tpu.losses.losses import FINGER_JOINT_IDXS

        chains = FINGER_JOINT_IDXS.reshape(10, 4)
        angles = np.array([0.0, 0.4, 0.8, 1.2])
        pts = np.stack([np.cos(angles), np.sin(angles), np.zeros(4)], 1)
        for f in range(10):
            for k in range(4):
                joints[0, chains[f, k]] = pts[k] + [0, 0, f]
        loss, _ = finger_reg_loss(jnp.asarray(joints))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_nonplanar_penalized(self):
        rng = np.random.RandomState(6)
        joints = jnp.asarray(rng.randn(2, 42, 3))
        loss, batch = finger_reg_loss(joints)
        assert float(loss) > 0
        assert batch.shape == (2,)

    def test_grad_finite(self):
        rng = np.random.RandomState(7)
        joints = jnp.asarray(rng.randn(1, 42, 3))
        g = jax.grad(lambda j: finger_reg_loss(j)[0])(joints)
        assert np.isfinite(np.asarray(g)).all()
