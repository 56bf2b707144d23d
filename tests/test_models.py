import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihmr_tpu.models import InterHandEncoder, SubNetwork, build_mean_params


class TestEncoder:
    @pytest.fixture(scope="class")
    def setup(self):
        enc = InterHandEncoder(arch="resnet18")  # small arch for test speed
        mean = build_mean_params(np.full(48, 0.1), np.full(10, 0.2))
        imgs = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), imgs, mean)
        return enc, variables, imgs, mean

    def test_forward_shapes(self, setup):
        enc, variables, imgs, mean = setup
        params, hand_type = enc.apply(variables, imgs, mean)
        assert params.shape == (2, 122)
        assert hand_type.shape == (2, 2)
        assert np.all((np.asarray(hand_type) >= 0) & (np.asarray(hand_type) <= 1))

    def test_batchnorm_collections(self, setup):
        enc, variables, imgs, mean = setup
        assert "batch_stats" in variables
        out, mutated = enc.apply(
            variables, imgs, mean, train=True, mutable=["batch_stats"]
        )
        # training mode must update running stats
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            variables["batch_stats"],
            mutated["batch_stats"],
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_mean_params_layout(self):
        mean = np.asarray(build_mean_params(np.full(48, 0.3), np.zeros(10)))
        assert mean.shape == (122,)
        assert mean[0] == 5.0  # cam scale
        np.testing.assert_allclose(mean[3:6], 0.0)  # global orient zeroed
        np.testing.assert_allclose(mean[6:51], 0.3)  # right articulation
        np.testing.assert_allclose(mean[51:54], 0.0)  # left orient zeroed
        np.testing.assert_allclose(mean[119:], 0.0)  # trans


class TestSubNetwork:
    def test_residual_starts_small(self):
        net = SubNetwork(update_dim=6)
        x = jnp.asarray(np.random.RandomState(1).randn(4, 1146).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert out.shape == (4, 6)
        # gain-0.01 init: residuals must start tiny (so stage 0 is ~identity)
        assert float(jnp.abs(out).max()) < 1e-3
