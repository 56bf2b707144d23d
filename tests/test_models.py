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


class TestFusedStatsBatchNorm:
    """The single-variadic-reduce BN must match stock flax BatchNorm.

    FusedStatsBatchNorm (models/resnet.py) replaces flax's two
    convert+reduce stat kernels with one variadic ``lax.reduce``; the mean
    is the same sum-then-divide and the variance uses flax's fast formula
    ``max(0, E[x^2] - E[x]^2)``, so outputs, running stats, and gradients
    must agree with ``nn.BatchNorm`` to reduction-order tolerance.
    """

    def _pair(self, dtype, param_dtype):
        import flax.linen as nn

        from ihmr_tpu.models.resnet import FusedStatsBatchNorm

        kw = dict(
            use_running_average=False,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            param_dtype=param_dtype,
        )
        return nn.BatchNorm(**kw), FusedStatsBatchNorm(**kw)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_train_mode_matches_stock(self, dtype):
        ref, fused = self._pair(dtype, jnp.float32)
        x = jnp.asarray(
            np.random.RandomState(0).randn(4, 8, 8, 16).astype(np.float32) * 3 + 1
        ).astype(dtype)
        v_ref = ref.init(jax.random.PRNGKey(0), x)
        v_fused = fused.init(jax.random.PRNGKey(0), x)
        y_ref, m_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
        y_fused, m_fused = fused.apply(v_fused, x, mutable=["batch_stats"])
        # bf16 outputs may differ by one bf16 ulp (~4e-3 relative) when the
        # reduction tree order differs between the variadic reduce and
        # flax's two reduces (round-4 advisor finding); the fp32 batch
        # statistics below are the tight comparison.
        tol = dict(rtol=1e-2, atol=1e-2) if dtype == jnp.bfloat16 else dict(
            rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(y_ref, np.float32), np.asarray(y_fused, np.float32), **tol
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(m_ref["batch_stats"][k]),
                np.asarray(m_fused["batch_stats"][k]),
                rtol=1e-6, atol=1e-6,
            )

    def test_eval_mode_matches_stock(self):
        import flax.linen as nn

        from ihmr_tpu.models.resnet import FusedStatsBatchNorm

        kw = dict(momentum=0.9, epsilon=1e-5)
        ref, fused = nn.BatchNorm(**kw), FusedStatsBatchNorm(**kw)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8).astype(np.float32))
        v = ref.init(jax.random.PRNGKey(0), x, use_running_average=True)
        # seed non-trivial running stats so eval mode actually reads them
        v = jax.tree_util.tree_map(lambda a: a + 0.25, v)
        y_ref = ref.apply(v, x, use_running_average=True)
        y_fused = fused.apply(v, x, use_running_average=True)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused), rtol=1e-6)

    def test_gradients_match_stock(self):
        ref, fused = self._pair(jnp.float32, jnp.float32)
        x = jnp.asarray(np.random.RandomState(2).randn(4, 4, 4, 8).astype(np.float32))
        v = ref.init(jax.random.PRNGKey(0), x)

        def loss(mod):
            def f(params, xx):
                y, _ = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx,
                    mutable=["batch_stats"],
                )
                return jnp.sum(y * y)

            return jax.grad(f, argnums=(0, 1))(v["params"], x)

        g_ref, gx_ref = loss(ref)
        g_fused, gx_fused = loss(fused)
        np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_fused), rtol=1e-4, atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_ref,
            g_fused,
        )

    def test_axis_name_falls_back_to_stock(self):
        """Cross-device stat sync must route through flax's own path."""
        import flax.linen as nn

        from ihmr_tpu.models.resnet import FusedStatsBatchNorm

        kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
                  axis_name="batch")
        x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 4, 8).astype(np.float32))

        def run(mod_cls):
            mod = mod_cls(**kw)

            def inner(xx):
                v = mod.init(jax.random.PRNGKey(0), xx)
                y, _ = mod.apply(v, xx, mutable=["batch_stats"])
                return y

            return jax.vmap(inner, axis_name="batch")(x[:, None])

        np.testing.assert_allclose(
            np.asarray(run(nn.BatchNorm)),
            np.asarray(run(FusedStatsBatchNorm)),
            rtol=1e-6,
        )

    def test_mask_falls_back_to_stock(self):
        """The mask kwarg (masked statistics) must route through flax's own
        path and match nn.BatchNorm exactly (round-4 advisor finding)."""
        import flax.linen as nn

        from ihmr_tpu.models.resnet import FusedStatsBatchNorm

        kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5)
        x = jnp.asarray(np.random.RandomState(4).randn(4, 4, 4, 8).astype(np.float32))
        mask = jnp.asarray(
            np.random.RandomState(5).rand(4, 4, 4, 1) > 0.3
        )

        def run(mod_cls):
            mod = mod_cls(**kw)
            v = mod.init(jax.random.PRNGKey(0), x, mask=mask)
            y, m = mod.apply(v, x, mask=mask, mutable=["batch_stats"])
            return y, m["batch_stats"]

        y_ref, s_ref = run(nn.BatchNorm)
        y_fused, s_fused = run(FusedStatsBatchNorm)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fused))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            s_ref, s_fused,
        )

    def test_axis_index_groups_falls_back_to_stock(self):
        """axis_index_groups needs real collectives (vmap raises
        NotImplementedError in jax itself) — exercised over 2 of the
        harness's 8 virtual CPU devices via pmap."""
        import flax.linen as nn

        from ihmr_tpu.models.resnet import FusedStatsBatchNorm

        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
                  axis_name="batch", axis_index_groups=[[0], [1]])
        x = jnp.asarray(np.random.RandomState(6).randn(2, 4, 4, 8).astype(np.float32))

        def run(mod_cls):
            mod = mod_cls(**kw)

            def inner(xx):
                v = mod.init(jax.random.PRNGKey(0), xx)
                y, _ = mod.apply(v, xx, mutable=["batch_stats"])
                return y

            return jax.pmap(inner, axis_name="batch", devices=jax.devices()[:2])(
                x[:, None]
            )

        np.testing.assert_array_equal(
            np.asarray(run(nn.BatchNorm)), np.asarray(run(FusedStatsBatchNorm))
        )

    def test_use_fast_variance_false_falls_back_to_stock(self):
        """use_fast_variance=False switches flax to the E[(x-mean)^2]
        formula, which the fused single-pass reduce does not compute; the
        class must fall back and match nn.BatchNorm exactly (round-4
        advisor finding)."""
        import flax.linen as nn

        from ihmr_tpu.models.resnet import FusedStatsBatchNorm

        kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
                  use_fast_variance=False)
        x = jnp.asarray(np.random.RandomState(7).randn(4, 4, 4, 8).astype(np.float32))

        def run(mod_cls):
            mod = mod_cls(**kw)
            v = mod.init(jax.random.PRNGKey(0), x)
            y, m = mod.apply(v, x, mutable=["batch_stats"])
            return y, m["batch_stats"]

        y_ref, s_ref = run(nn.BatchNorm)
        y_fused, s_fused = run(FusedStatsBatchNorm)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fused))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            s_ref, s_fused,
        )


class TestPallasStatsBatchNorm:
    """The single-pass Pallas BN stats (ops/pallas_bn.py, round 5) must
    match stock flax BatchNorm — interpret mode on CPU, compiled on TPU."""

    def test_moments_match_numpy(self):
        from ihmr_tpu.ops.pallas_bn import batch_moments

        rng = np.random.RandomState(0)
        x = rng.randn(3, 7, 5, 16).astype(np.float32) * 2 + 0.5
        mean, var = jax.jit(batch_moments)(jnp.asarray(x))
        flat = x.reshape(-1, 16)
        np.testing.assert_allclose(np.asarray(mean), flat.mean(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), flat.var(0), rtol=1e-4, atol=1e-6)

    def test_multi_block_rows(self):
        """Rows > _BLOCK_ROWS exercises grid accumulation + tail masking."""
        from ihmr_tpu.ops import pallas_bn

        rng = np.random.RandomState(1)
        rows = pallas_bn._BLOCK_ROWS * 2 + 37  # non-divisible tail
        x = rng.randn(rows, 8).astype(np.float32)
        s, s2 = jax.jit(pallas_bn.bn_stats)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(s), x.sum(0), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s2), (x * x).sum(0), rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_train_mode_matches_stock(self, dtype):
        import flax.linen as nn

        from ihmr_tpu.models.resnet import PallasStatsBatchNorm

        kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
                  dtype=dtype, param_dtype=jnp.float32)
        ref, pal = nn.BatchNorm(**kw), PallasStatsBatchNorm(**kw)
        x = jnp.asarray(
            np.random.RandomState(2).randn(4, 8, 8, 16).astype(np.float32) * 3 + 1
        ).astype(dtype)
        v = ref.init(jax.random.PRNGKey(0), x)
        y_ref, m_ref = ref.apply(v, x, mutable=["batch_stats"])
        y_pal, m_pal = pal.apply(v, x, mutable=["batch_stats"])
        tol = dict(rtol=1e-2, atol=1e-2) if dtype == jnp.bfloat16 else dict(
            rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(y_ref, np.float32), np.asarray(y_pal, np.float32), **tol
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(m_ref["batch_stats"][k]),
                np.asarray(m_pal["batch_stats"][k]),
                rtol=1e-5, atol=1e-6,
            )

    def test_gradients_match_stock(self):
        import flax.linen as nn

        from ihmr_tpu.models.resnet import PallasStatsBatchNorm

        kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5)
        ref, pal = nn.BatchNorm(**kw), PallasStatsBatchNorm(**kw)
        x = jnp.asarray(np.random.RandomState(3).randn(4, 4, 4, 8).astype(np.float32))
        v = ref.init(jax.random.PRNGKey(0), x)

        def grads(mod):
            def f(params, xx):
                y, _ = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx, mutable=["batch_stats"],
                )
                return jnp.sum(y * y)

            return jax.grad(f, argnums=(0, 1))(v["params"], x)

        g_ref, gx_ref = grads(ref)
        g_pal, gx_pal = grads(pal)
        np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_pal), rtol=1e-4, atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_ref, g_pal,
        )


class TestSubNetwork:
    def test_residual_starts_small(self):
        net = SubNetwork(update_dim=6)
        x = jnp.asarray(np.random.RandomState(1).randn(4, 1146).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert out.shape == (4, 6)
        # gain-0.01 init: residuals must start tiny (so stage 0 is ~identity)
        assert float(jnp.abs(out).max()) < 1e-3
