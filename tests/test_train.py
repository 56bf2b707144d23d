import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihmr_tpu.data.synthetic import generate
from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.mano.loader import mirror_mano_model
from ihmr_tpu.models import InterHandEncoder, build_mean_params
from ihmr_tpu.train import (
    BaselineBatch,
    TrainConfig,
    create_state,
    eval_step,
    learning_rate_for_epoch,
    set_learning_rate,
    train_step,
)
from ihmr_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def setup():
    mano_right = synthetic_mano_model()
    mano_left = mirror_mano_model(mano_right)
    encoder = InterHandEncoder(arch="resnet18")
    config = TrainConfig(lr=1e-3, use_collision_loss=False, num_candidates=4)
    mean = build_mean_params(np.zeros(48), np.zeros(10))
    state = create_state(encoder, mean, config, jax.random.PRNGKey(0), input_size=64)

    B = 4
    d = generate(mano_right, B, seed=0, noise=0.1)
    ones = jnp.ones((B, 42, 1), jnp.float32)
    rng = np.random.RandomState(0)
    batch = BaselineBatch(
        img=jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)) * 0.1,
        hand_type_array=jnp.ones((B, 2)),
        hand_type_valid=jnp.ones((B, 1)),
        joints_2d=jnp.concatenate([d["gt_j2"], ones], axis=-1),
        joints_3d=jnp.concatenate([d["gt_j3"], ones], axis=-1),
        gt_pose_params=d["gt_pose"],
        gt_shape_params=d["gt_shape"],
        mano_params_weight=jnp.ones((B, 2)),
        hand_trans=jnp.concatenate([d["gt_trans"], jnp.ones((B, 1))], axis=-1)[:, None, :],
        do_flip=jnp.zeros((B,), jnp.int32),
    )
    return encoder, config, state, batch, mano_right, mano_left


class TestTrainStep:
    def test_loss_decreases(self, setup):
        encoder, config, state, batch, mr, ml = setup
        # train_step donates its state argument; work on a copy so the
        # module-scoped fixture stays alive for the other tests
        state = jax.tree_util.tree_map(jnp.copy, state)
        metrics0 = None
        for i in range(8):
            state, metrics = train_step(encoder, state, batch, mr, ml, config)
            if metrics0 is None:
                metrics0 = {k: float(v) for k, v in metrics.items()}
        assert float(metrics["total_loss"]) < metrics0["total_loss"]
        assert np.isfinite(float(metrics["total_loss"]))

    def test_eval_step_has_collision(self, setup):
        encoder, config, state, batch, mr, ml = setup
        metrics, outputs = eval_step(encoder, state, batch, mr, ml, config)
        # eval always computes origin-scale collision (ref test(); even when
        # training does not use the collision loss)
        assert outputs["collision_loss_origin_scale"] is not None
        assert outputs["collision_loss_origin_scale"].shape == (4, 1556)
        assert outputs["pred_joints_3d"].shape == (4, 42, 3)

    def test_lr_schedules(self):
        cfg = TrainConfig(lr=1e-4, lr_decay_type="cosine", total_epoch=20)
        assert learning_rate_for_epoch(cfg, 0) == pytest.approx(1e-4)
        assert learning_rate_for_epoch(cfg, 20) == pytest.approx(0.0)
        cfg2 = TrainConfig(lr=1e-4, lr_decay_type="stage", total_epoch=20)
        assert learning_rate_for_epoch(cfg2, 14) == pytest.approx(1e-4)
        assert learning_rate_for_epoch(cfg2, 16) == pytest.approx(1e-5)
        assert learning_rate_for_epoch(cfg2, 18) == pytest.approx(1e-6)

    def test_set_learning_rate(self, setup):
        encoder, config, state, batch, mr, ml = setup
        state2 = set_learning_rate(state, 5e-5)
        assert float(state2.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-5)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path, setup):
        _, _, state, _, _, _ = setup
        ckpt.save_network(str(tmp_path), state.params, "baseline", "latest")
        restored = ckpt.load_network(str(tmp_path), "baseline", "latest")
        flat_a = jax.tree_util.tree_leaves(state.params)
        flat_b = jax.tree_util.tree_leaves(restored)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_missing_returns_none(self, tmp_path):
        assert ckpt.load_network(str(tmp_path), "baseline", "nope") is None

    def test_stage_suffix(self, tmp_path):
        tree = {"w": np.ones((2, 2))}
        path = ckpt.save_network(str(tmp_path), tree, "mlp", "latest", stage_id=3)
        assert path.endswith("latest_net_mlp_stage_03")
        assert ckpt.load_network(str(tmp_path), "mlp", "latest", stage_id=3) is not None

    def test_info_roundtrip(self, tmp_path):
        ckpt.save_info(str(tmp_path), {"epoch": np.asarray(7)}, "latest")
        info = ckpt.load_info(str(tmp_path), "latest")
        assert int(info["epoch"]) == 7

    def test_torch_resnet_import(self, tmp_path):
        """Build a torch-style state dict for resnet18 and import it."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        # construct a state dict with torchvision resnet18 naming
        def bn_keys(prefix, c):
            return {
                f"{prefix}.weight": torch.rand(c),
                f"{prefix}.bias": torch.rand(c),
                f"{prefix}.running_mean": torch.rand(c),
                f"{prefix}.running_var": torch.rand(c) + 1.0,
                f"{prefix}.num_batches_tracked": torch.tensor(1),
            }

        state = {"conv1.weight": torch.rand(64, 3, 7, 7)}
        state.update(bn_keys("bn1", 64))
        chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
        for li, (cin, cout) in enumerate(chans, start=1):
            for bi in range(2):
                icin = cin if bi == 0 else cout
                state[f"layer{li}.{bi}.conv1.weight"] = torch.rand(cout, icin, 3, 3)
                state.update(bn_keys(f"layer{li}.{bi}.bn1", cout))
                state[f"layer{li}.{bi}.conv2.weight"] = torch.rand(cout, cout, 3, 3)
                state.update(bn_keys(f"layer{li}.{bi}.bn2", cout))
                if bi == 0 and cin != cout:
                    state[f"layer{li}.{bi}.downsample.0.weight"] = torch.rand(cout, icin, 1, 1)
                    state.update(bn_keys(f"layer{li}.{bi}.downsample.1", cout))
        state["fc1.weight"] = torch.rand(1024, 512)
        state["fc1.bias"] = torch.rand(1024)

        from ihmr_tpu.models.resnet import resnet18

        net = resnet18()
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        params, stats = ckpt.import_torch_resnet(
            {k: v for k, v in state.items()}, variables["params"], variables["batch_stats"]
        )
        # spot-check a few mapped leaves
        np.testing.assert_allclose(
            params["conv1"]["kernel"],
            np.transpose(state["conv1.weight"].numpy(), (2, 3, 1, 0)),
        )
        np.testing.assert_allclose(stats["bn1"]["mean"], state["bn1.running_mean"].numpy())
        np.testing.assert_allclose(
            params["layer2_0"]["downsample_conv"]["kernel"],
            np.transpose(state["layer2.0.downsample.0.weight"].numpy(), (2, 3, 1, 0)),
        )
        np.testing.assert_allclose(params["fc1"]["kernel"], state["fc1.weight"].numpy().T)
        # and the network still runs
        out = net.apply({"params": params, "batch_stats": stats}, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 1024)


class TestBF16Training:
    """Mixed-precision backbone (convs/fc1 compute in bfloat16 with fp32
    params; BatchNorm and all heads/losses pinned fp32)."""

    def test_bf16_forward_close_to_fp32(self, setup):
        encoder, config, state, batch, mr, ml = setup
        enc16 = InterHandEncoder(arch="resnet18", dtype=jnp.bfloat16)
        # identical fp32 params drive both precisions
        p16, ht16 = enc16.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.img, state.mean_params,
        )
        p32, ht32 = encoder.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.img, state.mean_params,
        )
        assert p16.dtype == jnp.float32  # head stays fp32
        scale = float(np.abs(np.asarray(p32)).max())
        np.testing.assert_allclose(
            np.asarray(p16), np.asarray(p32), atol=0.02 * max(scale, 1.0)
        )
        np.testing.assert_allclose(np.asarray(ht16), np.asarray(ht32), atol=0.03)

    def test_bf16_train_loss_decreases(self, setup):
        _, config, _, batch, mr, ml = setup
        enc16 = InterHandEncoder(arch="resnet18", dtype=jnp.bfloat16)
        state = create_state(enc16, build_mean_params(np.zeros(48), np.zeros(10)),
                             config, jax.random.PRNGKey(0), input_size=64)
        first = None
        for _ in range(8):
            state, metrics = train_step(enc16, state, batch, mr, ml, config)
            if first is None:
                first = float(metrics["total_loss"])
        # fp32 params throughout (the master weights)
        assert state.params["main_encoder"]["conv1"]["kernel"].dtype == jnp.float32
        assert float(metrics["total_loss"]) < first
        assert np.isfinite(float(metrics["total_loss"]))
