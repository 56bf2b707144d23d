"""Forward-parity test of the torch->flax ResNet importer against a REAL
torch state dict produced by the reference's own ResNet code.

VERDICT round-1 item 7: `import_torch_resnet` existed but was never exercised
against an actual torch module. Here the oracle network IS the reference's
vendored ResNet (ref src/models/resnet.py, the exact module whose ImageNet
checkpoints the reference auto-loads at ref resnet.py:180-190): we build it
with seeded random weights AND randomized BatchNorm running statistics, move
its state dict through the importer, and require the flax forward to match
the torch eval forward on a fixed input. Passing means a real torchvision
`.pth` will load correctly when licensed weights are available.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_resnet():
    sys.path.insert(0, REF_SRC)
    try:
        import importlib

        yield importlib.import_module("models.resnet")
    finally:
        sys.path.remove(REF_SRC)
        for name in ("models.resnet", "models"):
            sys.modules.pop(name, None)


def _randomize(model: "torch.nn.Module", seed: int):
    """Non-degenerate weights + BN running stats (the default init leaves
    running_mean=0/var=1, which would mask BN-mapping bugs)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0.0, 0.05, generator=gen)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.normal_(0.0, 0.1, generator=gen)
                m.running_mean.normal_(0.0, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
            elif isinstance(m, torch.nn.Linear):
                m.weight.normal_(0.0, 0.02, generator=gen)
                m.bias.normal_(0.0, 0.01, generator=gen)


@pytest.mark.parametrize("arch", ["resnet18", "resnet50"])
def test_import_torch_resnet_forward_parity(ref_resnet, arch):
    import jax
    import jax.numpy as jnp

    from ihmr_tpu.models.resnet import get_backbone
    from ihmr_tpu.train.checkpoint import import_torch_resnet

    tmodel = getattr(ref_resnet, arch)(pretrained=False)
    _randomize(tmodel, seed=42)
    tmodel.eval()

    rng = np.random.RandomState(0)
    # 224x224: the reference's fixed AvgPool2d(7) equals our global mean pool
    # exactly at the native input size (feature map 7x7)
    x = rng.randn(2, 224, 224, 3).astype(np.float32) * 0.5

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    fmodel = get_backbone(arch)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, stats = import_torch_resnet(
        tmodel.state_dict(), variables["params"], variables["batch_stats"], strict=True
    )
    f_out = np.asarray(
        fmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )

    assert f_out.shape == t_out.shape == (2, 1024)
    # identical math, different conv backends: small fp32 accumulation drift
    np.testing.assert_allclose(f_out, t_out, rtol=2e-3, atol=2e-4)
    # the head must be live (not all-relu-zero)
    assert np.abs(t_out).max() > 1e-3


def test_import_strict_rejects_unknown_keys(ref_resnet):
    import jax
    import jax.numpy as jnp

    from ihmr_tpu.models.resnet import get_backbone
    from ihmr_tpu.train.checkpoint import import_torch_resnet

    tmodel = ref_resnet.resnet18(pretrained=False)
    state = dict(tmodel.state_dict())
    state["not_a_layer.weight"] = torch.zeros(3)

    fmodel = get_backbone("resnet18")
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    with pytest.raises(KeyError):
        import_torch_resnet(state, variables["params"], variables["batch_stats"], strict=True)
