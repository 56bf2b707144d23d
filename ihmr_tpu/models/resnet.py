"""ResNet backbone in flax.linen, with the IHMR head modification.

Capability parity with the reference's vendored torchvision-style ResNet
(ref src/models/resnet.py): resnet18/34/50/101/152 variants whose classifier
head is replaced by  avgpool -> relu -> fc1(512*expansion -> 1024) -> relu
(ref resnet.py:111-155), producing a 1024-d image feature.

TPU notes: NHWC layout (XLA:TPU's native conv layout), bf16-friendly compute
with fp32 BatchNorm statistics. Weight import from torch checkpoints is in
ihmr_tpu/train/checkpoint.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    expansion: int = 1
    norm: ModuleDef = None
    conv: ModuleDef = nn.Conv

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), self.strides, use_bias=False, name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    expansion: int = 4
    norm: ModuleDef = None
    conv: ModuleDef = nn.Conv

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), use_bias=False, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * self.expansion, (1, 1), self.strides, use_bias=False, name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet trunk ending in the IHMR 1024-d feature head."""

    stage_sizes: Sequence[int]
    block: ModuleDef
    feature_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, 3) NHWC. Mixed precision (dtype=bfloat16): convs,
        # BatchNorm output, and fc1 COMPUTE in bf16 with fp32 parameters
        # (flax param_dtype default = master weights). BatchNorm's batch
        # STATISTICS are always accumulated in fp32 regardless of dtype
        # (flax _compute_stats force_float32_reductions) — pinning the BN
        # OUTPUT to fp32 as well was measured 10% slower (bf16<->fp32
        # convert+reduce fusions at every conv/BN boundary dominated the
        # round-3 trace, scripts/trace_train.py) for no accuracy gain. The
        # 1024-d feature is returned in fp32 either way.
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        conv = partial(nn.Conv, dtype=self.dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, num_blocks in enumerate(self.stage_sizes):
            for j in range(num_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block(
                    filters=64 * 2**i, strides=strides, norm=norm, conv=conv,
                    name=f"layer{i + 1}_{j}"
                )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.relu(x)
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="fc1")(x)
        return nn.relu(x.astype(jnp.float32))


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block=BasicBlock)
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block=BasicBlock)
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block=Bottleneck)
resnet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block=Bottleneck)
resnet152 = partial(ResNet, stage_sizes=(3, 8, 36, 3), block=Bottleneck)

ARCHS = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
}


def get_backbone(arch: str, **kwargs) -> ResNet:
    if arch not in ARCHS:
        raise ValueError(f"Invalid backbone architecture: {arch}")
    return ARCHS[arch](**kwargs)
