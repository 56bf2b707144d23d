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

import os
from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import module as flax_module
from flax.linen import normalization as flax_norm

ModuleDef = Any

# Trace-time switch for the BatchNorm statistics implementation
# (IHMR_BN_IMPL = stock | fused | pallas; legacy IHMR_FUSED_BN=1 == fused).
# DEFAULT: stock flax nn.BatchNorm, after the round-5 chip measurements:
#   * fused (FusedStatsBatchNorm, variadic lax.reduce): 3-4x end-to-end
#     REGRESSION — bf16 28.4 -> 122.6 ms/step at batch 64 (fp32 52.8 ->
#     151.8); XLA:TPU lowers tuple reduces outside its fast reduction
#     emitter. Kept as a re-measurable negative result.
#   * pallas (PallasStatsBatchNorm, single-pass Pallas accumulation):
#     ALSO a measured negative — fp32 67.0 / bf16 34.4 / collision-on
#     80.9 ms/step at batch 64 vs stock 52.8 / 28.4 / 65.6 (+21-27%;
#     scripts/train_bench.py, 2026-08-20). Conclusion for the lever: the
#     two stock reduces already fuse into the surrounding convert/
#     elementwise work, so any single-read restructuring breaks that
#     fusion and pays more than the second HBM read it saves.
# Read at TRACE time like IHMR_FK_LEVELS — flipping it mid-process does
# not recompile already-jitted programs.
_BN_IMPL = os.environ.get(
    "IHMR_BN_IMPL", "fused" if os.environ.get("IHMR_FUSED_BN") == "1" else "stock"
)


class FusedStatsBatchNorm(nn.BatchNorm):
    """BatchNorm whose batch statistics come from ONE variadic reduce.

    **Round-5 verdict: measured NEGATIVE on the chip — not used by default**
    (see the ``_FUSED_BN`` switch below). The hypothesis: flax's
    fast-variance path issues TWO separate convert+reduce kernels per norm
    layer — ``mean(x)`` and ``mean(x*x)`` — each re-reading the full
    activation from HBM (the round-4 v5e trace of the bf16 train step at
    batch 256 showed those convert_reduce fusions as 102 kernels and 50.3
    of the 98.5 ms/step device-busy time), so one variadic
    ``lax.reduce((x32, x32*x32))`` halving the reads should cut the step.
    The round-5 measurement says otherwise: XLA:TPU lowers the variadic
    tuple reduce OUTSIDE its optimized single-output reduction emitter, and
    the full train step REGRESSED 28.4 -> 122.6 ms/step bf16 (52.8 -> 151.8
    fp32) at batch 64. Numerically the class is correct (mean bit-identical,
    variance within reduction-order tolerance of flax's fast formula;
    equivalence suite in tests/test_models.py) — it is kept, like the
    flattened-Adam experiment, as a re-measurable negative result.

    Falls back to the stock flax path when ``axis_name`` /
    ``axis_index_groups`` / ``mask`` are used (cross-device stat sync) or
    ``use_fast_variance=False`` (different variance formula) — this repo's
    DP training keeps per-device stats, matching the reference's torch DDP
    BatchNorm (ref src/train_baseline.py DistributedDataParallel).
    """

    def _batch_moments(self, x, reduction_axes, acc_dtype):
        """(mean, var) in acc_dtype via ONE variadic reduce (one read)."""
        xf = x.astype(acc_dtype)
        s, s2 = jax.lax.reduce(
            (xf, xf * xf),
            (jnp.zeros((), acc_dtype), jnp.zeros((), acc_dtype)),
            lambda a, b: (a[0] + b[0], a[1] + b[1]),
            reduction_axes,
        )
        n = 1
        for ax in reduction_axes:
            n *= x.shape[ax]
        mean = s / n
        var = jnp.maximum(0.0, s2 / n - mean * mean)
        return mean, var

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *, mask=None):
        # Stock-path fallback: cross-device stat sync (axis_name /
        # axis_index_groups), masked stats, or the non-fast variance formula
        # (use_fast_variance=False switches flax to E[(x-mean)^2], which the
        # fused single-pass reduce does not compute) all route through
        # flax's own implementation unchanged.
        if (
            self.axis_name is not None
            or self.axis_index_groups is not None
            or mask is not None
            or not self.use_fast_variance
        ):
            return super().__call__(x, use_running_average, mask=mask)

        use_running_average = flax_module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = flax_norm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = jnp.float32 if self.force_float32_reductions else self.param_dtype
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stats_dtype), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stats_dtype), feature_shape
        )

        if use_running_average:
            mean = ra_mean.value if self.force_float32_reductions else jnp.asarray(ra_mean.value, self.param_dtype)
            var = ra_var.value if self.force_float32_reductions else jnp.asarray(ra_var.value, self.param_dtype)
        else:
            acc_dtype = jnp.result_type(x) if self.dtype is None else self.dtype
            if self.force_float32_reductions:
                acc_dtype = jnp.promote_types(acc_dtype, jnp.float32)
            mean, var = self._batch_moments(x, reduction_axes, acc_dtype)

            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        return flax_norm._normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


class PallasStatsBatchNorm(FusedStatsBatchNorm):
    """BatchNorm whose batch statistics come from ONE Pallas kernel pass.

    The round-5 TPU-correct retry of the single-read idea that
    FusedStatsBatchNorm measured as a variadic-reduce regression: a Pallas
    kernel (ops/pallas_bn.py) streams the activation once and accumulates
    per-channel fp32 sum / sum-of-squares across sequential grid steps;
    backward is the closed-form elementwise custom_vjp. Identical fallback
    contract and fast-variance formula as FusedStatsBatchNorm; selected via
    IHMR_BN_IMPL=pallas (see _BN_IMPL below).
    """

    def _batch_moments(self, x, reduction_axes, acc_dtype):
        trailing = tuple(range(x.ndim - 1))
        if reduction_axes != trailing or acc_dtype != jnp.float32:
            return super()._batch_moments(x, reduction_axes, acc_dtype)
        from ihmr_tpu.ops.pallas_bn import batch_moments

        return batch_moments(x)


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
        # 1024-d feature is returned in fp32 either way. Round 5: stock
        # nn.BatchNorm by default — the FusedStatsBatchNorm variadic-reduce
        # experiment measured 3-4x SLOWER end-to-end on the chip; the
        # Pallas single-pass variant is selectable for measurement (see
        # _BN_IMPL above).
        norm = partial(
            {"fused": FusedStatsBatchNorm, "pallas": PallasStatsBatchNorm}.get(
                _BN_IMPL, nn.BatchNorm
            ),
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
