"""Room-mask feature extractors: ResNet18 / AlexNet with frozen BatchNorm.

Flax re-design of the reference extractors
(`scene_synthesis/networks/feature_extractors.py:8-85`,
`frozen_batchnorm.py:6-71`): ResNet18 with a 1-channel stem and an FC head to
``feature_size``, and the smaller AlexNet variant.  The reference freezes all
BatchNorms (FrozenBatchNorm2d replaces them with fixed-stat affines); here
``FrozenBatchNorm`` is an affine with non-trainable running statistics
(variables in the 'batch_stats' collection, never updated), which is exactly
the frozen semantics and keeps the train step purely functional.

Images are NHWC (TPU-native layout; XLA maps convs to the MXU best in NHWC).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Affine with fixed running stats.  (frozen_batchnorm.py:6-68)"""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features, jnp.float32))
        inv = scale * jnp.reciprocal(jnp.sqrt(var.value + self.eps))
        return x * inv + (bias - mean.value * inv)


class BasicBlock(nn.Module):
    """ResNet basic block (3x3 + 3x3, frozen BN)."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.features, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """ResNet18 over 1-channel room masks -> feature vector.

    (feature_extractors.py:19-44): conv1 modified for 1 input channel, frozen
    BN everywhere, global average pool, FC head to ``feature_size``.
    """

    feature_size: int = 256
    input_channels: int = 1
    stage_sizes: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        if x.ndim == 4 and x.shape[1] == self.input_channels and x.shape[-1] != self.input_channels:
            x = jnp.transpose(x, (0, 2, 3, 1))  # accept NCHW for parity
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (blocks, feats) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for b in range(blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                y = BasicBlock(feats, strides=strides, name=f"layer{i + 1}_{b}")(y)
        y = jnp.mean(y, axis=(1, 2))  # AdaptiveAvgPool2d((1, 1))
        # reference head: Sequential(Linear(512,512), ReLU, Linear(512,F))
        # (feature_extractors.py:39-42); names mirror the Sequential indices
        y = nn.relu(nn.Dense(512, name="fc_0")(y))
        return nn.Dense(self.feature_size, name="fc_2")(y)


def adaptive_avg_pool_2d(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d((out, out))`` over NHWC (exact bin rule:
    bin i averages rows [floor(i*H/out), ceil((i+1)*H/out))); also handles
    out > H by replicating, like torch."""
    B, H, W, C = x.shape

    def pool_axis(a, size, axis):
        slabs = []
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)  # ceil
            slabs.append(jnp.take(a, jnp.arange(lo, hi), axis=axis).mean(
                axis=axis, keepdims=True))
        return jnp.concatenate(slabs, axis=axis)

    return pool_axis(pool_axis(x, H, 1), W, 2)


class AlexNet(nn.Module):
    """torchvision AlexNet features + 6x6 adaptive pool + Linear(9216, F).

    Architecture-faithful to the reference (feature_extractors.py:47-68):
    explicit paddings (2,2,1,1,1), max pools after convs 1/2/5,
    AdaptiveAvgPool2d((6, 6)), and one FC over the NCHW-flattened 9216-dim
    feature (``self._fc``) — NOT a global mean pool.
    """

    feature_size: int = 256
    input_channels: int = 1

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and x.shape[1] == self.input_channels and x.shape[-1] != self.input_channels:
            x = jnp.transpose(x, (0, 2, 3, 1))
        specs = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                 (256, 3, 1, 1), (256, 3, 1, 1)]
        for i, (feats, k, s, p) in enumerate(specs):
            x = nn.Conv(feats, (k, k), strides=s, padding=p, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
            if i in (0, 1, 4):
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = adaptive_avg_pool_2d(x, 6)
        # torch flattens NCHW (C, 6, 6) order
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)  # (B, 9216)
        return nn.Dense(self.feature_size, name="fc")(x)


def get_feature_extractor(name: str = "resnet18", freeze_bn: bool = True,
                          input_channels: int = 1, feature_size: int = 256) -> nn.Module:
    """(feature_extractors.py:71-85).  BN is always frozen in this framework
    (the reference's shipped configs use freeze_bn=True)."""
    if name == "resnet18":
        return ResNet18(feature_size=feature_size, input_channels=input_channels)
    if name == "alexnet":
        return AlexNet(feature_size=feature_size, input_channels=input_channels)
    raise NotImplementedError(name)
