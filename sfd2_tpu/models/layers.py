"""Shared conv/BN building blocks (Flax linen, NHWC, torch-padding parity).

Capability parity: the ``conv`` / ``batch_normalization`` helpers and
``ResBlock`` of ``nets/sfd2.py:14-96``. Numerics notes:

* torch ``Conv2d(padding=p)`` pads symmetrically; XLA ``SAME`` padding is
  asymmetric for even sizes under stride 2, so every conv here uses
  explicit ``((p, p), (p, p))`` padding to keep keypoint positions
  bit-comparable with the reference.
* torch ``BatchNorm2d(affine=False)`` has no scale/bias but keeps running
  stats → ``nn.BatchNorm(use_scale=False, use_bias=False)``.
* All tensors are NHWC (TPU-native layout; C is the 128-lane axis).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (torch default 0.1)


class ConvUnit(nn.Module):
    """Conv2d (+ optional affine-free BN) (+ optional ReLU) — ``conv()`` of
    the reference. Param names: ``conv`` / ``bn``."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bn: bool = True
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                use_scale=False,
                use_bias=False,
                epsilon=BN_EPS,
                momentum=BN_MOMENTUM,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BNRelu(nn.Module):
    """Affine-free BatchNorm + optional ReLU — ``batch_normalization()``."""

    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train,
            use_scale=False,
            use_bias=False,
            epsilon=BN_EPS,
            momentum=BN_MOMENTUM,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """1×1 → grouped 3×3 → 1×1 bottleneck with identity skip
    (``nets/sfd2.py:25-55``; groups=32, all convs bias-free, BNs affine)."""

    features: int
    stride: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                epsilon=BN_EPS,
                momentum=BN_MOMENTUM,
                dtype=self.dtype,
                name=name,
            )

        identity = x
        out = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = bn("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = bn("bn3")(out)
        return nn.relu(out + identity)


class ConvBNReluConv(nn.Module):
    """Conv(3×3, maybe stride 2) → affine BN → ReLU → Conv(3×3) — the
    ``convPa`` / ``convDa`` heads (``nets/sfd2.py:286-297``).
    Param names: ``conv0``/``bn``/``conv1``."""

    features: int
    first_stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.first_stride, self.first_stride),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            dtype=self.dtype,
            name="conv0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            epsilon=BN_EPS,
            momentum=BN_MOMENTUM,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            dtype=self.dtype,
            name="conv1",
        )(x)
        return x
