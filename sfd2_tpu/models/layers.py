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


class GroupedConvAsDense(nn.Module):
    """Grouped 3×3 conv evaluated at MXU-tile granularity.

    TPU performance note: groups=32 over 256 channels gives 8-wide
    contractions that occupy ~6% of the 128×128 MXU — measured 1.7 TF/s
    vs 92 TF/s for a dense conv on the same chip. The fix is to COARSEN
    the grouping to 128-channel groups (the MXU lane width): a G=32
    grouped conv is exactly a G'=C/128 grouped conv whose per-group
    kernels are block-diagonal (off-group weights exactly zero). XLA
    tiles each 128-wide coarse group onto the MXU at full occupancy, so
    this keeps the dense variant's speed at 1/G' of its FLOPs —
    bit-identical outputs and gradients (zero blocks are not
    parameters). Falls back to fully dense when 128-alignment doesn't
    hold. The parameter keeps the grouped [kh, kw, C/g, C] layout, so
    torch-checkpoint conversion is unchanged.
    """

    features: int
    groups: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        group_in = self.features // self.groups
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, group_in, self.features),
        )
        # Coarsest MXU-aligned grouping: 128-channel coarse groups when
        # the fine groups nest evenly inside them, else one dense group.
        if self.features % 128 == 0 and 128 % group_in == 0:
            coarse = self.features // 128
        else:
            coarse = 1
        cg_in = self.features // coarse
        # Scatter the grouped kernel into the coarse block-diagonal form:
        # output channel o consumes input rows (o//g_in)·g_in … +g_in,
        # expressed relative to its coarse group's channel base.
        out_ch = jnp.arange(self.features)
        in_rows = ((out_ch // group_in) * group_in) % cg_in
        i_idx = in_rows[None, :] + jnp.arange(group_in)[:, None]  # [g_in, C]
        dense = jnp.zeros((3, 3, cg_in, self.features), kernel.dtype)
        dense = dense.at[:, :, i_idx, out_ch[None, :]].set(kernel)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dense.astype(self.dtype),
            (self.stride, self.stride),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=coarse,
        )


class ResBlock(nn.Module):
    """1×1 → grouped 3×3 → 1×1 bottleneck with identity skip
    (``nets/sfd2.py:25-55``; groups=32, all convs bias-free, BNs affine).
    The grouped conv runs as its dense block-diagonal equivalent — see
    GroupedConvAsDense."""

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
        out = GroupedConvAsDense(
            self.features, self.groups, self.stride, dtype=self.dtype, name="conv2"
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
