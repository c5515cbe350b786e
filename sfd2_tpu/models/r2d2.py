"""R2D2-family descriptor networks in Flax (legacy baseline extractors).

Capability parity: ``nets/patchnet.py`` / ``nets/layers.py`` (the L2-Net
and Quad_L2Net[_ConfCFS] variants kept in the reference for baseline
extraction, also vendored at ``hloc/extractors/r2d2.py``). Dilated
fully-convolutional design: strides are converted to growing dilations so
the descriptor map stays full-resolution; reliability/repeatability
confidences use softplus (1-ch) or 2-way softmax (2-ch) exactly as the
reference's ``BaseNet.softmax``.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sfd2_tpu.models.layers import BN_EPS


def _conf(x: jax.Array) -> jax.Array:
    """BaseNet.softmax: 1-ch → softplus/(1+softplus); 2-ch → softmax[..1]."""
    if x.shape[-1] == 1:
        s = jax.nn.softplus(x)
        return s / (1 + s)
    return jax.nn.softmax(x, axis=-1)[..., 1:2]


class _DilatedStack(nn.Module):
    """PatchNet conv stack with stride→dilation conversion."""

    plan: Tuple[tuple, ...]  # (out, k, stride, bn, relu) per layer
    bn_affine: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation = 1
        for li, (out, k, stride, bn, relu) in enumerate(self.plan):
            d = dilation
            pad = ((k - 1) * d) // 2
            x = nn.Conv(
                out, (k, k), padding=((pad, pad), (pad, pad)),
                kernel_dilation=(d, d), dtype=self.dtype, name=f"conv{li}",
            )(x)
            dilation *= stride
            if bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    use_scale=self.bn_affine,
                    use_bias=self.bn_affine,
                    epsilon=BN_EPS,
                    dtype=self.dtype,
                    name=f"bn{li}",
                )(x)
            if relu:
                x = nn.relu(x)
        return x


def _quad_l2net_plan(dim: int = 128, mchan: int = 4) -> Tuple[tuple, ...]:
    c = lambda out, k=3, stride=1, bn=True, relu=True: (out, k, stride, bn, relu)
    return (
        c(8 * mchan),
        c(8 * mchan),
        c(16 * mchan, stride=2),
        c(16 * mchan),
        c(32 * mchan, stride=2),
        c(32 * mchan),
        c(32 * mchan, k=2, stride=2, relu=False),
        c(32 * mchan, k=2, stride=2, relu=False),
        c(dim, k=2, stride=2, bn=False, relu=False),
    )


class QuadL2NetConfCFS(nn.Module):
    """Quad_L2Net_ConfCFS: trunk + reliability (2-ch from desc²) +
    repeatability (1-ch) heads. Returns full-res maps."""

    dim: int = 128
    mchan: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _DilatedStack(
            _quad_l2net_plan(self.dim, self.mchan), dtype=self.dtype, name="trunk"
        )(x, train)
        desc = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        urel = nn.Conv(2, (1, 1), dtype=self.dtype, name="clf")(feats**2)
        urep = nn.Conv(1, (1, 1), dtype=self.dtype, name="sal")(feats**2)
        return {
            "descriptors": desc,
            "reliability": _conf(urel)[..., 0],
            "repeatability": _conf(urep)[..., 0],
        }


class L2Net(nn.Module):
    """Original L2-Net (stride-8 output when dilated=False is not used;
    here always dilated → full-res 128-D map)."""

    dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda out, k=3, stride=1, bn=True, relu=True: (out, k, stride, bn, relu)
        plan = (
            c(32), c(32), c(64, stride=2), c(64), c(128, stride=2), c(128),
            c(self.dim, k=7, stride=8, bn=False, relu=False),
        )
        feats = _DilatedStack(plan, dtype=self.dtype, name="trunk")(x, train)
        return {
            "descriptors": feats
            / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        }
