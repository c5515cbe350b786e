"""Global-descriptor retrieval model: ResNet-101 AP-GeM ("DIR").

Capability parity: ``hloc/extractors/dir.py`` — the Deep Image Retrieval
wrapper (``Resnet-101-AP-GeM``: ResNet-101 backbone → generalized-mean
pooling (p=3) → whitening FC → L2 norm, ``dir.py:21-31,60-78``), plus the
optional PCA power-law whitening applied to the pooled descriptor
(``dir.py:69-73`` → dirtorch ``common.whiten_features`` with
``whitenp/whitenv/whitenm``). The reference imports the network from
third_party/deep-image-retrieval (not vendored there); the architecture
is re-implemented from its public definition (torchvision-style
ResNet-101 bottleneck trunk).

TPU-native notes: NHWC throughout; the whole forward is one jitted
program; `dtype=bfloat16` runs the trunk in bf16 with an f32 pooling/
whitening tail (GeM's p-power is numerically touchy in bf16).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.models.layers import BN_EPS, BN_MOMENTUM

# dirtorch preprocessing for Resnet-101-AP-GeM (``dir.py:63-66``).
DIR_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
DIR_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _Bottleneck(nn.Module):
    """torchvision Bottleneck: 1×1 → 3×3(stride) → 1×1(×4) + skip."""

    planes: int
    stride: int = 1
    downsample: bool = False
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
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(x)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


def gem_pool(x: jax.Array, p: float = 3.0, eps: float = 1e-6) -> jax.Array:
    """Generalized-mean pooling over H,W: (mean clamp(x,eps)^p)^(1/p).

    Matches dirtorch GeneralizedMeanPoolingP (``dir.py:29-31`` conf:
    pooling='gem', gemp=3). [B,H,W,C] → [B,C], computed in f32.
    """
    x = jnp.clip(x.astype(jnp.float32), eps, None)
    return jnp.mean(x**p, axis=(1, 2)) ** (1.0 / p)


class ResNetGeM(nn.Module):
    """ResNet bottleneck trunk + GeM pooling + whitening FC + L2 norm.

    depths=(3,4,23,3) is ResNet-101 (``Resnet-101-AP-GeM``); the class is
    depth-parametric so tests can run a small twin cheaply.
    """

    depths: Sequence[int] = (3, 4, 23, 3)
    out_dim: int = 2048
    gem_p: float = 3.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, name="conv1")(x.astype(dt))
        x = nn.BatchNorm(use_running_average=not train, epsilon=BN_EPS,
                         momentum=BN_MOMENTUM, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): pad with -inf so the
        # border max is over real pixels only.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        planes = 64
        for li, depth in enumerate(self.depths):
            stride = 1 if li == 0 else 2
            for bi in range(depth):
                x = _Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    dtype=dt,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
            planes *= 2
        desc = gem_pool(x, self.gem_p)
        desc = nn.Dense(self.out_dim, dtype=jnp.float32, name="whiten")(desc)
        return desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )


def pca_whiten(
    desc: np.ndarray,
    mean: np.ndarray,
    components: np.ndarray,  # [D_out, D_in] rows = principal axes
    variances: np.ndarray,  # [D_out] explained variances
    whitenp: float = 0.25,
    whitenv: int | None = None,
    whitenm: float = 1.0,
) -> np.ndarray:
    """PCA power-law whitening of pooled descriptors.

    Behavioural parity with dirtorch ``common.whiten_features``
    (``dir.py:69-73``; conf whitenp=0.25, whitenv=None, whitenm=1.0):
    center, project onto the PCA basis (optionally truncated to
    ``whitenv`` dims), divide by ``whitenm·var^whitenp``, L2-normalise.
    """
    k = components.shape[0] if whitenv is None else int(whitenv)
    proj = (desc - mean) @ components[:k].T
    proj = proj / (whitenm * np.power(variances[:k], whitenp))
    return proj / np.maximum(np.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)


def convert_dir_resnet(state: dict, depths: Sequence[int] = (3, 4, 23, 3)):
    """torch ResNet-GeM state_dict → Flax variables for ResNetGeM.

    Accepts torchvision-style naming (conv1/bn1/layer{i}.{j}.conv{k}/
    bn{k}/downsample.{0,1}, plus whiten.{weight,bias} for the FC)."""

    def t(name):
        return np.asarray(state[name].detach().cpu().numpy()
                          if hasattr(state[name], "detach") else state[name])

    def conv_w(name):
        return np.transpose(t(name), (2, 3, 1, 0))  # OIHW → HWIO

    params: dict = {}
    stats: dict = {}

    def put_bn(flax_name, torch_prefix, dst_p, dst_s):
        dst_p[flax_name] = {"scale": t(f"{torch_prefix}.weight"),
                            "bias": t(f"{torch_prefix}.bias")}
        dst_s[flax_name] = {"mean": t(f"{torch_prefix}.running_mean"),
                            "var": t(f"{torch_prefix}.running_var")}

    params["conv1"] = {"kernel": conv_w("conv1.weight")}
    put_bn("bn1", "bn1", params, stats)
    for li, depth in enumerate(depths):
        for bi in range(depth):
            tp = f"layer{li + 1}.{bi}"
            bp: dict = {}
            bs: dict = {}
            for k in (1, 2, 3):
                bp[f"conv{k}"] = {"kernel": conv_w(f"{tp}.conv{k}.weight")}
                put_bn(f"bn{k}", f"{tp}.bn{k}", bp, bs)
            if bi == 0:
                bp["down_conv"] = {"kernel": conv_w(f"{tp}.downsample.0.weight")}
                put_bn("down_bn", f"{tp}.downsample.1", bp, bs)
            params[f"layer{li + 1}_{bi}"] = bp
            stats[f"layer{li + 1}_{bi}"] = bs
    params["whiten"] = {"kernel": t("whiten.weight").T,
                        "bias": t("whiten.bias")}
    return {"params": params, "batch_stats": stats}
