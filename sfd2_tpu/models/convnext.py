"""ConvNeXt backbone in Flax (the semantic-feature teacher).

Capability parity: ``nets/convnext.py`` — ConvNeXt (ADE20k-seg-trained
'base' in the shipped config) supplying the GT semantic features for the
feature-consistency loss via ``extract(x, out_indices=[0, 1])``
(``:304-316``). Architecture: patchify stem (4×4 s4 conv + LN), stages of
[depthwise 7×7 → LN → Linear(4×) → GELU → Linear → γ-scale → residual]
blocks with 2×2 s2 LN+conv downsampling between stages, and a per-stage
output LayerNorm. layer_scale_init_value=1.0 as in the reference ctor.

NHWC throughout (LayerNorm2d becomes a plain trailing-axis LayerNorm);
weights convert from the reference's torch checkpoint layout via
`convert_convnext`. Intended use in this framework: precompute teacher
features offline (SURVEY §7.2(7)) rather than running in the train step.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ARCH_SETTINGS = {
    "tiny": {"depths": (3, 3, 9, 3), "channels": (96, 192, 384, 768)},
    "small": {"depths": (3, 3, 27, 3), "channels": (96, 192, 384, 768)},
    "base": {"depths": (3, 3, 27, 3), "channels": (128, 256, 512, 1024)},
    "large": {"depths": (3, 3, 27, 3), "channels": (192, 384, 768, 1536)},
}


class ConvNeXtBlock(nn.Module):
    channels: int
    mlp_ratio: int = 4
    layer_scale_init_value: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(
            self.channels, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.channels, dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.mlp_ratio * self.channels, dtype=self.dtype, name="pw1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.channels, dtype=self.dtype, name="pw2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.channels,),
            )
            x = x * gamma
        return shortcut + x


class ConvNeXt(nn.Module):
    arch: str = "base"
    out_indices: Tuple[int, ...] = (0, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        cfg = ARCH_SETTINGS[self.arch]
        depths, channels = cfg["depths"], cfg["channels"]
        outs = []
        for i in range(len(depths)):
            if i == 0:
                x = nn.Conv(
                    channels[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"down{i}_norm"
                )(x)
                x = nn.Conv(
                    channels[i], (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"down{i}_conv",
                )(x)
            for j in range(depths[i]):
                x = ConvNeXtBlock(
                    channels[i], dtype=self.dtype, name=f"stage{i}_block{j}"
                )(x)
            if i in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{i}")(x)
                )
        return tuple(outs)


def convert_convnext(state: Mapping[str, Any], arch: str = "base") -> Dict[str, Any]:
    """Torch (mmcls-style) ConvNeXt state-dict → Flax params.

    Torch layout: downsample_layers.{i}.{0,1}, stages.{i}.{j}.* with
    depthwise_conv / norm / pointwise_conv1/2 / gamma, norm{i} output LNs.
    """
    sd = {}
    for k, v in state.items():
        if k.startswith(("module.", "backbone.")):
            k = k.split(".", 1)[1]
        sd[k] = np.asarray(v)

    depths = ARCH_SETTINGS[arch]["depths"]
    p: Dict[str, Any] = {}

    def conv_k(w):
        return jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)

    def ln(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    p["stem_conv"] = {
        "kernel": conv_k(sd["downsample_layers.0.0.weight"]),
        "bias": jnp.asarray(sd["downsample_layers.0.0.bias"], jnp.float32),
    }
    p["stem_norm"] = ln("downsample_layers.0.1")
    for i in range(1, len(depths)):
        p[f"down{i}_norm"] = ln(f"downsample_layers.{i}.0")
        p[f"down{i}_conv"] = {
            "kernel": conv_k(sd[f"downsample_layers.{i}.1.weight"]),
            "bias": jnp.asarray(sd[f"downsample_layers.{i}.1.bias"], jnp.float32),
        }
    for i, d in enumerate(depths):
        for j in range(d):
            pre = f"stages.{i}.{j}"
            blk = {
                "dwconv": {
                    "kernel": conv_k(sd[f"{pre}.depthwise_conv.weight"]),
                    "bias": jnp.asarray(sd[f"{pre}.depthwise_conv.bias"], jnp.float32),
                },
                "norm": ln(f"{pre}.norm"),
                "pw1": {
                    "kernel": jnp.asarray(sd[f"{pre}.pointwise_conv1.weight"].T, jnp.float32),
                    "bias": jnp.asarray(sd[f"{pre}.pointwise_conv1.bias"], jnp.float32),
                },
                "pw2": {
                    "kernel": jnp.asarray(sd[f"{pre}.pointwise_conv2.weight"].T, jnp.float32),
                    "bias": jnp.asarray(sd[f"{pre}.pointwise_conv2.bias"], jnp.float32),
                },
            }
            if f"{pre}.gamma" in sd:
                blk["gamma"] = jnp.asarray(sd[f"{pre}.gamma"], jnp.float32)
            p[f"stage{i}_block{j}"] = blk
    for i in range(len(depths)):
        if f"norm{i}.weight" in sd:
            p[f"out_norm{i}"] = ln(f"norm{i}")
    return {"params": p}
