"""SuperPoint teacher network in Flax (frozen, distillation GT source).

Capability parity: ``nets/superpoint.py:7`` (SuperPointNet) — VGG-style
grayscale encoder with 2×2 max-pools, 65-channel detector head with
exp-normalise (+1e-5) and 8×8 pixel-shuffle, 256-D descriptor head.
Output dict {scores, semi_norm, semi, descs} matches the reference
``forward`` contract (``nets/superpoint.py:106-111``); weights convert
from the public ``superpoint_v1.pth`` via `convert_superpoint`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.models.sfd2 import _pixel_shuffle_score


class SuperPoint(nn.Module):
    """Input [B, H, W, 1] grayscale in [0, 1]; H, W divisible by 8."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        def conv(feat, name):
            return nn.Conv(
                feat, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=name
            )

        def pool(v):
            return nn.max_pool(v, (2, 2), strides=(2, 2))

        x = nn.relu(conv(64, "conv1a")(x))
        x = nn.relu(conv(64, "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(64, "conv2a")(x))
        x = nn.relu(conv(64, "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(128, "conv3a")(x))
        x = nn.relu(conv(128, "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(128, "conv4a")(x))
        x = nn.relu(conv(128, "conv4b")(x))

        c_pa = nn.relu(conv(256, "convPa")(x))
        semi = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(c_pa)
        semi = jnp.exp(semi.astype(jnp.float32))
        semi_norm = semi / (jnp.sum(semi, axis=-1, keepdims=True) + 1e-5)
        score = _pixel_shuffle_score(semi_norm)

        c_da = nn.relu(conv(256, "convDa")(x))
        desc = nn.Conv(256, (1, 1), dtype=self.dtype, name="convDb")(c_da)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

        return {
            "scores": score,  # [B, H, W]
            "semi_norm": semi_norm,  # [B, H/8, W/8, 65]
            "semi": semi_norm[..., :64],  # dustbin dropped
            "descs": desc,  # [B, H/8, W/8, 256]
        }


def convert_superpoint(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Torch superpoint_v1 state-dict → Flax params (OIHW → HWIO)."""
    params: Dict[str, Any] = {}
    for k, v in state.items():
        v = np.asarray(v)
        name, kind = k.rsplit(".", 1)
        entry = params.setdefault(name, {})
        if kind == "weight":
            entry["kernel"] = jnp.asarray(np.transpose(v, (2, 3, 1, 0)), jnp.float32)
        elif kind == "bias":
            entry["bias"] = jnp.asarray(v, jnp.float32)
    return {"params": params}
