"""Bilinear image resize with torch-interpolate semantics (JAX).

Capability parity: ``F.interpolate(..., mode='bilinear')`` calls in the
reference (heatmap upsample ``nets/extractor.py:137``, stability upsample
``nets/sfd2.py:346``), which use align_corners=False (half-pixel centers).
``jax.image.resize`` bilinear uses the same half-pixel convention, so the
op lowers to XLA gathers/convs natively; an explicit align_corners=True
path is provided for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jax.Array,
    size: tuple[int, int],
    align_corners: bool = False,
) -> jax.Array:
    """Resize [..., H, W, C] (or [..., H, W]) maps to `size` = (h, w)."""
    if x.ndim < 2:
        raise ValueError("need at least a 2D image")
    has_channels = x.ndim >= 3
    h, w = size
    if not align_corners:
        shape = list(x.shape)
        if has_channels:
            shape[-3], shape[-2] = h, w
        else:
            shape[-2], shape[-1] = h, w
        # antialias=False: torch F.interpolate(bilinear) semantics. jax
        # anti-aliases DOWNSCALES by default, torch does not — matters
        # e.g. when a PSP 6×6 pooled map is resized onto a smaller
        # feature (UPerHead on small inputs); upscales are unaffected.
        return jax.image.resize(x, shape, method="bilinear", antialias=False)

    # align_corners=True: src = dst * (in-1)/(out-1); gather-based.
    axis_h = x.ndim - 3 if has_channels else x.ndim - 2
    axis_w = axis_h + 1
    in_h, in_w = x.shape[axis_h], x.shape[axis_w]

    def coords(out_n, in_n):
        if out_n == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.arange(out_n, dtype=x.dtype) * ((in_n - 1) / (out_n - 1))

    def interp_axis(arr, axis, out_n, in_n):
        c = coords(out_n, in_n)
        lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, in_n - 1)
        hi = jnp.clip(lo + 1, 0, in_n - 1)
        frac = (c - lo.astype(x.dtype)).astype(x.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_n
        frac = frac.reshape(shape)
        return a * (1 - frac) + b * frac

    x = interp_axis(x, axis_h, h, in_h)
    x = interp_axis(x, axis_w, w, in_w)
    return x
