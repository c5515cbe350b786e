"""Bilinear point sampling on dense feature maps (JAX gathers).

Capability parity: ``torch.nn.functional.grid_sample`` as used for
descriptor lookup (``nets/extractor.py:206`` with align_corners=False,
``nets/extractor.py:61`` with align_corners=True) and for flow-warp
sampling in the training samplers (``nets/sampler.py:28``).

Design: sampling at K keypoints is a gather of 4 neighbours + lerp —
a [K]-lane vectorised program, not an image-space op, so padded top-K
keypoint arrays sample in one fused XLA gather regardless of validity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_at_points(
    fmap: jax.Array,
    xy: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Bilinearly sample `fmap` [H, W, C] at pixel coords `xy` [..., 2].

    Coordinates are in pixel units of `fmap` (0..W-1 / 0..H-1 at pixel
    centers). `padding_mode` is 'zeros' (out-of-range taps contribute 0,
    torch default) or 'border' (clamp).
    """
    h, w, _ = fmap.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        vals = fmap[yc, xc]
        if padding_mode == "zeros":
            vals = jnp.where(inside[..., None], vals, 0.0)
        return vals

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def grid_sample_bilinear(
    fmap: jax.Array,
    grid: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jax.Array:
    """torch-style grid_sample on one image.

    Args:
      fmap: [H, W, C] feature map.
      grid: [..., 2] normalised coords in [-1, 1] as (x, y).
      align_corners: coordinate convention (torch semantics).

    Returns [..., C] samples.
    """
    h, w, _ = fmap.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        px = (gx + 1) * 0.5 * (w - 1)
        py = (gy + 1) * 0.5 * (h - 1)
    else:
        px = ((gx + 1) * w - 1) * 0.5
        py = ((gy + 1) * h - 1) * 0.5
    return sample_at_points(fmap, jnp.stack([px, py], axis=-1), padding_mode)
