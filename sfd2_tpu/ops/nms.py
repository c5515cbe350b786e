"""Non-maximum suppression on dense score maps (XLA reduce_window).

Capability parity: ``nets/extractor.py:20`` (simple_nms — iterated max-pool
suppression, radius 4) and the grid-greedy ``extract.py:17`` nms_fast.
TPU-native design: the max-pool is ``lax.reduce_window`` which XLA lowers
to a fused windowed reduction; the two refinement iterations are unrolled
(static), so the whole NMS fuses into the extraction program with no
host round-trips.

Layout is NHWC single-channel maps stored as [B, H, W] (no dummy channel
dim — keeps the trailing dims as the TPU-tiled (8,128) lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _maxpool_same(x: jax.Array, radius: int) -> jax.Array:
    """Max-pool with kernel 2r+1, stride 1, SAME padding over [B, H, W].

    Separable: max over a (2r+1)² window == row-max then column-max
    (exact — max is associative/commutative), 2(2r+1) compares per pixel
    instead of (2r+1)². Measured neutral on the v5e (the full-res pools
    are HBM-bound there: ~40 MB/img of f32 traffic vs ≤0.1 ms of VPU
    work either way) but a real win on compute-bound backends (CPU
    tests/serving), and bit-identical on both."""
    k = 2 * radius + 1
    rows = lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, k, 1),
        window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (0, 0)),
    )
    return lax.reduce_window(
        rows,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (radius, radius)),
    )


def simple_nms(scores: jax.Array, nms_radius: int = 4, iterations: int = 2) -> jax.Array:
    """Iterated max-pool NMS; non-maxima scores are zeroed.

    Semantics match SuperPoint-style simple_nms: a pixel survives if it is
    the max in its (2r+1)² window, with two refinement rounds that allow
    secondary maxima outside the suppression zone of already-accepted
    peaks.
    """
    assert nms_radius >= 0
    if nms_radius == 0:
        return scores
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _maxpool_same(scores, nms_radius)
    for _ in range(iterations):
        supp_mask = _maxpool_same(max_mask.astype(scores.dtype), nms_radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _maxpool_same(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def nms_fast_host(points: "np.ndarray", scores: "np.ndarray", h: int, w: int,
                  dist_thresh: int = 4):
    """Host-side grid-greedy NMS (``extract.py:17`` nms_fast capability):
    rasterise candidates onto a grid, visit in descending score order,
    suppress a (2r+1)² neighbourhood around each accepted point.

    Args: points [N, 2] (x, y) int-able coords, scores [N].
    Returns indices of kept points (descending score)."""
    import numpy as np

    grid = -np.ones((h, w), np.int64)
    order = np.argsort(-scores)
    xs = np.clip(np.rint(points[order, 0]).astype(int), 0, w - 1)
    ys = np.clip(np.rint(points[order, 1]).astype(int), 0, h - 1)
    kept = []
    r = dist_thresh
    for oi, (x, y) in zip(order, zip(xs, ys)):
        if grid[y, x] != -1:
            continue
        kept.append(int(oi))
        grid[max(y - r, 0) : y + r + 1, max(x - r, 0) : x + r + 1] = oi
    return np.array(kept, np.int64)
