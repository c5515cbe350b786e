"""Batched keypoint extraction: NMS → threshold → border → top-K → descs.

Capability parity: ``nets/extractor.py:97`` (extract_resnet_return), the
CLI-used extraction path — NMS radius 4, conf_th 0.001, border 4, top-K by
score, bilinear descriptor lookup on the 1/4-res descriptor map with
re-L2-normalisation — and ``extract.py:205`` (single-scale path).

TPU-native redesign: the reference materialises variable-length keypoint
lists on the host (``torch.nonzero`` → numpy sort → python filters); here
everything is fixed-shape — one jitted program per (H, W, K) producing
padded ``[B, K]`` arrays with a validity mask, so a whole keyframe batch
extracts in a single device launch and shards over the batch axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfd2_tpu.ops.grid_sample import sample_at_points
from sfd2_tpu.ops.nms import simple_nms


class Keypoints(NamedTuple):
    """Padded keypoint set. Invalid rows have valid=False, score=0."""

    xy: jax.Array  # [B, K, 2] float32, (x, y) pixel coords at full res
    scores: jax.Array  # [B, K]
    descriptors: jax.Array  # [B, K, C] L2-normalised
    valid: jax.Array  # [B, K] bool
    labels: jax.Array | None = None  # [B, K] int32 semantic ids (0 = none)


def sample_descriptors(
    desc_map: jax.Array,
    xy: jax.Array,
    full_hw: tuple[int, int],
) -> jax.Array:
    """Sample and L2-normalise descriptors.

    Args:
      desc_map: [h, w, C] coarse (typically 1/4-res) descriptor map.
      xy: [K, 2] full-resolution (x, y) keypoint coords.
      full_hw: (H, W) of the full-resolution score map.
    """
    h_c, w_c = desc_map.shape[0], desc_map.shape[1]
    full_h, full_w = full_hw
    cx = xy[..., 0] * (w_c / full_w) - 0.5
    cy = xy[..., 1] * (h_c / full_h) - 0.5
    d = sample_at_points(desc_map, jnp.stack([cx, cy], axis=-1), padding_mode="zeros")
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.maximum(norm, 1e-12)


def _top_k_nms_cells(masked: jax.Array, k: int, h: int, w: int):
    """Exact two-stage top-k for NMS'd score maps.

    A radius-r NMS survivor is the strict maximum of its (2r+1)² window,
    so two (non-tied) survivors are > r apart — with r ≥ 3 a 4×4 cell
    (Chebyshev diameter 3) holds at most one finite candidate. Stage 1
    reduces the [H·W] map to per-cell max (dense reshape/transpose, no
    gather); stage 2 runs top_k on the 16×-smaller cell grid and
    recovers in-cell offsets by a 16-wide *slice* gather of the winning
    cell rows (contiguous, fast on TPU) + argmax. Measured v5e @1024²,
    K=4096: 0.92 → 0.35 ms/img vs the flat 1M-element top_k. Tie caveat:
    an EXACT score tie between two NMS survivors inside one 4×4 cell
    keeps only one of them (cell-max holds a single entry) where flat
    top_k would keep both — measure-zero for continuous scores, and NMS
    already makes equal neighbours non-survivors.
    """
    b = masked.shape[0]
    ch, cw = h // 4, w // 4
    mr = (
        masked.reshape(b, ch, 4, cw, 4)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, ch * cw, 16)
    )
    cmax = jnp.max(mr, axis=-1)
    vals, cid = jax.lax.top_k(cmax, k)
    rows = jnp.take_along_axis(mr, cid[:, :, None], axis=1)  # [b, k, 16]
    off = jnp.argmax(rows, axis=-1).astype(jnp.int32)
    cy, cx = cid // cw, cid % cw
    y = cy * 4 + off // 4
    x = cx * 4 + off % 4
    return vals, y * w + x


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius", "border"))
def extract_keypoints(
    heatmap: jax.Array,
    desc_map: jax.Array,
    stability: jax.Array | None = None,
    sizes: jax.Array | None = None,
    label_map: jax.Array | None = None,
    *,
    max_keypoints: int = 4096,
    conf_threshold: float = 0.001,
    nms_radius: int = 4,
    border: int = 4,
) -> Keypoints:
    """Full extraction program over a batch.

    Args:
      heatmap: [B, H, W] full-resolution detection scores.
      desc_map: [B, h, w, C] coarse descriptor map.
      stability: optional [B, H, W] semantic-stability multiplier
        (already mapped to {0.1, 0.5, 1.0} by the model head).
      sizes: optional [B, 2] true (w, h) of each image when the maps are
        zero-padded to a common shape — keypoints in the padded region
        are excluded and the border filter applies at the TRUE image
        edge, so padding never consumes top-K slots.
      label_map: optional [B, H, W] int32 per-pixel semantic ids (0 =
        unlabeled). When given, the top-K is LABELED-FIRST — all
        labeled candidates rank above every unlabeled one, each block
        internally sorted by score — reproducing the semantic-mask
        partition of ``nets/extractor.py:240-326`` (labeled keypoints
        kept first, remainder filled with best unlabeled), and per-
        keypoint ``labels`` are emitted for the NNML matcher
        (``it_loc/matcher.py:239``). The reference's per-keypoint
        python loop becomes one composite-key top-K on device.

    Returns `Keypoints` with K = max_keypoints padded rows per image,
    sorted by descending score (ref sorts by confidence too,
    ``nets/extractor.py:176``).
    """
    b, h, w = heatmap.shape
    k = max_keypoints

    if stability is not None:
        heatmap = heatmap * stability
    scores = simple_nms(heatmap, nms_radius)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if sizes is None:
        border_ok = (
            (xs >= border) & (xs < w - border) & (ys >= border) & (ys < h - border)
        )[None]
    else:
        w_i = sizes[:, 0][:, None, None]
        h_i = sizes[:, 1][:, None, None]
        border_ok = (
            (xs[None] >= border)
            & (xs[None] < w_i - border)
            & (ys[None] >= border)
            & (ys[None] < h_i - border)
        )
    keep = (scores > conf_threshold) & border_ok
    masked = jnp.where(keep, scores, -jnp.inf).reshape(b, h * w)

    if (
        label_map is None
        and h % 4 == 0
        and w % 4 == 0
        and nms_radius >= 3
        and k <= (h // 4) * (w // 4)
    ):
        top_scores, top_idx = _top_k_nms_cells(masked, k, h, w)
    elif label_map is None:
        top_scores, top_idx = jax.lax.top_k(masked, k)
    else:
        # Composite ranking key: every labeled candidate outranks every
        # unlabeled one (boost > global max score), blocks stay
        # score-sorted internally. top_k on the key == the reference's
        # two-phase labeled-first selection.
        labeled = (label_map > 0).reshape(b, h * w)
        boost = jnp.max(jnp.where(jnp.isfinite(masked), masked, 0.0)) + 1.0
        key = jnp.where(labeled, masked + boost, masked)
        _, top_idx = jax.lax.top_k(key, k)
        top_scores = jnp.take_along_axis(masked, top_idx, axis=1)
    valid = jnp.isfinite(top_scores)
    top_scores = jnp.where(valid, top_scores, 0.0)
    kx = (top_idx % w).astype(jnp.float32)
    ky = (top_idx // w).astype(jnp.float32)
    xy = jnp.stack([kx, ky], axis=-1)

    descs = jax.vmap(lambda d, p: sample_descriptors(d, p, (h, w)))(desc_map, xy)
    descs = jnp.where(valid[..., None], descs, 0.0)
    labels = None
    if label_map is not None:
        labels = jnp.take_along_axis(
            label_map.reshape(b, h * w).astype(jnp.int32), top_idx, axis=1
        )
        labels = jnp.where(valid, labels, 0)
    return Keypoints(
        xy=xy, scores=top_scores, descriptors=descs, valid=valid, labels=labels
    )
