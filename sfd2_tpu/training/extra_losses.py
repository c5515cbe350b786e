"""Alternative training losses selectable by config (JAX).

Capability parity:
* ``nets/repeatability_loss.py`` — CosimLoss (patch cosine similarity of
  the flow-warped score maps, N=16 patches) and PeakyLoss
  (1 − (local max − local mean)); available via the reference's loss DSL.
* ``nets/reliability_loss.py:514`` — TripletLossV2, the D2Net-style
  margin loss on the 1/4-res descriptor grid with score-weighted mean,
  and the label-aware hardest-negative variant (TripletLoss v3's
  seg-aware distractor masking, ``:466-486``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sfd2_tpu.ops.grid_sample import grid_sample_bilinear
from sfd2_tpu.training.sampler import downscale_positions


def _warp_by_flow(fmap: jax.Array, aflow: jax.Array) -> jax.Array:
    """Sample `fmap` [B, H, W, C] of image 2 at img1's flow targets;
    invalid flow (NaN) samples to 0 (FullSampler._warp semantics)."""
    h, w = fmap.shape[1], fmap.shape[2]
    gx = aflow[..., 0] * (2.0 / (w - 1)) - 1.0
    gy = aflow[..., 1] * (2.0 / (h - 1)) - 1.0
    bad = ~jnp.isfinite(gx) | ~jnp.isfinite(gy)
    grid = jnp.stack([jnp.where(bad, 9e9, gx), jnp.where(bad, 9e9, gy)], -1)
    return jax.vmap(lambda f, g: grid_sample_bilinear(f, g, align_corners=True))(
        fmap, grid
    )


def cosim_loss(score1: jax.Array, score2: jax.Array, aflow: jax.Array, n: int = 16):
    """1 − mean patchwise cosine similarity between img1's score map and
    img2's map warped into img1 (CosimLoss, N=16)."""
    b, h, w = score1.shape
    warped = _warp_by_flow(score2[..., None], aflow)[..., 0]
    ph, pw = h // n, w // n

    def patches(x):
        x = x[:, : ph * n, : pw * n]
        x = x.reshape(b, ph, n, pw, n).transpose(0, 1, 3, 2, 4).reshape(b, ph * pw, n * n)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    cosim = jnp.sum(patches(score1) * patches(warped), axis=-1)
    return 1.0 - jnp.mean(cosim)


def peaky_loss(score: jax.Array, n: int = 16):
    """1 − mean(local max − local mean) over N×N windows (PeakyLoss)."""
    from jax import lax

    x = score[..., None]
    args = dict(
        window_dimensions=(1, n, n, 1),
        window_strides=(1, n, n, 1),
        padding="VALID",
    )
    local_max = lax.reduce_window(x, -jnp.inf, lax.max, **args)[..., 0]
    local_sum = lax.reduce_window(x, 0.0, lax.add, **args)[..., 0]
    local_mean = local_sum / (n * n)
    return 1.0 - jnp.mean(local_max - local_mean)


def triplet_loss_d2net(
    desc1: jax.Array,  # [B, h, w, D] (1/4-res grid)
    desc2: jax.Array,
    score1: jax.Array,  # [B, H, W] full-res scores
    score2: jax.Array,
    aflow: jax.Array,  # [B, H, W, 2]
    margin: float = 1.0,
    scaling_step: int = 2,
    safe_radius: int = 4,
    stride: int = 2,
    labels1: jax.Array | None = None,
    labels2: jax.Array | None = None,
):
    """D2Net-style triplet on the descriptor grid (TripletLossV2).

    For each grid cell of img1 with valid flow: positive = img2 cell at
    the flow target; hardest negative = best-matching cell outside
    `safe_radius` of the target (optionally restricted to different
    semantic labels); loss = score-weighted mean of
    relu(margin + d(pos) − d(neg)).
    """
    b, h, w, d = desc1.shape
    ys = jnp.arange(0, h, stride)
    xs = jnp.arange(0, w, stride)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gy = gy.reshape(-1)
    gx = gx.reshape(-1)
    n_q = gy.shape[0]
    scale = 2**scaling_step
    hf, wf = score1.shape[1], score1.shape[2]

    yu = jnp.clip(gy * scale + scale // 2, 0, hf - 1)
    xu = jnp.clip(gx * scale + scale // 2, 0, wf - 1)

    def one_image(d1, d2, s1, s2, fl, l1, l2):
        anchors = d1[gy, gx]  # [Nq, D]
        w1 = s1[yu, xu]
        target = fl[yu, xu]  # [Nq, 2] full-res
        ok = jnp.all(jnp.isfinite(target), -1)
        tgt = jnp.floor(
            downscale_positions(jnp.where(ok[:, None], target, 0.0), scaling_step)
        ).astype(jnp.int32)
        tx = jnp.clip(tgt[:, 0], 0, w - 1)
        ty = jnp.clip(tgt[:, 1], 0, h - 1)
        ok = ok & (tgt[:, 0] >= 0) & (tgt[:, 1] >= 0) & (tgt[:, 0] < w) & (tgt[:, 1] < h)
        pos = d2[ty, tx]
        w2 = s2[jnp.clip(ty * scale + scale // 2, 0, hf - 1),
                jnp.clip(tx * scale + scale // 2, 0, wf - 1)]

        flat2 = d2.reshape(h * w, d)
        sim = anchors @ flat2.T  # [Nq, h*w]
        yy = jnp.arange(h * w) // w
        xx = jnp.arange(h * w) % w
        near = (jnp.abs(yy[None, :] - ty[:, None]) <= safe_radius) & (
            jnp.abs(xx[None, :] - tx[:, None]) <= safe_radius
        )
        if l1 is not None and l2 is not None:
            same_label = l1[gy, gx][:, None] == l2.reshape(-1)[None, :]
            near = near | same_label
        sim = jnp.where(near, -jnp.inf, sim)
        neg_sim = jnp.max(sim, axis=1)
        d_pos = jnp.sqrt(jnp.maximum(2 - 2 * jnp.sum(anchors * pos, -1), 1e-12))
        d_neg = jnp.sqrt(jnp.maximum(2 - 2 * neg_sim, 1e-12))
        per = jax.nn.relu(margin + d_pos - d_neg)
        wgt = w1 * w2 * ok.astype(d1.dtype)
        return jnp.sum(per * wgt) / jnp.maximum(jnp.sum(wgt), 1e-8)

    l1s = labels1 if labels1 is not None else [None] * b
    l2s = labels2 if labels2 is not None else [None] * b
    losses = [
        one_image(desc1[i], desc2[i], score1[i], score2[i], aflow[i],
                  None if labels1 is None else labels1[i],
                  None if labels2 is None else labels2[i])
        for i in range(b)
    ]
    return jnp.mean(jnp.stack(losses))
