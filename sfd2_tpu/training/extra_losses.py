"""Alternative training losses selectable by config (JAX).

Capability parity:
* ``nets/repeatability_loss.py`` — CosimLoss (patch cosine similarity of
  the flow-warped score maps, N=16 patches) and PeakyLoss
  (1 − (local max − local mean)); available via the reference's loss DSL.
* ``nets/reliability_loss.py:514`` — TripletLossV2, the D2Net-style
  margin loss on the 1/4-res descriptor grid with score-weighted mean,
  and the label-aware hardest-negative variant (TripletLoss v3's
  seg-aware distractor masking, ``:466-486``).
* ``nets/reliability_loss.py:132`` — TripletLoss v1 (symmetric
  hardest-negative over sampled grids of BOTH images, manhattan-gated,
  reliability-weighted) and ``:369`` — v3 (sqrt distances, candidates
  gated by conf ≥ 0.51 + seg validity, hardest negative restricted to
  the SAME semantic label, hinge averaged over active rows).
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


def _grid_yx(border: int, step: int, h: int, w: int):
    import numpy as np

    ys = np.arange(border, h - border, step)
    xs = np.arange(border, w - border, step)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return jnp.asarray(gy.reshape(-1)), jnp.asarray(gx.reshape(-1))


def triplet_loss_v1(
    desc1: jax.Array,  # [B, h, w, D] full-res descriptor maps
    desc2: jax.Array,
    conf1: jax.Array,  # [B, h, w] reliability
    conf2: jax.Array,
    aflow: jax.Array,  # [B, h, w, 2] (NaN = invalid)
    step: int = 8,
    margin: float = 1.0,
    border: int = 16,
    near_l1: int = 3,
):
    """TripletLoss v1 (``nets/reliability_loss.py:132-249``).

    Queries on a strided grid of img1; positive = img2 at the flow
    target; hardest negative = min squared-L2 over the SAME grid in
    either image, excluding candidates within `near_l1` manhattan
    distance of the true correspondence (excluded entries get +10, the
    reference's sentinel). Loss = mean over valid rows of
    relu(margin + d_pos − min(neg1, neg2)) · (conf1+conf2)/2.
    The reference's per-batch python loop and boolean filtering become a
    batched masked program.
    """
    b, h, w, d = desc1.shape
    gy, gx = _grid_yx(border, step, h, w)

    def one(d1, d2, c1, c2, fl):
        target = fl[gy, gx]  # [N, 2]
        ok = jnp.all(jnp.isfinite(target), -1)
        t = jnp.floor(jnp.where(ok[:, None], target, 0.0) + 0.5).astype(jnp.int32)
        tx, ty = t[:, 0], t[:, 1]
        ok = ok & (tx >= 0) & (ty >= 0) & (tx < w) & (ty < h)
        tx = jnp.clip(tx, 0, w - 1)
        ty = jnp.clip(ty, 0, h - 1)
        f1 = d1[gy, gx]  # [N, D] anchors
        f2 = d2[ty, tx]  # [N, D] positives
        pos_dist = 2.0 - 2.0 * jnp.sum(f1 * f2, -1)

        cand2 = d2[gy, gx]  # [N, D] candidates in img2 (same grid)
        nd1 = 2.0 - 2.0 * (f1 @ cand2.T)  # [N, N]
        l1_2 = jnp.abs(tx[:, None] - gx[None, :]) + jnp.abs(ty[:, None] - gy[None, :])
        nd1 = jnp.min(nd1 + (l1_2 < near_l1) * 10.0, axis=1)

        cand1 = d1[gy, gx]
        nd2 = 2.0 - 2.0 * (f2 @ cand1.T)
        l1_1 = jnp.abs(gx[:, None] - gx[None, :]) + jnp.abs(gy[:, None] - gy[None, :])
        nd2 = jnp.min(nd2 + (l1_1 < near_l1) * 10.0, axis=1)

        diff = jax.nn.relu(margin + pos_dist - jnp.minimum(nd1, nd2))
        conf12 = (c1[gy, gx] + c2[ty, tx]) / 2.0
        wgt = ok.astype(d1.dtype)
        return jnp.sum(diff * conf12 * wgt) / jnp.maximum(jnp.sum(wgt), 1.0)

    return jnp.mean(jax.vmap(one)(desc1, desc2, conf1, conf2, aflow))


def triplet_loss_v3(
    desc1: jax.Array,  # [B, h, w, D]
    desc2: jax.Array,
    conf1: jax.Array,  # [B, h, w]
    conf2: jax.Array,
    aflow: jax.Array,  # [B, h, w, 2]
    seg1: jax.Array,  # [B, h, w] semantic labels
    seg2: jax.Array,
    seg_mask1: jax.Array,  # [B, h, w] bool validity
    seg_mask2: jax.Array,
    key: jax.Array | None = None,
    n_samples: int | None = None,
    margin: float = 1.0,
    border: int = 16,
    conf_th: float = 0.51,
    near_r: float = 3.0,
):
    """TripletLoss v3 (``nets/reliability_loss.py:369-513``): the
    seg-aware variant — sqrt descriptor distances, negative candidates
    gated by reliability ≥ conf_th AND seg validity, candidates within
    euclidean `near_r` of the correspondence OR with a DIFFERENT semantic
    label excluded (+10 sentinel: the hardest negative must share the
    query's label), hinge summed over active (diff > 0) rows.

    The reference draws random positions (step −1); a static grid with
    masks is used here (`n_samples` unused but kept for API clarity) —
    same distribution of candidates, jit-stable shapes.
    """
    b, h, w, d = desc1.shape
    gy, gx = _grid_yx(border, 2, h, w)

    def one(d1, d2, c1, c2, fl, s1, s2, m1, m2):
        # Candidate validity per image (reference filters; we mask).
        c1_ok = (c1[gy, gx] >= conf_th) & m1[gy, gx]
        c2_ok = (c2[gy, gx] >= conf_th) & m2[gy, gx]

        # Query rows: img1 candidates with valid flow.
        target = fl[gy, gx]
        ok = jnp.all(jnp.isfinite(target), -1)
        t = jnp.floor(jnp.where(ok[:, None], target, 0.0) + 0.5).astype(jnp.int32)
        tx, ty = t[:, 0], t[:, 1]
        ok = ok & (tx >= 0) & (ty >= 0) & (tx < w) & (ty < h) & c1_ok
        tx = jnp.clip(tx, 0, w - 1)
        ty = jnp.clip(ty, 0, h - 1)

        f1 = d1[gy, gx]
        f2 = d2[ty, tx]
        pos_dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.sum(f1 * f2, -1), 0.0) + 1e-4)
        seg1_q = s1[gy, gx]
        seg2_t = s2[ty, tx]

        # Negatives in img2: grid candidates, same-label, conf-gated.
        cand2 = d2[gy, gx]
        nd1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * (f1 @ cand2.T), 0.0) + 1e-4)
        d2_2 = jnp.sqrt(
            (tx[:, None] - gx[None, :]) ** 2.0 + (ty[:, None] - gy[None, :]) ** 2.0
        )
        seg2_c = s2[gy, gx]
        pen1 = (
            (d2_2 <= near_r) * 10.0
            + (seg2_t[:, None] != seg2_c[None, :]) * 10.0
            + (~c2_ok)[None, :] * 10.0
        )
        nd1 = jnp.min(nd1 + pen1, axis=1)

        cand1 = f1
        nd2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * (f2 @ cand1.T), 0.0) + 1e-4)
        d2_1 = jnp.sqrt(
            (gx[:, None] - gx[None, :]) ** 2.0 + (gy[:, None] - gy[None, :]) ** 2.0
        )
        pen2 = (
            (d2_1 <= near_r) * 10.0
            + (seg1_q[:, None] != seg1_q[None, :]) * 10.0
            + (~c1_ok)[None, :] * 10.0
        )
        nd2 = jnp.min(nd2 + pen2, axis=1)

        diff = margin + pos_dist - jnp.minimum(nd1, nd2)
        conf12 = (c1[gy, gx] + c2[ty, tx]) / 2.0
        active = ok & (diff > 0)
        return jnp.sum(diff * conf12 * active) / jnp.maximum(
            jnp.sum(active.astype(d1.dtype)), 1.0
        )

    return jnp.mean(
        jax.vmap(one)(desc1, desc2, conf1, conf2, aflow, seg1, seg2, seg_mask1, seg_mask2)
    )
