"""Query/positive/negative sampling on dense descriptor maps (JAX).

Capability parity: the full ``nets/sampler.py`` family —
* ``NghSampler2DS:537`` — the sampler the shipped config trains with
  (ngh=7, subq=−4 random queries, pos_d=3, neg_d=5, border=8,
  subd_neg=−4 distractors, maxpool_pos, scaling_step=2);
* ``FullSampler:28`` warp semantics (`warp_to_img1`), ``SubSampler:82``,
  ``NghSampler:149``, ``FarNearSampler:204``, and ``NghSampler2:264``
  including the seg-aware distractor masking of ``forward2:434-447``
  (a spatially-near distractor with a DIFFERENT semantic label stays a
  valid negative);
* the position up/downscale helpers (``nets/sampler.py:16-25``).

TPU-native redesign: the reference gathers with data-dependent index
lists; here every set has a static size derived from the map dims —
Nq queries per image, P pos-ring offsets, Nn neg-ring offsets,
Nd distractors — so the whole sampling + scoring graph (including the
[B·Nq, B·Nd] distractor GEMM, HOT LOOP of §3.4) is one jitted program.
Invalid flow targets are masked, not filtered. All samplers return the
same `SampledScores` contract, so any of them can feed the AP loss.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def upscale_positions(pos, scaling_steps: int = 0):
    for _ in range(scaling_steps):
        pos = pos * 2 + 0.5
    return pos


def downscale_positions(pos, scaling_steps: int = 0):
    for _ in range(scaling_steps):
        pos = (pos - 0.5) / 2
    return pos


class SampledScores(NamedTuple):
    scores: jax.Array  # [N, M] similarity rows (pos | neg | distractors)
    gt: jax.Array  # [N, M] binary labels (1 = positive column)
    mask: jax.Array  # [N] valid query rows
    qconf: jax.Array  # [N] reliability at query positions
    col_weights: jax.Array  # [N, M] 1 for live columns, 0 for suppressed


@dataclasses.dataclass(frozen=True)
class NghSampler2DS:
    ngh: int = 7
    subq: int = -4
    subd: int = 1
    pos_d: int = 3
    neg_d: int = 5
    border: int = 8
    subd_neg: int = -4
    maxpool_pos: bool = True
    scaling_step: int = 2

    def offsets(self):
        """Precompute pos/neg ring offsets (``nets/sampler.py:292-309``)."""
        rad = (self.ngh // self.subd) * self.ngh
        pos, neg = [], []
        for j in range(-rad, rad + 1, self.subd):
            for i in range(-rad, rad + 1, self.subd):
                d2 = i * i + j * j
                if d2 <= self.pos_d**2:
                    pos.append((i, j))
                elif self.neg_d**2 <= d2 <= self.ngh**2:
                    neg.append((i, j))
        return np.array(pos, np.int32), np.array(neg, np.int32)

    def num_queries(self, h: int, w: int) -> int:
        step = abs(self.subq)
        return max(1, ((h - 2 * self.border) * (w - 2 * self.border)) // step**2)

    def __call__(
        self,
        key: jax.Array,
        feat1: jax.Array,  # [B, h, w, D] descriptor map of image 1
        feat2: jax.Array,  # [B, h, w, D] descriptor map of image 2
        conf1: jax.Array,  # [B, H, W] reliability of image 1 (full res)
        conf2: jax.Array,  # [B, H, W] reliability of image 2
        aflow: jax.Array,  # [B, H, W, 2] absolute flow img1→img2 (NaN invalid)
        seg1: jax.Array | None = None,  # [B, H, W] semantic ids (forward2)
        seg2: jax.Array | None = None,
    ) -> SampledScores:
        b, h, w, d = feat1.shape
        hf, wf = conf1.shape[1], conf1.shape[2]
        nq = self.num_queries(h, w)
        pos_off, neg_off = self.offsets()
        pos_off = jnp.asarray(pos_off)  # [P, 2] (dx, dy)
        neg_off = jnp.asarray(neg_off)  # [Nn, 2]

        kq, kd = jax.random.split(key)
        if self.subq < 0:
            x1 = jax.random.randint(kq, (b, nq), self.border, w - self.border)
            y1 = jax.random.randint(
                jax.random.fold_in(kq, 1), (b, nq), self.border, h - self.border
            )
        else:
            xs = jnp.arange(self.border, w - self.border, self.subq)
            ys = jnp.arange(self.border, h - self.border, self.subq)
            gx, gy = jnp.meshgrid(xs, ys)
            x1 = jnp.broadcast_to(gx.reshape(-1), (b, gx.size))
            y1 = jnp.broadcast_to(gy.reshape(-1), (b, gy.size))
            nq = x1.shape[1]

        bidx = jnp.arange(b)[:, None]
        feat1_s = feat1[bidx, y1, x1]  # [B, Nq, D]

        y1_up = upscale_positions(y1.astype(jnp.float32), self.scaling_step).astype(jnp.int32)
        x1_up = upscale_positions(x1.astype(jnp.float32), self.scaling_step).astype(jnp.int32)
        y1_up = jnp.clip(y1_up, 0, hf - 1)
        x1_up = jnp.clip(x1_up, 0, wf - 1)
        qconf = conf1[bidx, y1_up, x1_up]  # [B, Nq]

        # Ground-truth positions in image 2 (desc grid).
        flow = aflow[bidx, y1_up, x1_up]  # [B, Nq, 2] full-res (x, y)
        flow_ok = jnp.all(jnp.isfinite(flow), axis=-1)
        flow = jnp.where(flow_ok[..., None], flow, -1e6)
        xy2_up = jnp.floor(flow + 0.5).astype(jnp.int32)
        xy2 = jnp.floor(
            downscale_positions(xy2_up.astype(jnp.float32), self.scaling_step)
        ).astype(jnp.int32)
        x2, y2 = xy2[..., 0], xy2[..., 1]
        mask = flow_ok & (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)

        def gather2(ys, xs):
            ys = jnp.clip(ys, 0, h - 1)
            xs = jnp.clip(xs, 0, w - 1)
            return feat2[bidx[..., None], ys, xs]  # [B, Nq, K, D]

        # Positives: ring ≤ pos_d around GT, max-pooled to one score.
        yp = y2[..., None] + pos_off[None, None, :, 1]
        xp = x2[..., None] + pos_off[None, None, :, 0]
        pscores = jnp.einsum("bqd,bqkd->bqk", feat1_s, gather2(yp, xp))
        if self.maxpool_pos:
            pbest = jnp.argmax(pscores, axis=-1)
            pscores = jnp.max(pscores, axis=-1, keepdims=True)
            # qconf ← average with conf2 at the selected positive.
            sel_x = jnp.clip(
                x2 + jnp.take_along_axis(
                    jnp.broadcast_to(pos_off[None, None, :, 0], xp.shape), pbest[..., None], -1
                )[..., 0],
                0, w - 1,
            )
            sel_y = jnp.clip(
                y2 + jnp.take_along_axis(
                    jnp.broadcast_to(pos_off[None, None, :, 1], yp.shape), pbest[..., None], -1
                )[..., 0],
                0, h - 1,
            )
            sel_xu = jnp.clip(
                upscale_positions(sel_x.astype(jnp.float32), self.scaling_step).astype(jnp.int32),
                0, wf - 1,
            )
            sel_yu = jnp.clip(
                upscale_positions(sel_y.astype(jnp.float32), self.scaling_step).astype(jnp.int32),
                0, hf - 1,
            )
            qconf = (qconf + conf2[bidx, sel_yu, sel_xu]) / 2

        # Negatives: ring neg_d..ngh.
        yn = y2[..., None] + neg_off[None, None, :, 1]
        xn = x2[..., None] + neg_off[None, None, :, 0]
        nscores = jnp.einsum("bqd,bqkd->bqk", feat1_s, gather2(yn, xn))

        n_out = pscores.shape[-1] + nscores.shape[-1]
        parts = [pscores, nscores]
        col_w_parts = [
            jnp.ones_like(pscores),
            jnp.ones_like(nscores),
        ]

        if self.subd_neg:
            nd = self.num_queries(h, w)
            x3 = jax.random.randint(kd, (b, nd), self.border, w - self.border)
            y3 = jax.random.randint(
                jax.random.fold_in(kd, 1), (b, nd), self.border, h - self.border
            )
            distr = feat2[bidx, y3, x3].reshape(b * nd, feat2.shape[-1])
            dscores = jnp.einsum(
                "bqd,md->bqm", feat1_s, distr, preferred_element_type=jnp.float32
            )  # [B, Nq, B*Nd]
            # Suppress distractors that are actually positives (same image,
            # within neg_d of GT): column weight 0 (reference zeroes scores;
            # zeroing *and* dropping from the histogram is cleaner and
            # equivalent for AP since a 0-score negative is counted last).
            x3f = x3.reshape(-1)[None, None, :]
            y3f = y3.reshape(-1)[None, None, :]
            b3 = jnp.repeat(jnp.arange(b), nd)[None, None, :]
            dis2 = (x3f - x2[..., None]) ** 2 + (y3f - y2[..., None]) ** 2
            dis2 = dis2 + (b3 != bidx[..., None]).astype(dis2.dtype) * self.neg_d**2
            if seg1 is not None and seg2 is not None:
                # forward2 (``nets/sampler.py:434-447``): a nearby
                # distractor whose semantic label DIFFERS from the query's
                # is pushed past the suppression radius — semantics make
                # it a legitimate hard negative even when spatially close.
                seg_q = seg1[bidx, y1_up, x1_up]  # [B, Nq]
                x3u = jnp.clip(
                    upscale_positions(x3.astype(jnp.float32), self.scaling_step
                                      ).astype(jnp.int32), 0, wf - 1)
                y3u = jnp.clip(
                    upscale_positions(y3.astype(jnp.float32), self.scaling_step
                                      ).astype(jnp.int32), 0, hf - 1)
                seg_d = seg2[jnp.repeat(jnp.arange(b), nd),
                             y3u.reshape(-1), x3u.reshape(-1)]  # [B*Nd]
                diff_seg = seg_q[..., None] != seg_d[None, None, :]
                dis2 = dis2 + diff_seg.astype(dis2.dtype) * self.neg_d**2
            live = (dis2 >= self.neg_d**2).astype(feat1.dtype)
            parts.append(dscores * live)
            col_w_parts.append(live)

        scores = jnp.concatenate(parts, axis=-1)
        col_w = jnp.concatenate(col_w_parts, axis=-1)
        gt = jnp.zeros_like(scores).at[..., : pscores.shape[-1]].set(1.0)

        n = b * nq
        m = scores.shape[-1]
        return SampledScores(
            scores=scores.reshape(n, m),
            gt=gt.reshape(n, m),
            mask=mask.reshape(n),
            qconf=qconf.reshape(n),
            col_weights=col_w.reshape(n, m),
        )


@dataclasses.dataclass(frozen=True)
class NghSampler2(NghSampler2DS):
    """``NghSampler2`` (``nets/sampler.py:264``): identical scheme at a
    single resolution (no up/downscale) — the R2D2-family setting where
    descriptor maps are full-res. Pass seg1/seg2 to `__call__` for the
    forward2 seg-aware distractor masking."""

    scaling_step: int = 0


# ---------------------------------------------------------------------------
# Warp-based samplers (FullSampler / SubSampler / NghSampler / FarNear)
# ---------------------------------------------------------------------------


def warp_to_img1(feat2: jax.Array, aflow: jax.Array):
    """``FullSampler._warp`` (``nets/sampler.py:49-66``): bilinearly sample
    img2's map at img1's flow targets. feat2 [B, h, w, C], aflow
    [B, h, w, 2] (same resolution). Returns (feat2to1 [B,h,w,C],
    mask2to1 [B,h,w] bool — in-bounds finite flow)."""
    from sfd2_tpu.ops.grid_sample import sample_at_points

    h, w = feat2.shape[1], feat2.shape[2]
    gx, gy = aflow[..., 0], aflow[..., 1]
    ok = (
        jnp.isfinite(gx) & jnp.isfinite(gy)
        & (gx >= 0) & (gy >= 0) & (gx <= w - 1) & (gy <= h - 1)
    )
    pts = jnp.where(ok[..., None], aflow, 0.0)
    warped = jax.vmap(
        lambda f, p: sample_at_points(f, p.reshape(-1, 2), padding_mode="zeros")
    )(feat2, pts)
    warped = warped.reshape(feat2.shape[0], h, w, feat2.shape[-1])
    return jnp.where(ok[..., None], warped, 0.0), ok


def _grid_idx(border: int, step: int, h: int, w: int):
    ys = np.arange(border, h - border, step)
    xs = np.arange(border, w - border, step)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return jnp.asarray(gy.reshape(-1)), jnp.asarray(gx.reshape(-1))


@dataclasses.dataclass(frozen=True)
class SubSampler:
    """``SubSampler`` (``nets/sampler.py:82``): queries = strided grid of
    img1, database = same-strided grid of the flow-warped img2, across
    the WHOLE batch (global [B·Nq, B·Nd] score matrix, non-perimage
    path). Ground truth = pixel-index equality."""

    border: int = 16
    subq: int = 8
    subd: int = 8

    def __call__(self, key, feat1, feat2, conf1, conf2, aflow,
                 seg1=None, seg2=None) -> SampledScores:
        b, h, w, d = feat1.shape
        feat2to1, ok2 = warp_to_img1(feat2, aflow)
        conf2to1 = (
            warp_to_img1(conf2[..., None], aflow)[0][..., 0]
            if conf2 is not None else None
        )
        yq, xq = _grid_idx(self.border, self.subq, h, w)
        yd, xd = _grid_idx(self.border, self.subd, h, w)
        bidx = jnp.arange(b)[:, None]
        q = feat1[bidx, yq[None], xq[None]].reshape(b * yq.size, d)
        db = feat2to1[bidx, yd[None], xd[None]].reshape(b * yd.size, d)
        scores = jnp.einsum("nd,md->nm", q, db, preferred_element_type=jnp.float32)
        idx_q = (jnp.arange(b)[:, None] * (h * w) + yq[None] * w + xq[None]).reshape(-1)
        idx_d = (jnp.arange(b)[:, None] * (h * w) + yd[None] * w + xd[None]).reshape(-1)
        gt = (idx_q[:, None] == idx_d[None, :]).astype(scores.dtype)
        mask = ok2[bidx, yq[None], xq[None]].reshape(-1)
        if conf1 is not None and conf2to1 is not None:
            qconf = (
                conf1[bidx, yq[None], xq[None]] + conf2to1[bidx, yq[None], xq[None]]
            ).reshape(-1) / 2
        else:
            qconf = jnp.ones_like(mask, feat1.dtype)
        return SampledScores(scores, gt, mask, qconf, jnp.ones_like(scores))


@dataclasses.dataclass(frozen=True)
class FullSampler(SubSampler):
    """``FullSampler`` (``nets/sampler.py:28-81``): the dense limit of the
    grid scheme — EVERY pixel of img1 is a query against every
    flow-warped pixel of img2 (unit stride, no border). The dense warp
    itself is `warp_to_img1`; this wrapper makes it a named, selectable
    sampler (TrainConfig / --sampler full). Quadratic in pixels — use
    small crops."""

    border: int = 0
    subq: int = 1
    subd: int = 1


def make_sampler(name: str, **kwargs):
    """Sampler registry for config/CLI selection (reference constructs
    samplers via its eval() DSL, ``train.py:195``; here: typed names)."""
    table = {
        "ngh2ds": NghSampler2DS,
        "ngh2": NghSampler2,
        "full": FullSampler,
        "sub": SubSampler,
        "ngh": NghSampler,
        "farnear": FarNearSampler,
    }
    if name not in table:
        raise ValueError(f"unknown sampler {name!r}; choose from {sorted(table)}")
    return table[name](**kwargs)


def _ring_offsets(ngh: int, subd: int, ignore: int):
    """Offsets with ignore² < i²+j² ≤ ngh² (``nets/sampler.py:185-195``)."""
    rad = (ngh // subd) * ngh
    out = []
    for j in range(-rad, rad + 1, subd):
        for i in range(-rad, rad + 1, subd):
            d2 = i * i + j * j
            if ignore**2 < d2 <= ngh**2:
                out.append((i, j))
    return np.array(out, np.int32)


@dataclasses.dataclass(frozen=True)
class NghSampler:
    """``NghSampler`` (``nets/sampler.py:149``): for each strided query of
    img1, the positive is the warped img2 at the same position and the
    negatives are the warped img2 at ring offsets ignore < r ≤ ngh."""

    ngh: int = 4
    subq: int = 1
    subd: int = 1
    ignore: int = 1
    border: int | None = None

    def __call__(self, key, feat1, feat2, conf1, conf2, aflow,
                 seg1=None, seg2=None) -> SampledScores:
        b, h, w, d = feat1.shape
        border = self.border if self.border is not None else self.ngh
        feat2to1, ok2 = warp_to_img1(feat2, aflow)
        conf2to1 = (
            warp_to_img1(conf2[..., None], aflow)[0][..., 0]
            if conf2 is not None else None
        )
        yq, xq = _grid_idx(border, self.subq, h, w)
        off = jnp.asarray(_ring_offsets(self.ngh, self.subd, self.ignore))
        bidx = jnp.arange(b)[:, None]
        q = feat1[bidx, yq[None], xq[None]]  # [B, Nq, D]
        # Scores at center (positive) + each ring offset.
        yo = jnp.clip(yq[None, :, None] + off[None, None, :, 1], 0, h - 1)
        xo = jnp.clip(xq[None, :, None] + off[None, None, :, 0], 0, w - 1)
        center = jnp.einsum(
            "bqd,bqd->bq", q, feat2to1[bidx, yq[None], xq[None]]
        )[..., None]
        ring = jnp.einsum(
            "bqd,bqkd->bqk", q, feat2to1[bidx[..., None], yo, xo]
        )
        scores = jnp.concatenate([center, ring], axis=-1)
        gt = jnp.zeros_like(scores).at[..., 0].set(1.0)
        mask = ok2[bidx, yq[None], xq[None]]
        if conf1 is not None and conf2to1 is not None:
            qconf = (
                conf1[bidx, yq[None], xq[None]] + conf2to1[bidx, yq[None], xq[None]]
            ) / 2
        else:
            qconf = jnp.ones_like(mask, feat1.dtype)
        n = b * yq.size
        m = scores.shape[-1]
        return SampledScores(
            scores.reshape(n, m), gt.reshape(n, m), mask.reshape(n),
            qconf.reshape(n), jnp.ones((n, m), feat1.dtype),
        )


@dataclasses.dataclass(frozen=True)
class FarNearSampler:
    """``FarNearSampler`` (``nets/sampler.py:204``): per query, negatives
    from BOTH a close ring (NghSampler) and a far batch-wide grid
    (SubSampler); `maxpool_ngh` collapses the close block to its max as
    the single positive."""

    subq: int = 8
    ngh: int = 4
    subd_ngh: int = 1
    subd_far: int = 16
    border: int | None = None
    ignore: int = 1
    maxpool_ngh: bool = False

    def __call__(self, key, feat1, feat2, conf1, conf2, aflow,
                 seg1=None, seg2=None) -> SampledScores:
        border = self.border if self.border is not None else self.ngh
        close = NghSampler(
            ngh=self.ngh, subq=self.subq, subd=self.subd_ngh,
            ignore=0 if self.maxpool_ngh else self.ignore, border=border,
        )(key, feat1, feat2, conf1, conf2, aflow)
        far = SubSampler(border=border, subq=self.subq, subd=self.subd_far)(
            key, feat1, feat2, conf1, conf2, aflow
        )
        s1, g1 = close.scores, close.gt
        if self.maxpool_ngh:
            s1 = jnp.max(s1, axis=1, keepdims=True)
            g1 = g1[:, 0:1]
        return SampledScores(
            scores=jnp.concatenate([s1, far.scores], axis=1),
            gt=jnp.concatenate([g1, far.gt], axis=1),
            mask=close.mask,
            qconf=close.qconf,
            col_weights=jnp.concatenate(
                [jnp.ones_like(s1), far.col_weights], axis=1
            ),
        )
