"""Query/positive/negative sampling on dense descriptor maps (JAX).

Capability parity: ``nets/sampler.py:537`` (NghSampler2DS — the sampler
the shipped config trains with: ngh=7, subq=−4 random queries, pos_d=3,
neg_d=5, border=8, subd_neg=−4 distractors, maxpool_pos, scaling_step=2)
plus the position up/downscale helpers (``nets/sampler.py:16-25``).

TPU-native redesign: the reference gathers with data-dependent index
lists; here every set has a static size derived from the map dims —
Nq random queries per image, P pos-ring offsets, Nn neg-ring offsets,
Nd distractors — so the whole sampling + scoring graph (including the
[B·Nq, B·Nd] distractor GEMM, HOT LOOP of §3.4) is one jitted program.
Invalid flow targets are masked, not filtered.
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
