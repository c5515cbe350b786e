"""Training convergence smoke test (VERDICT r03 #6).

Every other training test is single-step/finite-loss; this one proves the
distillation loop *learns*: 200 optimisation steps on one synthetic
shifted pair must (a) reduce the total SegLoss and (b) improve the
student detector's agreement with its (frozen, random-init) SuperPoint
teacher heatmap from initialisation — the purpose of the reference's
train loop (``trainer.py:349``), whose implicit proof is its shipped
checkpoint. A gradient-path sign error that still produces finite,
slowly-drifting losses fails here.

Runtime: ~30 s on CPU (48² images, batch 1, jitted step).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.models.superpoint import SuperPoint
from sfd2_tpu.training.sampler import NghSampler2DS
from sfd2_tpu.training.losses import SegLossConfig
from sfd2_tpu.training.train_step import (
    TrainBatch,
    TrainConfig,
    init_train_state,
    make_train_step,
)


def _shifted_pair_batch(rng, r=48, shift=4):
    """One training pair with real correspondence structure: image2 is
    image1 translated by `shift` px; aflow records the ground truth
    (NaN outside the overlap, like PairLoader's invalid-flow masking)."""
    base = rng.normal(size=(r + shift, r + shift, 3)).astype(np.float32)
    for _ in range(2):  # smooth so descriptors have local structure
        base = (
            base
            + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, -1, 0) + np.roll(base, -1, 1)
        ) / 5
    img1 = base[:r, :r]
    img2 = base[shift : shift + r, shift : shift + r]
    ys, xs = np.mgrid[0:r, 0:r]
    aflow = np.stack([xs - shift, ys - shift], -1).astype(np.float32)[None]
    aflow[(aflow < 0).any(-1)] = np.nan
    seg = np.zeros((1, r, r), np.int32)
    seg[:, : r // 2] = 2   # stable class half
    seg[:, r // 2 :] = 13  # dynamic class half
    return TrainBatch(
        image1=jnp.array(img1[None]),
        image2=jnp.array(img2[None]),
        gray1=jnp.array(img1.mean(-1, keepdims=True)[None]),
        gray2=jnp.array(img2.mean(-1, keepdims=True)[None]),
        aflow=jnp.array(aflow),
        seg1=jnp.array(seg),
    ), img1


def test_training_converges_and_tracks_teacher():
    r = 48
    # Seed pinned to the calibration run (texture quality moves the
    # teacher-correlation gain; other seeds converge too, more slowly).
    batch, img1 = _shifted_pair_batch(np.random.default_rng(3), r=r)
    model = ResSegNetV2(require_stability=True, require_feature=True)
    sp = SuperPoint()
    cfg = TrainConfig(
        lr=3e-4,
        loss=SegLossConfig(topk_per_half=32),
        sampler=NghSampler2DS(
            ngh=3, subq=-4, pos_d=1, neg_d=2, border=3, subd_neg=-4
        ),
    )
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    sp_vars = sp.init(jax.random.PRNGKey(1), jnp.zeros((1, r, r, 1)))
    step = jax.jit(make_train_step(model, sp, sp_vars, cfg))

    gt = np.asarray(sp.apply(sp_vars, batch.gray1)["scores"])[0]

    def det_corr(state):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.array(img1[None]),
        )
        return float(np.corrcoef(np.asarray(out.score)[0].ravel(), gt.ravel())[0, 1])

    corr_init = det_corr(state)
    losses = []
    for i in range(200):
        state, metrics = step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i)
        )
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 200

    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    # Calibrated: measured drop 13.4% / corr 0.018 → 0.12 at these seeds;
    # thresholds leave ~40% margin for cross-platform float drift.
    assert last < first * 0.92, (first, last)
    corr_after = det_corr(state)
    assert corr_after > corr_init + 0.06, (corr_init, corr_after)
