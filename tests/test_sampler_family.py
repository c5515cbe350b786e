"""Sampler family + TripletLoss v1/v3 (reference ``nets/sampler.py:28-536``,
``nets/reliability_loss.py:132-513``): analytic behavioural tests on
constructed scenes (identity flow, planted hard negatives, seg gating).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfd2_tpu.training.sampler import (
    FarNearSampler,
    NghSampler,
    NghSampler2,
    NghSampler2DS,
    SubSampler,
    warp_to_img1,
)
from sfd2_tpu.training.losses import (
    SegLossConfig,
    reliability_loss,
)
from sfd2_tpu.training.extra_losses import triplet_loss_v1, triplet_loss_v3


def _identity_scene(rng, b=2, h=48, w=48, d=16):
    f1 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f1.copy()
    c1 = rng.random((b, h, w)).astype(np.float32)
    c2 = rng.random((b, h, w)).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    aflow = np.broadcast_to(np.stack([xs, ys], -1), (b, h, w, 2)).copy()
    return f1, f2, c1, c2, jnp.asarray(aflow)


KEY = jax.random.PRNGKey(0)


def test_warp_identity(rng):
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    warped, ok = warp_to_img1(jnp.asarray(f2), aflow)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(warped), f2, atol=1e-5)


def test_warp_invalid_flow_masked(rng):
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    af = np.asarray(aflow).copy()
    af[:, :10] = np.nan
    warped, ok = warp_to_img1(jnp.asarray(f2), jnp.asarray(af))
    ok = np.asarray(ok)
    assert not ok[:, :10].any() and ok[:, 10:].all()
    assert np.allclose(np.asarray(warped)[:, :10], 0.0)


def test_subsampler_identity_gt(rng):
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    s = SubSampler(border=8, subq=4, subd=4)(KEY, f1, f2, c1, c2, aflow)
    sc, gt = np.asarray(s.scores), np.asarray(s.gt)
    # Identity flow + identical features: every query has exactly one GT
    # column with similarity 1, and it is the row max.
    assert (gt.sum(axis=1) == 1).all()
    assert np.allclose(sc[gt > 0.5], 1.0, atol=1e-4)
    assert (np.abs(sc.max(axis=1) - 1.0) < 1e-4).all()
    # Cross-batch: database spans the whole batch (B·Nd columns).
    nq = sc.shape[0] // 2
    assert sc.shape[1] == sc.shape[0]
    # GT for image-0 queries must lie in image-0 columns only.
    assert gt[:nq, nq:].sum() == 0 and gt[nq:, :nq].sum() == 0


def test_subsampler_subq_ne_subd(rng):
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    s = SubSampler(border=8, subq=8, subd=4)(KEY, f1, f2, c1, c2, aflow)
    gt = np.asarray(s.gt)
    # Denser database grid contains every query pixel → still 1 GT/row.
    assert (gt.sum(axis=1) == 1).all()


def test_nghsampler_center_positive(rng):
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    s = NghSampler(ngh=4, subq=4, subd=1, ignore=1, border=8)(
        KEY, f1, f2, c1, c2, aflow
    )
    sc, gt = np.asarray(s.scores), np.asarray(s.gt)
    # Column 0 = the true correspondence (sim 1); gt marks only col 0.
    assert np.allclose(sc[:, 0], 1.0, atol=1e-4)
    assert (gt[:, 0] == 1).all() and (gt[:, 1:] == 0).all()
    # Ring excludes d² ≤ ignore²=1: count matches the offset formula.
    n_ring = sum(
        1
        for j in range(-4, 5)
        for i in range(-4, 5)
        if 1 < i * i + j * j <= 16
    )
    assert sc.shape[1] == 1 + n_ring


def test_farnear_maxpool_shapes(rng):
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    fn = FarNearSampler(subq=4, ngh=4, subd_ngh=1, subd_far=8, border=8,
                        maxpool_ngh=True)(KEY, f1, f2, c1, c2, aflow)
    far = SubSampler(border=8, subq=4, subd=8)(KEY, f1, f2, c1, c2, aflow)
    # maxpool collapses the close block to ONE positive column.
    assert fn.scores.shape[1] == 1 + far.scores.shape[1]
    assert (np.asarray(fn.gt)[:, 0] == 1).all()
    # close max over an identity scene = the perfect match.
    assert np.allclose(np.asarray(fn.scores)[:, 0], 1.0, atol=1e-4)


def test_all_samplers_feed_ap_loss(rng):
    """Every sampler's SampledScores works through reliability_loss."""
    f1, f2, c1, c2, aflow = _identity_scene(rng)
    for smp in (
        SubSampler(border=8, subq=4, subd=4),
        NghSampler(ngh=4, subq=4, subd=1, border=8),
        FarNearSampler(subq=4, ngh=4, subd_ngh=1, subd_far=8, border=8),
        NghSampler2(ngh=4, subq=-4, subd=1, pos_d=2, neg_d=3, border=8),
        NghSampler2DS(ngh=4, subq=-4, subd=1, pos_d=2, neg_d=3, border=8,
                      scaling_step=0),
    ):
        loss = reliability_loss(
            KEY, jnp.asarray(f1), jnp.asarray(f2),
            jnp.asarray(c1), jnp.asarray(c2), aflow, smp,
        )
        assert np.isfinite(float(loss)), type(smp).__name__


def test_nghsampler2_seg_aware_distractors(rng):
    """forward2: a spatially-near distractor with a DIFFERENT label stays
    live (col_weight 1); with identical labels it is suppressed."""
    f1, f2, c1, c2, aflow = _identity_scene(rng, b=1)
    smp = NghSampler2(ngh=4, subq=-2, subd=1, pos_d=2, neg_d=4, border=8,
                      subd_neg=-2)
    same = np.zeros((1, 48, 48), np.int32)
    halves = np.zeros((1, 48, 48), np.int32)
    halves[:, :, 24:] = 3
    s_plain = smp(KEY, f1, f2, c1, c2, aflow)
    s_same = smp(KEY, f1, f2, c1, c2, aflow, jnp.asarray(same), jnp.asarray(same))
    s_diff = smp(KEY, f1, f2, c1, c2, aflow, jnp.asarray(halves), jnp.asarray(halves))
    # Uniform labels reproduce the plain suppression exactly.
    np.testing.assert_array_equal(
        np.asarray(s_plain.col_weights), np.asarray(s_same.col_weights)
    )
    # Split labels keep strictly more distractors live (near pairs that
    # straddle the boundary become legitimate negatives).
    assert np.asarray(s_diff.col_weights).sum() > np.asarray(s_plain.col_weights).sum()


def test_triplet_v1_hard_negative_raises_loss(rng):
    b, h, w, d = 1, 48, 48, 16
    f1 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f1.copy()
    c = np.full((b, h, w), 1.0, np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    aflow = np.stack([xs, ys], -1)[None]
    base = float(triplet_loss_v1(f1, f2, c, c, jnp.asarray(aflow), step=4, border=8))
    # Plant a far-away EXACT copy of the (12,12) descriptor at (36,36):
    # it becomes a zero-distance hard negative for that anchor.
    f2h = f2.copy()
    f2h[0, 36, 36] = f2h[0, 12, 12]
    hard = float(triplet_loss_v1(f1, f2h, c, c, jnp.asarray(aflow), step=4, border=8))
    assert hard > base


def test_triplet_v3_same_label_negative_gating(rng):
    b, h, w, d = 1, 48, 48, 16
    f1 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f1.copy()
    # Plant the duplicate hard negative (far copy of (12,12) at (36,36)).
    f2[0, 36, 36] = f2[0, 12, 12]
    c = np.full((b, h, w), 1.0, np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    aflow = np.stack([xs, ys], -1)[None]
    sm = np.ones((b, h, w), bool)
    seg_same = np.zeros((b, h, w), np.int32)
    # v3's hardest negative must share the label: when the duplicate sits
    # in a DIFFERENT label region it is excluded → lower loss.
    seg_split = np.zeros((b, h, w), np.int32)
    seg_split[:, 24:] = 7  # (36,36) lives in label 7; anchor (12,12) in 0
    args = lambda seg: (
        f1, f2, c, c, jnp.asarray(aflow),
        jnp.asarray(seg), jnp.asarray(seg), jnp.asarray(sm), jnp.asarray(sm),
    )
    l_same = float(triplet_loss_v3(*args(seg_same), border=8))
    l_split = float(triplet_loss_v3(*args(seg_split), border=8))
    assert l_same > l_split


def test_seg_loss_desc_variants_finite(rng):
    """Every desc_loss family member runs through seg_loss and yields a
    finite scalar (selection plumbing, TrainConfig-reachable)."""
    from sfd2_tpu.training.losses import SegLossInputs, seg_loss
    from sfd2_tpu.training.sampler import NghSampler2DS

    B, H, W = 1, 64, 64
    hc, wc = H // 8, W // 8
    h4, w4 = H // 4, W // 4
    semi = rng.normal(size=(2 * B, hc, wc, 65)).astype(np.float32)
    score = rng.random((2 * B, H, W)).astype(np.float32)
    desc = rng.normal(size=(2 * B, h4, w4, 16)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    ysf, xsf = np.mgrid[0:H, 0:W].astype(np.float32)
    afl = np.broadcast_to(np.stack([xsf, ysf], -1), (B, H, W, 2)).copy()
    inp = SegLossInputs(
        semi=jnp.asarray(semi), gt_semi=jnp.asarray(semi),
        score=jnp.asarray(score), gt_score=jnp.asarray(score),
        desc=jnp.asarray(desc), aflow=jnp.asarray(afl),
        weight=jnp.ones((2 * B, H, W)),
        seg=jnp.zeros((2 * B, H, W), jnp.int32),
        seg_mask=jnp.ones((2 * B, H, W), bool),
        seg_confidence=jnp.ones((2 * B, H, W)),
        stability=jax.nn.softmax(
            jnp.asarray(rng.normal(size=(2 * B, H, W, 3)).astype(np.float32))
        ),
    )
    smp = NghSampler2DS(ngh=4, subq=-4, subd=1, pos_d=2, neg_d=3, border=8,
                        subd_neg=-4, scaling_step=2)
    for dl in ("wapv2", "tripletv1", "tripletv2", "tripletv3"):
        out = seg_loss(KEY, inp, smp, SegLossConfig(desc_loss=dl))
        assert np.isfinite(float(out["loss"])), dl
        assert np.isfinite(float(out["unsup_desc_loss"])), dl
    with pytest.raises(ValueError):
        seg_loss(KEY, inp, smp, SegLossConfig(desc_loss="nope"))


def test_full_sampler_named_and_dense(rng):
    """FullSampler (nets/sampler.py:28-81) as a selectable class: dense
    unit-stride grid == SubSampler with border=0, subq=subd=1."""
    import jax
    import jax.numpy as jnp
    from sfd2_tpu.training.sampler import FullSampler, SubSampler, make_sampler

    b, h, w, d = 1, 8, 8, 16
    f1 = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w]
    aflow = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32)[None])
    key = jax.random.PRNGKey(0)
    s_full = FullSampler()(key, f1, f2, None, None, aflow)
    assert s_full.scores.shape == (h * w, h * w)  # every pixel is a query
    s_sub = SubSampler(border=0, subq=1, subd=1)(key, f1, f2, None, None, aflow)
    np.testing.assert_array_equal(np.asarray(s_full.scores), np.asarray(s_sub.scores))
    # Identity flow -> GT is the identity assignment.
    np.testing.assert_array_equal(
        np.asarray(s_full.gt), np.eye(h * w, dtype=np.float32))


def test_make_sampler_registry():
    from sfd2_tpu.training.sampler import (
        FarNearSampler, FullSampler, NghSampler, NghSampler2, NghSampler2DS,
        SubSampler, make_sampler,
    )
    import pytest

    assert isinstance(make_sampler("ngh2ds"), NghSampler2DS)
    assert isinstance(make_sampler("ngh2"), NghSampler2)
    assert isinstance(make_sampler("full"), FullSampler)
    assert isinstance(make_sampler("sub", subq=4), SubSampler)
    assert isinstance(make_sampler("ngh"), NghSampler)
    assert isinstance(make_sampler("farnear"), FarNearSampler)
    with pytest.raises(ValueError, match="unknown sampler"):
        make_sampler("nope")
