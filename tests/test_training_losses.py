import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from sfd2_tpu.training.ap_loss import quantize, compute_ap, ap_loss
from sfd2_tpu.training.sampler import NghSampler2DS, upscale_positions
from sfd2_tpu.training.losses import (
    SegLossConfig,
    SegLossInputs,
    seg_loss,
    reliability_loss,
)
from sfd2_tpu.training.semantics import (
    semantic_to_confidence,
    confidence_to_class,
    stability_category,
)


class TorchAPLoss(nn.Module):
    """Reference quantizer construction (nets/ap_loss.py, public R2D2)."""

    def __init__(self, nq=20, min=0, max=1):
        super().__init__()
        self.nq = nq
        gap = max - min
        self.quantizer = q = nn.Conv1d(1, 2 * nq, kernel_size=1, bias=True)
        a = (nq - 1) / gap
        q.weight.data[:nq] = -a
        q.bias.data[:nq] = torch.from_numpy(a * min + np.arange(nq, 0, -1)).float()
        q.weight.data[nq:] = a
        q.bias.data[nq:] = torch.from_numpy(np.arange(2 - nq, 2, 1) - a * min).float()
        q.weight.data[0] = q.weight.data[-1] = 0
        q.bias.data[0] = q.bias.data[-1] = 1

    def forward(self, x, label):
        q = self.quantizer(x.unsqueeze(1))
        q = torch.min(q[:, : self.nq], q[:, self.nq :]).clamp(min=0)
        nbs = q.sum(dim=-1)
        rec = (q * label.view(x.shape[0], 1, -1).float()).sum(dim=-1)
        prec = rec.cumsum(dim=-1) / (1e-16 + nbs.cumsum(dim=-1))
        rec = rec / rec.sum(dim=-1).unsqueeze(1)
        return (prec * rec).sum(dim=-1)


def test_quantizer_matches_reference(rng):
    x = rng.random((5, 30)).astype(np.float32)
    ours = np.array(quantize(jnp.array(x), 20))
    t = TorchAPLoss(20)
    with torch.no_grad():
        q = t.quantizer(torch.from_numpy(x).unsqueeze(1))
        theirs = torch.min(q[:, :20], q[:, 20:]).clamp(min=0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_compute_ap_matches_reference(rng):
    x = rng.random((8, 50)).astype(np.float32)
    labels = (rng.random((8, 50)) > 0.7).astype(np.float32)
    labels[:, 0] = 1  # ensure ≥1 positive per row
    ours = np.array(compute_ap(jnp.array(x), jnp.array(labels)))
    with torch.no_grad():
        theirs = TorchAPLoss(20)(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ap_perfect_ranking():
    scores = jnp.array([[0.95, 0.9, 0.1, 0.05]])
    labels = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    ap = float(compute_ap(scores, labels)[0])
    assert ap > 0.95
    bad = float(compute_ap(1 - scores, labels)[0])
    assert bad < 0.6


def test_semantics_tables():
    # class 3 = sky → invalid → 0.1; class 1 = wall → stable → 1.0;
    # class 13 = person → dynamic → 0.1; class 5 = tree → short-term → 0.5.
    labels = jnp.array([3, 1, 13, 5])
    conf = np.array(semantic_to_confidence(labels))
    np.testing.assert_allclose(conf, [0.1, 1.0, 0.1, 0.5])
    np.testing.assert_array_equal(
        np.array(confidence_to_class(jnp.array([0.1, 0.5, 1.0]))), [0, 1, 2]
    )
    np.testing.assert_array_equal(np.array(stability_category(labels)), [0, 1, 2, 3])


def _identity_setup(rng, b=2, h=16, w=16, d=16, scaling_step=2):
    """Two identical descriptor maps + identity flow → every query's true
    positive is itself."""
    hf, wf = h * 4, w * 4
    feat = rng.normal(size=(b, h, w, d)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    conf = np.full((b, hf, wf), 0.9, np.float32)
    ys, xs = np.mgrid[0:hf, 0:wf]
    aflow = np.stack([xs, ys], axis=-1).astype(np.float32)[None].repeat(b, 0)
    return feat, conf, aflow


def test_sampler_identity_flow_gives_high_ap(rng):
    feat, conf, aflow = _identity_setup(rng)
    sampler = NghSampler2DS(ngh=4, subq=-2, pos_d=2, neg_d=3, border=4, subd_neg=-2)
    s = sampler(
        jax.random.PRNGKey(0),
        jnp.array(feat), jnp.array(feat), jnp.array(conf), jnp.array(conf),
        jnp.array(aflow),
    )
    assert bool(np.array(s.mask).all())
    ap = np.array(compute_ap(s.scores, s.gt, weights=s.col_weights))
    # Self-similarity = 1 → positives dominate everywhere.
    assert ap.mean() > 0.9, ap.mean()


def test_sampler_invalid_flow_masked(rng):
    feat, conf, aflow = _identity_setup(rng)
    aflow[:, :, :32] = np.nan  # left half invalid
    sampler = NghSampler2DS(ngh=4, subq=-2, pos_d=1, neg_d=2, border=4, subd_neg=0)
    s = sampler(
        jax.random.PRNGKey(1),
        jnp.array(feat), jnp.array(feat), jnp.array(conf), jnp.array(conf),
        jnp.array(aflow),
    )
    mask = np.array(s.mask)
    assert 0 < mask.sum() < mask.size  # some masked, some alive
    assert np.isfinite(np.array(s.scores)).all()


def test_reliability_loss_discriminates(rng):
    feat, conf, aflow = _identity_setup(rng)
    sampler = NghSampler2DS(ngh=4, subq=-2, pos_d=1, neg_d=2, border=4, subd_neg=-2)
    good = float(
        reliability_loss(
            jax.random.PRNGKey(0),
            jnp.array(feat), jnp.array(feat), jnp.array(conf), jnp.array(conf),
            jnp.array(aflow), sampler,
        )
    )
    feat2 = rng.normal(size=feat.shape).astype(np.float32)
    feat2 /= np.linalg.norm(feat2, axis=-1, keepdims=True)
    bad = float(
        reliability_loss(
            jax.random.PRNGKey(0),
            jnp.array(feat), jnp.array(feat2), jnp.array(conf), jnp.array(conf),
            jnp.array(aflow), sampler,
        )
    )
    assert good < bad


def _full_loss_inputs(rng, b=1, hf=32, wf=32):
    hc, wc = hf // 8, wf // 8
    h, w = hf // 4, wf // 4
    two_b = 2 * b
    semi = rng.random((two_b, hc, wc, 65)).astype(np.float32) + 0.1
    semi /= semi.sum(-1, keepdims=True)
    gt_semi = rng.random((two_b, hc, wc, 65)).astype(np.float32) + 0.1
    gt_semi /= gt_semi.sum(-1, keepdims=True)
    desc = rng.normal(size=(two_b, h, w, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    ys, xs = np.mgrid[0:hf, 0:wf]
    aflow = np.stack([xs, ys], -1).astype(np.float32)[None].repeat(b, 0)
    seg = rng.integers(1, 150, size=(two_b, hf, wf)).astype(np.int32)
    conf = np.array(semantic_to_confidence(jnp.array(seg)))
    return SegLossInputs(
        semi=jnp.array(semi),
        gt_semi=jnp.array(gt_semi),
        score=jnp.array(rng.random((two_b, hf, wf)).astype(np.float32)),
        gt_score=jnp.array(rng.random((two_b, hf, wf)).astype(np.float32)),
        desc=jnp.array(desc),
        aflow=jnp.array(aflow),
        weight=jnp.ones((two_b, hf, wf)),
        seg_confidence=jnp.array(conf),
        seg_mask=jnp.ones((two_b, hf, wf), bool),
        seg=jnp.array(seg),
        stability=jnp.array(rng.random((two_b, hf, wf, 3)).astype(np.float32)),
        pred_feats=(jnp.array(rng.random((two_b, h, w, 8)).astype(np.float32)),),
        gt_feats=(jnp.array(rng.random((two_b, h, w, 8)).astype(np.float32)),),
    )


def test_seg_loss_all_terms_finite(rng):
    inp = _full_loss_inputs(rng)
    sampler = NghSampler2DS(ngh=3, subq=-2, pos_d=1, neg_d=2, border=3, subd_neg=-2)
    cfg = SegLossConfig(topk_per_half=50)
    out = seg_loss(jax.random.PRNGKey(0), inp, sampler, cfg)
    for k in ["det_loss", "unsup_desc_loss", "seg_det_loss", "seg_feat_loss",
              "seg_desc_loss", "loss"]:
        assert k in out, k
        assert np.isfinite(float(out[k])), (k, out[k])


def test_seg_loss_gradients_flow(rng):
    inp = _full_loss_inputs(rng)
    sampler = NghSampler2DS(ngh=3, subq=-2, pos_d=1, neg_d=2, border=3, subd_neg=-2)
    cfg = SegLossConfig(topk_per_half=50)

    def f(desc):
        return seg_loss(jax.random.PRNGKey(0), inp._replace(desc=desc), sampler, cfg)["loss"]

    g = jax.grad(f)(inp.desc)
    assert np.isfinite(np.array(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_cel_det_loss_rejected_at_config_time():
    """'cel' consumes logits the shipped model never exposes; the config
    must fail loudly with a pointer to the README deviation
    (nets/losses.py:326-330)."""
    import pytest
    from sfd2_tpu.training.losses import SegLossConfig

    with pytest.raises(ValueError, match="cel"):
        SegLossConfig(det_loss="cel")
    with pytest.raises(ValueError, match="unknown det_loss"):
        SegLossConfig(det_loss="bogus")
