import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.models.superpoint import SuperPoint
from sfd2_tpu.parallel.mesh import make_mesh, put_batch, put_replicated
from sfd2_tpu.training.sampler import NghSampler2DS
from sfd2_tpu.training.losses import SegLossConfig
from sfd2_tpu.training.train_step import (
    TrainBatch,
    TrainConfig,
    init_train_state,
    make_train_step,
    warp_seg_forward,
)


def tiny_cfg():
    return TrainConfig(
        loss=SegLossConfig(topk_per_half=32),
        sampler=NghSampler2DS(ngh=3, subq=-4, pos_d=1, neg_d=2, border=3, subd_neg=-4),
    )


def make_batch(rng, b=2, r=64):
    ys, xs = np.mgrid[0:r, 0:r]
    aflow = np.stack([xs, ys], -1).astype(np.float32)[None].repeat(b, 0)
    aflow[:, : r // 8] = np.nan  # some invalid flow
    return TrainBatch(
        image1=jnp.array(rng.normal(size=(b, r, r, 3)).astype(np.float32)),
        image2=jnp.array(rng.normal(size=(b, r, r, 3)).astype(np.float32)),
        gray1=jnp.array(rng.random((b, r, r, 1)).astype(np.float32)),
        gray2=jnp.array(rng.random((b, r, r, 1)).astype(np.float32)),
        aflow=jnp.array(aflow),
        seg1=jnp.array(rng.integers(1, 150, size=(b, r, r)).astype(np.int32)),
    )


def test_warp_seg_forward_identity():
    seg1 = jnp.arange(16).reshape(1, 4, 4).astype(jnp.int32)
    ys, xs = np.mgrid[0:4, 0:4]
    aflow = jnp.array(np.stack([xs, ys], -1).astype(np.float32)[None])
    seg2, mask2 = warp_seg_forward(seg1, aflow)
    np.testing.assert_array_equal(np.array(seg2), np.array(seg1))
    assert bool(np.array(mask2).all())


def test_warp_seg_forward_invalid_flow():
    seg1 = jnp.ones((1, 4, 4), jnp.int32)
    aflow = jnp.full((1, 4, 4, 2), jnp.nan)
    seg2, mask2 = warp_seg_forward(seg1, aflow)
    assert not bool(np.array(mask2).any())


def test_train_step_reduces_loss(rng):
    model = ResSegNetV2(require_stability=True, require_feature=True)
    sp = SuperPoint()
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, key)
    sp_vars = sp.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    step = jax.jit(make_train_step(model, sp, sp_vars, cfg))
    batch = make_batch(rng)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 3
    # Same batch + same key: the update must reduce the loss.
    assert losses[-1] < losses[0], losses


def test_train_step_sharded_over_mesh(rng):
    """Data-parallel pjit over the 8-device CPU mesh — the SyncBatchNorm/DDP
    equivalent (SURVEY §2.4)."""
    mesh = make_mesh(8, ("data",))
    model = ResSegNetV2(require_stability=True, require_feature=True)
    sp = SuperPoint()
    cfg = tiny_cfg()
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    sp_vars = sp.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    step = make_train_step(model, sp, sp_vars, cfg)

    batch = make_batch(rng, b=8)
    with mesh:
        sharded_batch = put_batch(mesh, batch)
        state = put_replicated(mesh, state)
        jstep = jax.jit(step)
        new_state, metrics = jstep(state, sharded_batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    # Sharded result ≈ single-device result (global-batch semantics).
    state1 = init_train_state(model, cfg, jax.random.PRNGKey(0))
    _, metrics1 = jax.jit(step)(state1, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-3
    )


def test_train_step_with_teacher_feats(rng):
    """Precomputed ConvNeXt teacher features enable the seg_feat term."""
    from sfd2_tpu.training.losses import SegLossConfig

    model = ResSegNetV2(require_stability=True, require_feature=True)
    sp = SuperPoint()
    cfg = TrainConfig(
        loss=SegLossConfig(topk_per_half=32, seg_feat=True),
        sampler=NghSampler2DS(ngh=3, subq=-4, pos_d=1, neg_d=2, border=3, subd_neg=-4),
    )
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    sp_vars = sp.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    step = jax.jit(make_train_step(model, sp, sp_vars, cfg))
    b, r = 2, 64
    batch = make_batch(rng, b=b, r=r)
    feats = (
        jnp.array(rng.random((2 * b, r // 4, r // 4, 128)).astype(np.float32)),
        jnp.array(rng.random((2 * b, r // 4, r // 4, 256)).astype(np.float32)),
    )
    batch = batch._replace(teacher_feats=feats)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "seg_feat_loss" in metrics
    assert np.isfinite(float(metrics["seg_feat_loss"]))


def test_extractor_sharded_over_mesh(rng):
    """Mesh-sharded extraction equals single-device extraction."""
    from sfd2_tpu.parallel.mesh import make_mesh
    from sfd2_tpu.pipeline.extract import ExtractionConfig, Extractor

    model = ResSegNetV2(require_stability=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cfg = ExtractionConfig(max_keypoints=64, conf_threshold=1e-5, pad_multiple=32)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(8)]

    plain = Extractor(variables, cfg, model=model)
    f_ref = plain.extract_batch(imgs)

    mesh = make_mesh(8, ("data",))
    with mesh:
        sharded = Extractor(variables, cfg, model=model, mesh=mesh)
        f_sh = sharded.extract_batch(imgs)
    for a, b_ in zip(f_ref, f_sh):
        np.testing.assert_allclose(a.keypoints, b_.keypoints, atol=1e-4)
        np.testing.assert_allclose(a.scores, b_.scores, atol=1e-5)
