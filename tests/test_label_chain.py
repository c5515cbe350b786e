"""End-to-end semantic-label chain: mask ingestion → labeled-first top-K →
labels in the feature store → NNML label-aware matching.

Capability parity: ``nets/extractor.py:240-326`` (semantic-mask keypoint
partition: labeled keypoints kept first, per-keypoint labels emitted) and
``it_loc/matcher.py:239`` (matcher_with_label: a labeled feature never
matches a differently-labeled one).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.ops.extract import extract_keypoints
from sfd2_tpu.ops.matching import mutual_nn_match, mutual_nn_match_with_labels
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures, MatchStore
from sfd2_tpu.pipeline.extract import (
    ExtractionConfig,
    Extractor,
    load_label_map,
    _resize_labels_nearest,
)
from sfd2_tpu.pipeline.match import MatchConfig, match_pairs


def _separated_heatmap(h, w, pts, scores):
    hm = np.zeros((h, w), np.float32)
    for (y, x), s in zip(pts, scores):
        hm[y, x] = s
    return hm


def test_labeled_first_topk():
    """All labeled candidates outrank all unlabeled ones regardless of
    score; blocks internally score-sorted; labels gathered per keypoint."""
    h = w = 64
    # 6 well-separated peaks (NMS radius 4): 3 inside the labeled region
    # with LOW scores, 3 outside with HIGH scores.
    labeled_pts = [(10, 10), (10, 30), (10, 50)]
    unlabeled_pts = [(40, 10), (40, 30), (40, 50)]
    hm = _separated_heatmap(
        h, w, labeled_pts + unlabeled_pts, [0.2, 0.3, 0.1, 0.9, 0.8, 0.7]
    )
    labels = np.zeros((h, w), np.int32)
    labels[:20] = 7  # whole top band shares label 7
    desc = np.random.default_rng(0).normal(size=(1, h // 4, w // 4, 16))

    kp = extract_keypoints(
        jnp.asarray(hm[None]),
        jnp.asarray(desc, jnp.float32),
        label_map=jnp.asarray(labels[None]),
        max_keypoints=4,
        conf_threshold=0.01,
        nms_radius=4,
        border=2,
    )
    xy = np.asarray(kp.xy[0])
    lab = np.asarray(kp.labels[0])
    val = np.asarray(kp.valid[0])
    sc = np.asarray(kp.scores[0])
    assert val.all()
    # First 3 rows = the labeled (low-score) peaks, score-sorted.
    assert (lab[:3] == 7).all()
    np.testing.assert_allclose(sc[:3], [0.3, 0.2, 0.1], atol=1e-6)
    assert {tuple(p) for p in xy[:3].astype(int)} == {(10, 10), (30, 10), (50, 10)}
    # 4th slot: best unlabeled.
    assert lab[3] == 0
    np.testing.assert_allclose(sc[3], 0.9, atol=1e-6)


def test_plain_topk_unchanged_without_labels():
    h = w = 64
    hm = _separated_heatmap(h, w, [(10, 10), (40, 40)], [0.2, 0.9])
    desc = np.zeros((1, h // 4, w // 4, 16), np.float32)
    kp = extract_keypoints(
        jnp.asarray(hm[None]), jnp.asarray(desc),
        max_keypoints=2, conf_threshold=0.01,
    )
    assert kp.labels is None
    sc = np.asarray(kp.scores[0])
    np.testing.assert_allclose(sc, [0.9, 0.2], atol=1e-6)


@pytest.fixture(scope="module")
def extractor():
    model = ResSegNetV2(require_stability=True)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    cfg = ExtractionConfig(
        max_keypoints=128, conf_threshold=1e-6, resize_max=96, pad_multiple=32,
        batch_size=2,
    )
    return Extractor(variables, cfg, model=model)


def test_mask_ingestion_to_store_and_nnml(extractor, tmp_path, rng):
    """Full chain: image+mask files → extract_to_store(mask_dir) → labels
    dataset → NNML matching consumes them; NNML rejects cross-label
    matches that NNM accepts."""
    import cv2

    imdir = tmp_path / "imgs"
    maskdir = tmp_path / "masks"
    (imdir / "db").mkdir(parents=True)
    (maskdir / "db").mkdir(parents=True)

    # Same image twice → identical features; masks differ in the label id
    # of the left half (id 5 vs id 9), so left-half keypoints must not
    # cross-match under NNML but match trivially under NNM.
    img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    for n in ("db/a.jpg", "db/b.jpg"):
        cv2.imwrite(str(imdir / n), img)
    for n, left_id in (("db/a.png", 5), ("db/b.png", 9)):
        m = np.zeros((96, 96, 3), np.uint8)
        m[:, :48, 0] = left_id  # blue channel = low byte of packed id
        cv2.imwrite(str(maskdir / n), m)

    fpath = tmp_path / "feats.h5"
    with FeatureStore(fpath, "a") as store:
        n = extractor.extract_to_store(
            imdir, ["db/a.jpg", "db/b.jpg"], store, mask_dir=maskdir
        )
        assert n == 2
        fa = store.read("db/a.jpg")
        fb = store.read("db/b.jpg")
    assert fa.labels is not None and fb.labels is not None
    assert fa.labels.shape == (len(fa.keypoints),)
    # Left-half keypoints carry the mask id, right-half 0.
    left = fa.keypoints[:, 0] < 48
    assert (fa.labels[left] == 5).all()
    assert (fa.labels[~left] == 0).all()
    assert (fb.labels[fb.keypoints[:, 0] < 48] == 9).all()
    assert left.any() and (~left).any()

    # NNM on identical descriptors: everything matches to itself.
    mpath_nnm = tmp_path / "m_nnm.h5"
    with FeatureStore(fpath) as feats, MatchStore(mpath_nnm, "a") as ms:
        match_pairs(
            feats, [("db/a.jpg", "db/b.jpg")], ms,
            MatchConfig(matcher="NNM", max_keypoints=128, batch_size=1),
        )
        m_nnm, _ = ms.read("db/a.jpg", "db/b.jpg")
    # NNML: left-half (labels 5 vs 9) is incompatible → unmatched there.
    mpath_nnml = tmp_path / "m_nnml.h5"
    with FeatureStore(fpath) as feats, MatchStore(mpath_nnml, "a") as ms:
        match_pairs(
            feats, [("db/a.jpg", "db/b.jpg")], ms,
            MatchConfig(matcher="NNML", max_keypoints=128, batch_size=1),
        )
        m_nnml, _ = ms.read("db/a.jpg", "db/b.jpg")

    n_keep = len(fa.keypoints)
    left = left[:n_keep]
    assert (m_nnm >= 0).sum() > 0
    # NNM happily matches label-5 features to label-9 features (identical
    # descriptors → twin index match).
    nnm_targets = m_nnm[left][m_nnm[left] >= 0].astype(int)
    assert (fb.labels[nnm_targets] == 9).any()
    # NNML: a labeled feature may still match an UNLABELED one (the
    # reference's leftover block) but never a differently-labeled one.
    nnml_targets = m_nnml[left][m_nnml[left] >= 0].astype(int)
    assert (fb.labels[nnml_targets] != 9).all()
    assert (m_nnml[left] == -1).any()  # the twin matches are rejected
    # Unlabeled (right-half) keypoints still match under NNML.
    assert (m_nnml[~left] >= 0).any()


def test_nnml_masked_equivalence(rng):
    """The masked one-GEMM NNML equals per-label-block mutual NN on a
    random instance (reference matcher_with_label semantics)."""
    k, c = 32, 16
    d0 = rng.normal(size=(k, c)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 = rng.normal(size=(k, c)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    l0 = rng.integers(0, 3, size=k).astype(np.int32)  # labels 0 (none),1,2
    l1 = rng.integers(0, 3, size=k).astype(np.int32)

    m, _ = mutual_nn_match_with_labels(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(l0), jnp.asarray(l1)
    )
    m = np.asarray(m)
    for i, j in enumerate(m):
        if j >= 0:
            # label compatible
            assert l0[i] == l1[j] or l0[i] == 0 or l1[j] == 0


def test_load_label_map_packing(tmp_path):
    import cv2

    m = np.zeros((8, 8, 3), np.uint8)
    m[0, 0] = (1, 2, 3)  # BGR → id = 3·65536 + 2·256 + 1
    p = tmp_path / "m.png"
    cv2.imwrite(str(p), m)
    ids = load_label_map(p)
    assert ids[0, 0] == 3 * 65536 + 2 * 256 + 1
    assert ids[1, 1] == 0


def test_resize_labels_nearest():
    lab = np.arange(16, dtype=np.int32).reshape(4, 4)
    up = _resize_labels_nearest(lab, (8, 8))
    assert up.shape == (8, 8)
    assert set(np.unique(up)) <= set(range(16))
    # Exact 2x: each cell replicated.
    assert (up[0:2, 0:2] == lab[0, 0]).all()
    assert (up[6:8, 6:8] == lab[3, 3]).all()


def test_extract_cli_mask_and_baseline(tmp_path, rng):
    """CLI surface: --mask_dir writes labels; --extractor sift drives a
    baseline plug-in into the same store layout."""
    import cv2

    from sfd2_tpu.cli import extract_features as cli

    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "imgs" / "a.jpg"), img)
    m = np.zeros((120, 160, 3), np.uint8)
    m[:, :80, 0] = 9
    cv2.imwrite(str(tmp_path / "masks" / "a.png"), m)

    cli.main([
        "--image_dir", str(tmp_path / "imgs"),
        "--export_fn", str(tmp_path / "sift.h5"),
        "--extractor", "sift", "--conf", "sfd2-n1000-r1600",
    ])
    cli.main([
        "--image_dir", str(tmp_path / "imgs"),
        "--export_fn", str(tmp_path / "sfd2.h5"),
        "--mask_dir", str(tmp_path / "masks"),
    ])
    with FeatureStore(tmp_path / "sift.h5") as fs:
        assert len(fs.read("a.jpg").keypoints) > 0
    with FeatureStore(tmp_path / "sfd2.h5") as fs:
        f = fs.read("a.jpg")
        assert f.labels is not None
        assert set(np.unique(f.labels)) <= {0, 9}
