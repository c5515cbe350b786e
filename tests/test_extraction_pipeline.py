import numpy as np
import jax
import pytest

from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.pipeline.extract import (
    Extractor,
    ExtractionConfig,
    EXTRACTION_CONFS,
    normalize_image,
)
from sfd2_tpu.io.feature_store import FeatureStore


@pytest.fixture(scope="module")
def small_extractor():
    model = ResSegNetV2(require_stability=True)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cfg = ExtractionConfig(
        max_keypoints=256, conf_threshold=1e-5, resize_max=128, pad_multiple=32,
        batch_size=2,
    )
    return Extractor(variables, cfg, model=model)


def test_extract_batch_shapes(small_extractor, rng):
    imgs = [
        rng.random((96, 120, 3)).astype(np.float32),
        rng.random((80, 100, 3)).astype(np.float32),
    ]
    feats = small_extractor.extract_batch(imgs)
    assert len(feats) == 2
    for f, im in zip(feats, imgs):
        assert f.keypoints.shape[1] == 2
        assert f.descriptors.shape == (len(f.keypoints), 128)
        assert len(f.scores) == len(f.keypoints)
        assert np.all(f.keypoints[:, 0] < im.shape[1])
        assert np.all(f.keypoints[:, 1] < im.shape[0])
        # unit descriptors
        if len(f.keypoints):
            np.testing.assert_allclose(
                np.linalg.norm(f.descriptors, axis=1), 1.0, atol=1e-4
            )


def test_extract_padding_does_not_leak_keypoints(small_extractor, rng):
    """Keypoints must never fall in the zero-padded region."""
    img = rng.random((70, 90, 3)).astype(np.float32)  # pads to 96x96
    feats = small_extractor.extract_batch([img])[0]
    assert np.all(feats.keypoints[:, 0] < 90)
    assert np.all(feats.keypoints[:, 1] < 70)


def test_extract_to_store_and_resume(small_extractor, tmp_path, rng):
    import cv2

    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(3):
        im = (rng.random((150, 200, 3)) * 255).astype(np.uint8)
        name = f"img_{i}.png"
        cv2.imwrite(str(d / name), im)
        names.append(name)

    store_path = tmp_path / "f.h5"
    with FeatureStore(store_path, "w") as fs:
        n = small_extractor.extract_to_store(d, names, fs)
        assert n == 3
        # resume: nothing to do
        n = small_extractor.extract_to_store(d, names, fs)
        assert n == 0
        f = fs.read(names[0])
        # keypoints rescaled to original resolution (200x150 > resize_max 128
        # → stored coords exceed the resized grid)
        assert f.image_size.tolist() == [200, 150]
        assert np.all(f.keypoints[:, 0] <= 200)


def test_conf_registry():
    assert EXTRACTION_CONFS["sfd2-n4096-r1600"].max_keypoints == 4096
    assert EXTRACTION_CONFS["sfd2-n4096-r1024"].resize_max == 1024
    assert len(EXTRACTION_CONFS["sfd2-n4096-r1600-ms"].scales) == 3


def test_normalize_image():
    img = np.ones((4, 4, 3), np.float32)
    out = normalize_image(img)
    np.testing.assert_allclose(
        out[0, 0], (1 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5,
    )


def test_multiscale_extraction(small_extractor, rng):
    """Multi-scale confs concatenate per-scale detections rescaled to the
    base resolution (extract.py:87 pyramid parity)."""
    import dataclasses

    from sfd2_tpu.pipeline.extract import Extractor

    cfg = dataclasses.replace(
        small_extractor.cfg, scales=(1.0, 0.75), max_keypoints=256
    )
    ex = Extractor(small_extractor.variables, cfg, model=small_extractor.model)
    img = rng.random((96, 128, 3)).astype(np.float32)
    single = small_extractor.extract_batch([img])[0]
    multi = ex.extract_batch([img])[0]
    assert len(multi.keypoints) >= len(single.keypoints)
    assert np.all(multi.keypoints[:, 0] < 128)
    assert np.all(multi.keypoints[:, 1] < 96)
    # Sorted by score across scales.
    assert np.all(np.diff(multi.scores) <= 1e-6)


def test_bf16_trunk_keypoints_close_to_f32():
    """The bf16 trunk (TPU default) must keep keypoint sets close to the
    f32 path: heads are f32, so only near-tie rankings may shift."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.pipeline.extract import ExtractionConfig, Extractor

    rng = np.random.RandomState(7)
    img = rng.rand(96, 128, 3).astype(np.float32)
    model = ResSegNetV2(require_stability=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3)))
    cfg = ExtractionConfig(max_keypoints=256, resize_max=None, bf16=False)
    f32_feats = Extractor(variables, cfg, model=model).extract_batch([img])[0]
    bf_feats = Extractor(
        variables, dataclasses.replace(cfg, bf16=True), model=model
    ).extract_batch([img])[0]
    a = {tuple(np.round(p, 0)) for p in f32_feats.keypoints}
    b = {tuple(np.round(p, 0)) for p in bf_feats.keypoints}
    overlap = len(a & b) / max(1, min(len(a), len(b)))
    assert overlap > 0.7, overlap


def test_auto_scales_pyramid():
    """×1/1.2-until-min-edge<256 pyramid (extract.py:87-200), per-image
    depth on a ragged batch."""
    from sfd2_tpu.pipeline.extract import auto_scales

    scales, active = auto_scales([1024, 300, 255])
    # 1024/1.2^k >= 256 up to k=7 (1024/1.2^7 = 286.0, /1.2^8 = 238.4).
    assert len(scales) == 8
    assert scales[0] == 1.0
    np.testing.assert_allclose(scales[1], 1 / 1.2)
    # 300 -> depth 1 (300/1.2 = 250 < 256); 255 -> depth 1.
    assert [a for a in active[0]] == [True, True, True]
    assert [a for a in active[1]] == [True, False, False]
    assert all(not a for a in active[7][1:])


def test_multiscale_auto_non_square(small_extractor, rng):
    """scales='auto' on a non-square image: keypoints from every pyramid
    level land inside the ORIGINAL resolution, and deeper levels add
    keypoints relative to single-scale."""
    from sfd2_tpu.pipeline.extract import auto_scales

    cfg = ExtractionConfig(
        max_keypoints=512, conf_threshold=1e-6, resize_max=None,
        pad_multiple=32, scales="auto",
    )
    # Patch the auto threshold down so a small test image yields >1 level.
    import sfd2_tpu.pipeline.extract as pe

    old = pe._AUTO_MIN_EDGE
    pe._AUTO_MIN_EDGE = 48
    try:
        scales, active = auto_scales([96])
        assert len(scales) >= 2
        img = rng.random((96, 160, 3)).astype(np.float32)
        ex = Extractor(small_extractor.variables, cfg,
                       model=small_extractor.model)
        feats = ex.extract_batch([img])[0]
        single = Extractor(
            small_extractor.variables,
            ExtractionConfig(max_keypoints=512, conf_threshold=1e-6,
                             resize_max=None, pad_multiple=32),
            model=small_extractor.model,
        ).extract_batch([img])[0]
        assert len(feats.keypoints) > 0
        assert np.all(feats.keypoints[:, 0] < img.shape[1])
        assert np.all(feats.keypoints[:, 1] < img.shape[0])
        assert len(feats.keypoints) >= len(single.keypoints)
    finally:
        pe._AUTO_MIN_EDGE = old


def test_extract_to_store_groups_by_bucket_shape(tmp_path, rng):
    """A mixed portrait/landscape chunk must dispatch per padded-bucket
    group, not pad everything to the joint (square) max: the portrait
    and landscape jit buckets exist, the joint-max square one does not
    (each extra bucket is a multi-minute remote compile on TPU, and
    square-padding a whole chunk wastes up to 2x conv compute)."""
    import cv2

    model = ResSegNetV2(require_stability=True)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cfg = ExtractionConfig(
        max_keypoints=64, conf_threshold=1e-5, resize_max=128, pad_multiple=32,
        batch_size=4,
    )
    ex = Extractor(variables, cfg, model=model)

    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i, hw in enumerate([(64, 128), (128, 64), (64, 128), (128, 64)]):
        im = (rng.random((*hw, 3)) * 255).astype(np.uint8)
        name = f"img_{i}.png"
        cv2.imwrite(str(d / name), im)
        names.append(name)

    with FeatureStore(tmp_path / "f.h5", "w") as fs:
        n = ex.extract_to_store(d, names, fs)
        assert n == 4
        for name in names:
            assert fs.read(name).keypoints.shape[1] == 2

    shapes = {k[0][:2] for k in ex._programs}
    assert (64, 128) in shapes and (128, 64) in shapes
    assert (128, 128) not in shapes  # the joint-max square bucket


def test_extract_to_store_bounded_jit_programs(tmp_path, rng):
    """Interleaved portrait/landscape lists must NOT mint a per-chunk zoo
    of (B, hp, wp) programs (ADVICE r03): the whole todo list is grouped
    by bucket shape first, then chunked, with remainder batch dims padded
    to a power of two — so each shape bucket traces a bounded batch-dim
    set (here exactly one trace per bucket), instead of up to batch_size
    distinct multi-minute remote compiles."""
    import cv2

    model = ResSegNetV2(require_stability=True)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cfg = ExtractionConfig(
        max_keypoints=64, conf_threshold=1e-5, resize_max=128, pad_multiple=32,
        batch_size=4,
    )
    ex = Extractor(variables, cfg, model=model)

    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    # 6 images alternating orientation: naive chunking would split every
    # chunk of 4 into sub-batches of sizes {2, 1}, minting extra traces.
    for i in range(6):
        hw = (64, 128) if i % 2 == 0 else (128, 64)
        im = (rng.random((*hw, 3)) * 255).astype(np.uint8)
        name = f"img_{i}.png"
        cv2.imwrite(str(d / name), im)
        names.append(name)

    with FeatureStore(tmp_path / "f.h5", "w") as fs:
        assert ex.extract_to_store(d, names, fs) == 6
        for name in names:
            f = fs.read(name)
            assert f.keypoints.shape[1] == 2
            assert len(f.keypoints) > 0  # dummy batch-padding didn't leak

    shapes = {k[0][:2] for k in ex._programs}
    assert shapes == {(64, 128), (128, 64)}
    # Each group of 3 pads its single chunk to batch dim 4: exactly one
    # trace per shape bucket.
    for prog in ex._programs.values():
        assert prog._cache_size() == 1


def test_fused_stem_extractor_matches_standard(small_extractor, rng):
    """Extractor(fused_stem=True) keypoints/descriptors match the
    standard path (the s2d stem is a float-exact repack — ops/stem.py;
    only summation order differs, so near-tie top-K order may swap on
    equal scores, hence set-level comparison with tight numerics)."""
    img = rng.random((96, 120, 3)).astype(np.float32)
    std = small_extractor.extract_batch([img])[0]
    cfg_f = ExtractionConfig(
        max_keypoints=256, conf_threshold=1e-5, resize_max=128,
        pad_multiple=32, batch_size=2, fused_stem=True,
    )
    fused_ex = Extractor(small_extractor.variables, cfg_f,
                         model=small_extractor.model)
    assert fused_ex._packed_stem is not None
    fused = fused_ex.extract_batch([img])[0]
    assert len(fused.keypoints) == len(std.keypoints)
    # Match keypoints by position (order can differ on exact ties).
    order_s = np.lexsort(std.keypoints.T)
    order_f = np.lexsort(fused.keypoints.T)
    np.testing.assert_allclose(
        fused.keypoints[order_f], std.keypoints[order_s], atol=1e-3)
    np.testing.assert_allclose(
        fused.scores[order_f], std.scores[order_s], atol=1e-4)
    np.testing.assert_allclose(
        fused.descriptors[order_f], std.descriptors[order_s], atol=1e-3)


def test_pallas_stem_extractor_matches_standard(small_extractor, rng):
    """stem_backend='pallas': HOST-packed s2d plane rows + the Pallas
    stem kernel (interpret mode on CPU) must reproduce the standard
    extractor's keypoints (ops/pallas_stem.py). The image width is
    chosen so both paths land in the SAME padded bucket (the pallas
    path rounds W to 256) — different buckets legitimately shift
    edge responses."""
    img = rng.random((96, 250, 3)).astype(np.float32)
    std = small_extractor.extract_batch([img])[0]
    cfg_p = ExtractionConfig(
        max_keypoints=256, conf_threshold=1e-5, resize_max=128,
        pad_multiple=32, batch_size=2, fused_stem=True,
        stem_backend="pallas",
    )
    pal_ex = Extractor(small_extractor.variables, cfg_p,
                       model=small_extractor.model)
    assert pal_ex._stem_weights is not None
    pal = pal_ex.extract_batch([img])[0]
    assert len(pal.keypoints) == len(std.keypoints)
    order_s = np.lexsort(std.keypoints.T)
    order_p = np.lexsort(pal.keypoints.T)
    np.testing.assert_allclose(
        pal.keypoints[order_p], std.keypoints[order_s], atol=1e-3)
    np.testing.assert_allclose(
        pal.scores[order_p], std.scores[order_s], atol=1e-4)
    np.testing.assert_allclose(
        pal.descriptors[order_p], std.descriptors[order_s], atol=1e-3)
