"""Concrete dataset layouts (Aachen day-night, web distractors, W/A/S/F/D
letter codes) over synthetic on-disk fixtures — ``datasets/aachen.py``,
``datasets/web_images.py``, ``train.py:24-64`` parity."""

import numpy as np
import pytest

from sfd2_tpu.training.data import PairLoader, PrecomputedPairBuilder
from sfd2_tpu.training.datasets_aachen import (
    AachenFlowPairs,
    AachenImages,
    CatPairDataset,
    RandomWebImages,
    SyntheticPairAdapter,
    aachen_style_transfer_pairs,
    build_data_source,
)
from sfd2_tpu.training.flow_pairs import flow_to_png


@pytest.fixture(scope="module")
def aachen_root(tmp_path_factory):
    """Minimal Aachen layout: images_upright/{db,query/day,query/night},
    style_transfer/, optical_flow/{flow,mask}."""
    import cv2

    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("aachen")
    for sub in ("db", "query/day", "query/night"):
        (root / "images_upright" / sub).mkdir(parents=True)
    h, w = 48, 64
    for i in range(4):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images_upright" / "db" / f"{1000+i}.jpg"), img)
    cv2.imwrite(
        str(root / "images_upright" / "query" / "day" / "q1.jpg"),
        (rng.random((h, w, 3)) * 255).astype(np.uint8),
    )
    cv2.imwrite(
        str(root / "images_upright" / "query" / "night" / "q2.jpg"),
        (rng.random((h, w, 3)) * 255).astype(np.uint8),
    )
    # Style transfer: night rendering of db/1000 and db/1001.
    (root / "style_transfer").mkdir()
    for tag in ("1000", "1001"):
        cv2.imwrite(
            str(root / "style_transfer" / f"{tag}.jpg.st_night.jpg"),
            (rng.random((h, w, 3)) * 255).astype(np.uint8),
        )
    # Optical flow pair 1000↔1001 (small constant flow, valid mask).
    (root / "optical_flow" / "flow").mkdir(parents=True)
    (root / "optical_flow" / "mask").mkdir(parents=True)
    flow = np.full((h, w, 2), 1.5, np.float32)
    flow_to_png(flow, root / "optical_flow" / "flow" / "1000_1001.png")
    cv2.imwrite(
        str(root / "optical_flow" / "mask" / "1000_1001.png"),
        np.full((h, w), 255, np.uint8),
    )
    return root


def test_aachen_images_select(aachen_root):
    assert len(AachenImages(aachen_root, select="db")) == 4
    assert len(AachenImages(aachen_root, select="day")) == 1
    assert len(AachenImages(aachen_root, select="db day night")) == 6
    db = AachenImages(aachen_root, select="db")
    assert db.get_tag(0) == "1000"
    assert db.get_image(0).shape == (48, 64, 3)


def test_style_transfer_pairs(aachen_root):
    ds = aachen_style_transfer_pairs(aachen_root / "style_transfer", aachen_root)
    assert len(ds) == 2
    img1, img2, aflow, mask = ds.get_pair(0)
    assert img1.shape == img2.shape == (48, 64, 3)
    # Pixel-aligned stills → identity flow.
    assert abs(aflow[10, 20, 0] - 20) < 1e-5 and abs(aflow[10, 20, 1] - 10) < 1e-5
    assert mask.all()


def test_flow_pairs(aachen_root):
    ds = AachenFlowPairs(aachen_root / "optical_flow", aachen_root)
    assert len(ds) == 1
    img1, img2, aflow, mask = ds.get_pair(0)
    assert mask.all()
    # aflow = identity + 1.5 (flow png codec quantises to ~1/25 px).
    assert abs(aflow[5, 5, 0] - 6.5) < 0.1


def test_web_images_shards(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for key in ("000", "001", "004"):
        (tmp_path / key).mkdir()
        cv2.imwrite(
            str(tmp_path / key / "x.jpg"),
            (rng.random((32, 32, 3)) * 255).astype(np.uint8),
        )
    ds = RandomWebImages(tmp_path, start=0, end=2)
    # Block 0 covers folders 000-003, block 1 covers 004-007.
    assert len(ds) == 3
    assert ds.get_image(0).shape == (32, 32, 3)


def test_letter_codes_and_loader(aachen_root):
    ds = build_data_source("ASF", crop=32, aachen_root=aachen_root)
    assert isinstance(ds, CatPairDataset)
    assert len(ds) == 4 + 2 + 1
    # Every member serves get_pair with consistent shapes.
    for i in (0, 4, 6):
        img1, img2, aflow, mask = ds.get_pair(i)
        assert aflow.shape[:2] == img1.shape[:2]
    # Full loader path (the train CLI route for --data_sources).
    loader = PairLoader(ds, PrecomputedPairBuilder(crop=32), batch_size=2,
                        workers=2)
    batch = next(iter(loader.epoch(0)))
    assert batch["image1"].shape == (2, 32, 32, 3)
    assert np.isfinite(batch["aflow"]).any()


def test_synthetic_adapter_flow_correctness(aachen_root):
    """Adapter pairs: img2 content at flow targets correlates with img1
    (the warp ground truth is real)."""
    base = AachenImages(aachen_root, select="db")
    ds = SyntheticPairAdapter(base, crop=32, seed=3)
    img1, img2, aflow, valid = ds.get_pair(1)
    ys, xs = np.nonzero(valid & np.isfinite(aflow).all(-1))
    sel = slice(0, len(ys), max(1, len(ys) // 200))
    ys, xs = ys[sel], xs[sel]
    tx = np.clip(np.round(aflow[ys, xs, 0]).astype(int), 0, img2.shape[1] - 1)
    ty = np.clip(np.round(aflow[ys, xs, 1]).astype(int), 0, img2.shape[0] - 1)
    a = img1[ys, xs].ravel()
    b = img2[ty, tx].ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.7
