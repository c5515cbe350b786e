import numpy as np

from sfd2_tpu.training.flow_pairs import (
    FlowPairDataset,
    StillPairDataset,
    flow_to_png,
    png_to_flow,
)


def test_flow_png_roundtrip(tmp_path, rng):
    flow = (rng.normal(size=(32, 40, 2)) * 50).astype(np.float32)
    stored = flow_to_png(flow, tmp_path / "f.png")
    back = png_to_flow(tmp_path / "f.png")
    # Codec quantises to 1/16 px.
    np.testing.assert_allclose(back, stored, atol=1e-6)
    np.testing.assert_allclose(back, flow, atol=1 / 16 + 1e-6)


def test_still_pair_dataset(rng):
    class Base:
        def __len__(self):
            return 2

        def get_image(self, i):
            return np.full((20, 30, 3), i, np.float32)

    ds = StillPairDataset(Base())
    img1, img2, aflow, mask = ds.get_pair(1)
    assert mask.all()
    np.testing.assert_allclose(aflow[5, 7], [7, 5])


def test_flow_pair_dataset(tmp_path, rng):
    import cv2
    from PIL import Image

    for n in ["a.png", "b.png"]:
        cv2.imwrite(str(tmp_path / n), (rng.random((24, 32, 3)) * 255).astype(np.uint8))
    flow = rng.normal(size=(24, 32, 2)).astype(np.float32) * 3
    flow_to_png(flow, tmp_path / "flow.png")
    mask = np.zeros((24, 32), np.uint8)
    mask[5:20, 5:25] = 255
    Image.fromarray(mask).save(tmp_path / "mask.png")

    ds = FlowPairDataset(tmp_path, [("a.png", "b.png", "flow.png", "mask.png")])
    img1, img2, aflow, m = ds.get_pair(0)
    assert img1.shape == (24, 32, 3)
    assert np.isnan(aflow[0, 0]).all()  # masked-out → NaN
    ys, xs = 10, 10
    np.testing.assert_allclose(
        aflow[ys, xs], flow[ys, xs] + [xs, ys], atol=1 / 16 + 1e-6
    )


def test_flow_pair_dataset_rgb_mask_and_shape_check(tmp_path, rng):
    import cv2
    from PIL import Image
    import pytest

    for n in ["a.png", "b.png"]:
        cv2.imwrite(str(tmp_path / n), (rng.random((24, 32, 3)) * 255).astype(np.uint8))
    flow = rng.normal(size=(24, 32, 2)).astype(np.float32)
    flow_to_png(flow, tmp_path / "flow.png")
    # RGB-saved mask must still work.
    m = np.zeros((24, 32, 3), np.uint8)
    m[4:20, 4:28] = 255
    Image.fromarray(m).save(tmp_path / "mask_rgb.png")
    ds = FlowPairDataset(tmp_path, [("a.png", "b.png", "flow.png", "mask_rgb.png")])
    _, _, aflow, mm = ds.get_pair(0)
    assert mm.shape == (24, 32) and mm[10, 10]

    # Mismatched flow size → clear error.
    flow_to_png(rng.normal(size=(10, 10, 2)).astype(np.float32), tmp_path / "bad.png")
    ds2 = FlowPairDataset(tmp_path, [("a.png", "b.png", "bad.png", "mask_rgb.png")])
    with pytest.raises(ValueError, match="does not"):
        ds2.get_pair(0)


def test_precomputed_pair_builder_through_loader(tmp_path, rng):
    """FlowPairDataset drives PairLoader end-to-end via PrecomputedPairBuilder."""
    from sfd2_tpu.training.data import PairLoader, PrecomputedPairBuilder

    class Base:
        def __len__(self):
            return 2

        def get_image(self, i):
            return np.random.default_rng(i).random((96, 96, 3)).astype(np.float32)

    ds = StillPairDataset(Base())
    loader = PairLoader(ds, PrecomputedPairBuilder(crop=48, n_crop_tries=2),
                        batch_size=2, workers=2)
    batch = next(iter(loader.epoch(0)))
    assert batch["image1"].shape == (2, 48, 48, 3)
    assert batch["aflow"].shape == (2, 48, 48, 2)
    assert batch["mask"].any()
