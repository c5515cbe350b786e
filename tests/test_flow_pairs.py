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
