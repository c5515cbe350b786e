import numpy as np

from sfd2_tpu.geometry.np_pose import camera_center
from sfd2_tpu.io.nvm import read_nvm_model


def test_nvm_roundtrip(tmp_path, rng):
    # Two cameras, two points; NVM stores camera centers.
    intr = tmp_path / "intr.txt"
    intr.write_text(
        "a.jpg SIMPLE_RADIAL 640 480 500 320 240 0.0\n"
        "b.jpg SIMPLE_RADIAL 640 480 510 320 240 0.0\n"
    )
    q = np.array([0.9, 0.1, 0.2, 0.05])
    q /= np.linalg.norm(q)
    c = np.array([1.0, 2.0, 3.0])
    nvm = tmp_path / "model.nvm"
    nvm.write_text(
        "NVM_V3\n\n2\n"
        f"a.jpg 500 {q[0]} {q[1]} {q[2]} {q[3]} {c[0]} {c[1]} {c[2]} 0 0\n"
        "b.jpg 510 1 0 0 0 0 0 0 0 0\n\n"
        "2\n"
        "1.0 2.0 9.0 255 0 0 2 0 3 10.5 20.5 1 1 30.0 40.0\n"
        "-1.0 0.5 8.0 0 255 0 1 1 0 5.0 6.0\n"
    )
    cameras, images, points = read_nvm_model(nvm, intr)
    assert len(cameras) == 2 and len(images) == 2 and len(points) == 2

    im_a = [im for im in images.values() if im.name == "a.jpg"][0]
    # Camera-center convention: recover c from (qvec, tvec).
    np.testing.assert_allclose(camera_center(im_a.qvec, im_a.tvec), c, atol=1e-9)
    # Observation wiring: point 0 observed by a.jpg at kp 3 (10.5, 20.5).
    assert im_a.point3D_ids[3] == 0
    np.testing.assert_allclose(im_a.xys[3], [10.5, 20.5])
    p0 = points[0]
    assert len(p0.image_ids) == 2
    np.testing.assert_allclose(p0.xyz, [1.0, 2.0, 9.0])


def test_flow_to_color(rng):
    from sfd2_tpu.utils.viz import flow_to_color

    flow = rng.normal(size=(32, 32, 2)).astype(np.float32)
    flow[:4] = np.nan
    img = flow_to_color(flow)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert (img[:4] == 0).all()  # invalid → black
    assert img[4:].max() > 0


def test_draw_matches_cv2(rng):
    from sfd2_tpu.utils.viz import draw_matches_cv2, draw_reprojections

    img1 = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    img2 = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    pts1 = rng.uniform(0, 60, (10, 2))
    pts2 = rng.uniform(0, 50, (10, 2))
    inl = rng.random(10) > 0.5
    out = draw_matches_cv2(img1, img2, pts1, pts2, inl, plot_outliers=True)
    assert out.shape == (110, 80, 3)
    rp = draw_reprojections(img1, pts1, pts1 + 2)
    assert rp.shape == img1.shape


def test_colmap_from_nvm_cli(tmp_path):
    """CLI surface (hloc/colmap_from_nvm.py parity): NVM + intrinsics →
    on-disk COLMAP model."""
    from sfd2_tpu.cli import colmap_from_nvm as cli
    from sfd2_tpu.io.colmap_model import read_model

    intr = tmp_path / "intr.txt"
    intr.write_text(
        "a.jpg SIMPLE_RADIAL 640 480 500 320 240 0.0\n"
        "b.jpg SIMPLE_RADIAL 640 480 510 320 240 0.0\n"
    )
    nvm = tmp_path / "model.nvm"
    nvm.write_text(
        "NVM_V3\n\n2\n"
        "a.jpg 500 1 0 0 0 1 2 3 0 0\n"
        "b.jpg 510 1 0 0 0 0 0 0 0 0\n\n"
        "1\n"
        "1.0 2.0 9.0 255 0 0 2 0 3 10.5 20.5 1 1 30.0 40.0\n"
    )
    out = tmp_path / "model"
    cli.main(["--nvm", str(nvm), "--intrinsics", str(intr),
              "--output", str(out)])
    cams, images, points = read_model(out)
    assert len(cams) == 2 and len(images) == 2 and len(points) == 1
