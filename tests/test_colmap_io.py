import numpy as np

from sfd2_tpu.geometry.cameras import Camera
from sfd2_tpu.io.colmap_model import Image, Point3D, read_model, write_model


def make_model(rng):
    cameras = {
        1: Camera(1, "SIMPLE_RADIAL", 640, 480, np.array([500.0, 320.0, 240.0, -0.05])),
        2: Camera(2, "OPENCV", 1024, 768, rng.normal(size=8)),
    }
    images = {}
    for i in range(1, 4):
        n = int(rng.integers(0, 20))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = Image(
            image_id=i,
            qvec=q,
            tvec=rng.normal(size=3),
            camera_id=1 + (i % 2),
            name=f"db/img_{i:04d}.jpg",
            xys=rng.uniform(0, 640, size=(n, 2)),
            point3D_ids=rng.integers(-1, 100, size=n).astype(np.int64),
        )
    points = {}
    for pid in [5, 17, 99]:
        t = int(rng.integers(2, 6))
        points[pid] = Point3D(
            id=pid,
            xyz=rng.normal(size=3),
            rgb=rng.integers(0, 255, size=3).astype(np.uint8),
            error=float(rng.uniform(0, 2)),
            image_ids=rng.integers(1, 4, size=t).astype(np.int32),
            point2D_idxs=rng.integers(0, 10, size=t).astype(np.int32),
        )
    return cameras, images, points


def assert_models_equal(a, b, atol=1e-12):
    cam_a, im_a, pt_a = a
    cam_b, im_b, pt_b = b
    assert set(cam_a) == set(cam_b)
    for k in cam_a:
        assert cam_a[k].model == cam_b[k].model
        assert (cam_a[k].width, cam_a[k].height) == (cam_b[k].width, cam_b[k].height)
        np.testing.assert_allclose(cam_a[k].params, cam_b[k].params, atol=atol)
    assert set(im_a) == set(im_b)
    for k in im_a:
        np.testing.assert_allclose(im_a[k].qvec, im_b[k].qvec, atol=atol)
        np.testing.assert_allclose(im_a[k].tvec, im_b[k].tvec, atol=atol)
        assert im_a[k].name == im_b[k].name
        assert im_a[k].camera_id == im_b[k].camera_id
        np.testing.assert_allclose(im_a[k].xys, im_b[k].xys, atol=atol)
        np.testing.assert_array_equal(im_a[k].point3D_ids, im_b[k].point3D_ids)
    assert set(pt_a) == set(pt_b)
    for k in pt_a:
        np.testing.assert_allclose(pt_a[k].xyz, pt_b[k].xyz, atol=atol)
        np.testing.assert_array_equal(pt_a[k].rgb, pt_b[k].rgb)
        np.testing.assert_array_equal(pt_a[k].image_ids, pt_b[k].image_ids)
        np.testing.assert_array_equal(pt_a[k].point2D_idxs, pt_b[k].point2D_idxs)


def test_bin_roundtrip(tmp_path, rng):
    model = make_model(rng)
    write_model(*model, tmp_path, ext=".bin")
    back = read_model(tmp_path)
    assert_models_equal(model, back)


def test_txt_roundtrip(tmp_path, rng):
    model = make_model(rng)
    write_model(*model, tmp_path, ext=".txt")
    back = read_model(tmp_path, ext=".txt")
    assert_models_equal(model, back, atol=1e-10)


def test_bin_txt_cross(tmp_path, rng):
    model = make_model(rng)
    write_model(*model, tmp_path / "b", ext=".bin")
    write_model(*read_model(tmp_path / "b"), tmp_path / "t", ext=".txt")
    back = read_model(tmp_path / "t", ext=".txt")
    assert_models_equal(model, back, atol=1e-10)


def test_camera_from_exif_fallback(tmp_path, rng):
    import cv2

    from sfd2_tpu.io.colmap_model import camera_from_exif

    p = tmp_path / "x.jpg"
    cv2.imwrite(str(p), (rng.random((120, 200, 3)) * 255).astype(np.uint8))
    cam = camera_from_exif(p)
    assert cam.model == "SIMPLE_RADIAL"
    assert (cam.width, cam.height) == (200, 120)
    assert abs(cam.params[0] - 1.2 * 200) < 1e-6  # default prior
    assert cam.params[1] == 100 and cam.params[2] == 60


def test_camera_from_exif_with_focal(tmp_path, rng):
    from PIL import Image as PILImage

    from sfd2_tpu.io.colmap_model import camera_from_exif

    # Write the tag where real cameras put it: the Exif sub-IFD (0x8769).
    img = PILImage.new("RGB", (400, 300))
    exif = img.getexif()
    sub = exif.get_ifd(0x8769)
    sub[0xA405] = 50  # FocalLengthIn35mmFilm
    p = tmp_path / "f.jpg"
    img.save(p, exif=exif)
    cam = camera_from_exif(p)
    # COLMAP's /35 convention.
    assert abs(cam.params[0] - 50 / 35 * 400) < 1e-3
