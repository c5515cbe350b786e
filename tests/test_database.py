import numpy as np

from sfd2_tpu.io.database import (
    ColmapDatabase,
    image_ids_to_pair_id,
    pair_id_to_image_ids,
)


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (5, 5), (100, 3)]:
        pid = image_ids_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_ids(pid) == (lo, hi)
    # Order-invariant packing (reference :113-122).
    assert image_ids_to_pair_id(3, 7) == image_ids_to_pair_id(7, 3)


def test_database_roundtrip(tmp_path, rng):
    path = tmp_path / "database.db"
    with ColmapDatabase(path) as db:
        cam = db.add_camera(2, 640, 480, [500.0, 320, 240, -0.05])
        i1 = db.add_image("a.jpg", cam)
        i2 = db.add_image("b.jpg", cam)
        kp1 = rng.random((50, 2)).astype(np.float32) * 640
        kp2 = rng.random((40, 2)).astype(np.float32) * 640
        db.add_keypoints(i1, kp1)
        db.add_keypoints(i2, kp2)
        m = rng.integers(0, 40, size=(30, 2)).astype(np.uint32)
        db.add_matches(i1, i2, m)
        db.add_two_view_geometry(i1, i2, m[:20])

    with ColmapDatabase(path) as db:
        np.testing.assert_allclose(db.get_keypoints(i1), kp1)
        np.testing.assert_array_equal(db.get_matches(i1, i2), m)
        # Reversed query flips columns.
        np.testing.assert_array_equal(db.get_matches(i2, i1), m[:, ::-1])
        tv = db.get_two_view_geometry(i1, i2)
        np.testing.assert_array_equal(tv[0], m[:20])
        assert tv[1] == 2


def test_export_model(tmp_path, rng):
    from sfd2_tpu.geometry.cameras import Camera
    from sfd2_tpu.io.colmap_model import Image
    from sfd2_tpu.io.database import export_to_database
    from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures

    cams = {1: Camera(1, "SIMPLE_RADIAL", 640, 480, np.array([500.0, 320, 240, 0.0]))}
    q = np.array([1.0, 0, 0, 0])
    images = {
        1: Image(1, q, np.zeros(3), 1, "x.jpg", np.zeros((0, 2)), np.zeros(0, np.int64)),
        2: Image(2, q, np.ones(3), 1, "y.jpg", np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    fpath = tmp_path / "f.h5"
    with FeatureStore(fpath, "w") as fs:
        for name in ["x.jpg", "y.jpg"]:
            fs.write(
                name,
                ImageFeatures(
                    rng.random((10, 2)).astype(np.float32),
                    rng.random((10, 8)).astype(np.float32),
                    rng.random(10).astype(np.float32),
                    None,
                ),
            )
        verified = [("x.jpg", "y.jpg", np.array([[0, 1], [2, 3]], np.uint32))]
        export_to_database(cams, images, fs, tmp_path / "db.db", verified)

    with ColmapDatabase(tmp_path / "db.db") as db:
        kp = db.get_keypoints(1)
        assert kp.shape == (10, 2)
        m = db.get_matches(1, 2)
        np.testing.assert_array_equal(m, [[0, 1], [2, 3]])
