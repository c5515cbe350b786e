"""End-to-end synthetic localization: build a tiny 3D map + features,
run the full it_loc-semantics engine, check the recovered pose."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.geometry.np_pose import pose_error, qvec_to_rotmat
from sfd2_tpu.io.colmap_model import Image, Point3D
from sfd2_tpu.geometry.cameras import Camera
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
from sfd2_tpu.localization.engine import (
    LocalizationEngine,
    LocalizerConfig,
    _np_project,
)
from sfd2_tpu.sfm.map_index import MapIndex

W, H = 640, 480
CAM_PARAMS = [500.0, 500.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


def make_pose(rng, center, look_jitter=0.05):
    rot = Rotation.from_rotvec(rng.normal(size=3) * look_jitter)
    rmat = rot.as_matrix()
    q = rot.as_quat()[[3, 0, 1, 2]]
    t = -rmat @ np.asarray(center, float)
    return q, t


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    rng = np.random.default_rng(7)
    n_pts = 400
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 16, n_pts)],
        axis=1,
    )
    desc_dim = 64
    point_desc = rng.normal(size=(n_pts, desc_dim)).astype(np.float32)
    point_desc /= np.linalg.norm(point_desc, axis=1, keepdims=True)

    db_centers = [
        [-1.5, 0, 0], [-0.75, 0.2, 0.1], [0, 0, 0], [0.75, -0.2, 0.2], [1.5, 0, 0],
        [0, 0.5, -0.3],
    ]
    cameras = {1: Camera(1, "PINHOLE", W, H, np.array(CAM_PARAMS))}
    images, obs_per_point = {}, {i: [] for i in range(n_pts)}
    feats = {}
    for i, c in enumerate(db_centers):
        iid = i + 1
        q, t = make_pose(rng, c)
        xy, depth = _np_project(pts, q, t, CAM8)
        vis = (
            (depth > 0)
            & (xy[:, 0] >= 8) & (xy[:, 0] < W - 8)
            & (xy[:, 1] >= 8) & (xy[:, 1] < H - 8)
            & (rng.random(n_pts) < 0.85)
        )
        idx = np.nonzero(vis)[0]
        kps = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
        descs = point_desc[idx] + rng.normal(size=(len(idx), desc_dim)).astype(np.float32) * 0.05
        descs /= np.linalg.norm(descs, axis=1, keepdims=True)
        name = f"db/{iid:04d}.jpg"
        images[iid] = Image(
            iid, q, t, 1, name, kps, idx.astype(np.int64)  # p3d ids = point index
        )
        feats[name] = ImageFeatures(
            kps.astype(np.float32), descs, rng.random(len(idx)).astype(np.float32), None
        )
        for row_i, p in enumerate(idx):
            obs_per_point[int(p)].append((iid, row_i))

    points3d = {}
    for p, obs in obs_per_point.items():
        if len(obs) < 2:
            continue
        points3d[p] = Point3D(
            p, pts[p], np.zeros(3, np.uint8), 0.5,
            np.array([o[0] for o in obs], np.int32),
            np.array([o[1] for o in obs], np.int32),
        )
    # Strip unreconstructed points from image observations.
    for iid in list(images):
        im = images[iid]
        p3d = np.array([p if p in points3d else -1 for p in im.point3D_ids], np.int64)
        images[iid] = Image(im.image_id, im.qvec, im.tvec, im.camera_id, im.name, im.xys, p3d)

    # Query: between db cameras, sees the scene + distractor keypoints.
    q_gt, t_gt = make_pose(rng, [0.3, 0.1, -0.1])
    xy, depth = _np_project(pts, q_gt, t_gt, CAM8)
    vis = (depth > 0) & (xy[:, 0] >= 8) & (xy[:, 0] < W - 8) & (xy[:, 1] >= 8) & (xy[:, 1] < H - 8)
    idx = np.nonzero(vis)[0][:250]
    q_kps = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
    q_desc = point_desc[idx] + rng.normal(size=(len(idx), desc_dim)).astype(np.float32) * 0.05
    n_distract = 80
    d_kps = rng.uniform([0, 0], [W, H], size=(n_distract, 2))
    d_desc = rng.normal(size=(n_distract, desc_dim)).astype(np.float32)
    all_kps = np.concatenate([q_kps, d_kps]).astype(np.float32)
    all_desc = np.concatenate([q_desc, d_desc])
    all_desc /= np.linalg.norm(all_desc, axis=1, keepdims=True)
    qname = "query/q0.jpg"
    feats[qname] = ImageFeatures(
        all_kps, all_desc.astype(np.float32), rng.random(len(all_kps)).astype(np.float32), None
    )

    store_path = tmp_path_factory.mktemp("feats") / "features.h5"
    with FeatureStore(store_path, "w") as fs:
        for name, f in feats.items():
            fs.write(name, f)

    return {
        "cameras": cameras, "images": images, "points3d": points3d,
        "store_path": store_path, "qname": qname, "q_gt": (q_gt, t_gt),
        "db_ids": list(images.keys()),
    }


def test_map_index_covisibility(scene):
    mi = MapIndex(scene["cameras"], scene["images"], scene["points3d"])
    clusters = mi.covisibility_clustering(scene["db_ids"])
    # All db frames see the same scene → one cluster.
    assert len(clusters) == 1 and len(clusters[0]) == len(scene["db_ids"])
    covis = mi.covis_frames_obs(scene["db_ids"][0], covisibility_frame=3)
    assert len(covis) == 3
    # Ranked by covisibility: every returned frame shares many points.
    counts = mi.covisibility_counts(mi.observed_point_rows(scene["db_ids"][0]))
    assert covis[0] == max(counts, key=counts.get)


def test_feature_store_roundtrip(scene, tmp_path):
    with FeatureStore(scene["store_path"], "r") as fs:
        names = fs.keys()
        assert scene["qname"] in names
        f = fs.read(scene["qname"])
        assert f.descriptors.shape[1] == 64
        kp, de, sc, va = fs.read_padded(scene["qname"], 512)
        assert kp.shape == (512, 2) and va.sum() == len(f.keypoints)
        # Reference layout on disk: descriptors stored [C, N].
        import h5py

        with h5py.File(scene["store_path"]) as h5:
            assert h5[scene["qname"]]["descriptors"].shape[0] == 64


def test_localize_query_accepted(scene):
    mi = MapIndex(scene["cameras"], scene["images"], scene["points3d"])
    cfg = LocalizerConfig(
        ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
        covisibility_frame=6, iters=2, radius=12.0, obs_thresh=2,
        max_keypoints=512, num_hypotheses=512,
    )
    with FeatureStore(scene["store_path"], "r") as fs:
        eng = LocalizationEngine(mi, fs, cfg)
        qinfo = ("PINHOLE", W, H, np.array(CAM_PARAMS))
        clusters = [[i] for i in scene["db_ids"]]
        res = eng.localize(scene["qname"], qinfo, clusters)
    assert res.source == "accepted", res.log
    q_gt, t_gt = scene["q_gt"]
    qe, te = pose_error(res.qvec, res.tvec, q_gt, t_gt)
    assert qe < 0.5, (qe, res.log)
    assert te < 0.10, (te, res.log)
    assert res.num_inliers > 50


def test_localize_fallback_on_garbage_query(scene, tmp_path):
    rng = np.random.default_rng(3)
    mi = MapIndex(scene["cameras"], scene["images"], scene["points3d"])
    # A query with random descriptors: must fall back to retrieval pose.
    bad = "query/bad.jpg"
    import shutil

    p = tmp_path / "f.h5"
    shutil.copy(scene["store_path"], p)
    d = rng.normal(size=(100, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    with FeatureStore(p, "a") as fs:
        fs.write(
            bad,
            ImageFeatures(
                rng.uniform(0, 400, (100, 2)).astype(np.float32), d,
                rng.random(100).astype(np.float32), None,
            ),
        )
        cfg = LocalizerConfig(max_keypoints=512, num_hypotheses=256, ransac_thresh=5.0)
        eng = LocalizationEngine(mi, fs, cfg)
        qinfo = ("PINHOLE", W, H, np.array(CAM_PARAMS))
        res = eng.localize(bad, qinfo, [[i] for i in scene["db_ids"]])
    assert res.source == "retrieval_fallback"
    assert res.num_inliers == -1
    top = scene["images"][scene["db_ids"][0]]
    np.testing.assert_allclose(res.qvec, top.qvec)


def test_store_recovers_from_truncated_file(tmp_path):
    """A killed writer leaves an unopenable HDF5; append-mode reopens must
    recover (stores are resumable by design)."""
    import pytest

    p = tmp_path / "trunc.h5"
    p.write_bytes(b"\x89HDF\r\n" + b"\x00" * 90)  # 96-byte truncated stub
    with pytest.raises(OSError):
        FeatureStore(p, "r")
    with FeatureStore(p, "a") as fs:  # recovers by starting fresh
        assert fs.keys() == []
