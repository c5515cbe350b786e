"""End-to-end map building: synthetic features+matches → triangulated
COLMAP model matching ground truth (hloc/triangulation parity)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import Camera, canonicalize_params
from sfd2_tpu.io.colmap_model import Image, read_model, write_model
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures, MatchStore
from sfd2_tpu.localization.engine import _np_project
from sfd2_tpu.pipeline.match import MatchConfig, match_pairs
from sfd2_tpu.sfm.map_index import MapIndex
from sfd2_tpu.sfm.pairs import (
    pairs_from_covisibility,
    pairs_from_poses,
    pairs_from_retrieval,
)
from sfd2_tpu.sfm.pipeline import TriangulationConfig, triangulate_map

W, H = 640, 480
CAM_PARAMS = [520.0, 520.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


@pytest.fixture(scope="module")
def built_map(tmp_path_factory):
    rng = np.random.default_rng(11)
    n_pts = 300
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 14, n_pts)], 1
    )
    desc_dim = 64
    pdesc = rng.normal(size=(n_pts, desc_dim)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)

    cameras = {1: Camera(1, "PINHOLE", W, H, np.array(CAM_PARAMS))}
    ref_images = {}
    feats = {}
    gt_kp_to_point = {}
    for i in range(6):
        iid = i + 1
        r = Rotation.from_rotvec(rng.normal(size=3) * 0.04)
        q = r.as_quat()[[3, 0, 1, 2]]
        t = -r.as_matrix() @ np.array([i * 0.7 - 1.75, 0.0, 0.0])
        xy, depth = _np_project(pts, q, t, CAM8)
        vis = (
            (depth > 0)
            & (xy[:, 0] >= 5) & (xy[:, 0] < W - 5)
            & (xy[:, 1] >= 5) & (xy[:, 1] < H - 5)
            & (rng.random(n_pts) < 0.9)
        )
        idx = np.nonzero(vis)[0]
        kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.2
        de = pdesc[idx] + rng.normal(size=(len(idx), desc_dim)).astype(np.float32) * 0.04
        de /= np.linalg.norm(de, axis=1, keepdims=True)
        name = f"db/{iid:04d}.jpg"
        # Reference model carries poses but NO observations (create_empty_model).
        ref_images[iid] = Image(
            iid, q, t, 1, name, np.zeros((0, 2)), np.zeros(0, np.int64)
        )
        feats[name] = ImageFeatures(
            kp.astype(np.float32), de, rng.random(len(idx)).astype(np.float32), None
        )
        gt_kp_to_point[iid] = idx

    base = tmp_path_factory.mktemp("map")
    ref_dir = base / "ref_model"
    write_model(cameras, ref_images, {}, ref_dir, ext=".bin")

    fpath = base / "feats.h5"
    with FeatureStore(fpath, "w") as fs:
        for name, f in feats.items():
            fs.write(name, f)

    names = [ref_images[i].name for i in sorted(ref_images)]
    pairs = [(a, b) for ai, a in enumerate(names) for b in names[ai + 1 :]]

    mpath = base / "matches.h5"
    with FeatureStore(fpath, "r") as fs, MatchStore(mpath, "w") as ms:
        n = match_pairs(fs, pairs, ms, MatchConfig(max_keypoints=512, batch_size=8))
        assert n == len(pairs)

    out_dir = base / "model"
    with FeatureStore(fpath, "r") as fs, MatchStore(mpath, "r") as ms:
        cams, images, points3d, stats = triangulate_map(
            ref_dir, fs, ms, pairs, out_dir,
            TriangulationConfig(verify_batch=8),
        )
    return {
        "cams": cams, "images": images, "points3d": points3d, "stats": stats,
        "pts_gt": pts, "gt_kp_to_point": gt_kp_to_point, "out_dir": out_dir,
        "ref_images": ref_images,
    }


def test_map_recovers_points(built_map):
    pts_gt = built_map["pts_gt"]
    points3d = built_map["points3d"]
    stats = built_map["stats"]
    assert stats["num_points3D"] > 200, stats
    assert stats["mean_track_length"] > 3.0, stats
    assert stats["mean_reprojection_error"] < 1.0, stats
    # Each triangulated point should be near some GT point.
    xyz = np.stack([p.xyz for p in points3d.values()])
    d = np.linalg.norm(xyz[:, None] - pts_gt[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.05, np.median(d)
    assert (d < 0.2).mean() > 0.95


def test_map_observations_consistent(built_map):
    """images' point3D_ids must round-trip with the points' tracks."""
    images = built_map["images"]
    points3d = built_map["points3d"]
    for pid, pt in points3d.items():
        assert len(pt.image_ids) >= 2
        for iid, kidx in zip(pt.image_ids, pt.point2D_idxs):
            assert images[int(iid)].point3D_ids[int(kidx)] == pid


def test_written_model_loads(built_map):
    cams, images, points = read_model(built_map["out_dir"])
    assert len(points) == built_map["stats"]["num_points3D"]
    assert (built_map["out_dir"] / "statics.txt").exists()


def test_pairs_from_covisibility(built_map):
    mi = MapIndex(built_map["cams"], built_map["images"], built_map["points3d"])
    pairs = pairs_from_covisibility(mi, num_matched=3)
    assert len(pairs) == 6 * 3
    assert all(a != b for a, b in pairs)
    # The first partner of each image must be its max-covisibility image.
    covis = (mi.incidence @ mi.incidence.T).toarray()
    np.fill_diagonal(covis, 0)
    for r, name in enumerate(mi.names):
        first = [p for p in pairs if p[0] == name][0][1]
        assert covis[r, mi.names.index(first)] == covis[r].max()


def test_pairs_from_poses(built_map):
    pairs = pairs_from_poses(built_map["ref_images"], num_matched=2)
    assert ("db/0001.jpg", "db/0002.jpg") in pairs
    assert all(a != b for a, b in pairs)


def test_pairs_from_retrieval(rng):
    q = rng.normal(size=(2, 16)).astype(np.float32)
    db = np.concatenate([q + 0.01, rng.normal(size=(5, 16)).astype(np.float32)])
    names_q = ["q0", "q1"]
    names_db = [f"d{i}" for i in range(7)]
    pairs = pairs_from_retrieval(names_q, q, names_db, db, num_matched=1)
    assert ("q0", "d0") in pairs and ("q1", "d1") in pairs
