"""End-to-end localizer driver test: files on disk → poses + recall."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import Camera, canonicalize_params
from sfd2_tpu.io.colmap_model import Image, Point3D, write_model
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
from sfd2_tpu.localization.engine import LocalizerConfig, _np_project
from sfd2_tpu.localization.localizer import (
    LocalizerRun,
    load_gt_poses,
    result_name,
    run,
)

W, H = 640, 480
CAM_PARAMS = [500.0, 500.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    rng = np.random.default_rng(21)
    base = tmp_path_factory.mktemp("loc_cli")
    n_pts = 350
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 15, n_pts)], 1
    )
    pdesc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)

    cameras = {1: Camera(1, "PINHOLE", W, H, np.array(CAM_PARAMS))}
    images, feats, obs = {}, {}, {i: [] for i in range(n_pts)}
    for i in range(5):
        iid = i + 1
        r = Rotation.from_rotvec(rng.normal(size=3) * 0.04)
        q = r.as_quat()[[3, 0, 1, 2]]
        t = -r.as_matrix() @ np.array([i * 0.8 - 1.6, 0, 0])
        xy, depth = _np_project(pts, q, t, CAM8)
        vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
        idx = np.nonzero(vis)[0]
        kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
        de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.05
        de /= np.linalg.norm(de, axis=1, keepdims=True)
        name = f"db/{iid:04d}.jpg"
        images[iid] = Image(iid, q, t, 1, name, kp, idx.astype(np.int64))
        feats[name] = ImageFeatures(kp.astype(np.float32), de, rng.random(len(idx)).astype(np.float32), None)
        for row, p in enumerate(idx):
            obs[int(p)].append((iid, row))

    points3d = {}
    for p, o in obs.items():
        if len(o) >= 2:
            points3d[p] = Point3D(
                p, pts[p], np.zeros(3, np.uint8), 0.4,
                np.array([x[0] for x in o], np.int32),
                np.array([x[1] for x in o], np.int32),
            )
    for iid in list(images):
        im = images[iid]
        p3d = np.array([p if p in points3d else -1 for p in im.point3D_ids], np.int64)
        images[iid] = Image(iid, im.qvec, im.tvec, 1, im.name, im.xys, p3d)

    model_dir = base / "sfm"
    write_model(cameras, images, points3d, model_dir, ext=".bin")

    # Queries: two easy + one garbage.
    q_entries = []
    gt_lines = []
    retrieval_lines = []
    fpath = base / "feats.h5"
    with FeatureStore(fpath, "w") as fs:
        for name, f in feats.items():
            fs.write(name, f)
        for qi in range(2):
            r = Rotation.from_rotvec(rng.normal(size=3) * 0.03)
            q = r.as_quat()[[3, 0, 1, 2]]
            t = -r.as_matrix() @ np.array([qi * 0.5 - 0.2, 0.1, -0.1])
            xy, depth = _np_project(pts, q, t, CAM8)
            vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
            idx = np.nonzero(vis)[0][:260]
            kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
            de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.05
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            qname = f"query/day/q{qi}.jpg"
            fs.write(qname, ImageFeatures(kp.astype(np.float32), de, rng.random(len(idx)).astype(np.float32), None))
            cam_str = "PINHOLE 640 480 500 500 320 240"
            q_entries.append(f"{qname} {cam_str}")
            gt_lines.append(
                f"q{qi}.jpg " + " ".join(str(v) for v in [*q, *t])
            )
            for iid in sorted(images):
                retrieval_lines.append(f"{qname} {images[iid].name}")

    (base / "queries.txt").write_text("\n".join(q_entries) + "\n")
    (base / "gt.txt").write_text("\n".join(gt_lines) + "\n")
    (base / "retrieval.txt").write_text("\n".join(retrieval_lines) + "\n")
    return base, fpath, model_dir


def test_result_name_mangling():
    assert result_name("query/day/x.jpg", "aachen_v1.1") == "x.jpg"
    assert result_name("images/rear/123.jpg", "robotcar") == "rear/123.jpg"
    assert result_name("img_c0_123.jpg", "ecmu") == "img_c0_123.jpg"


def test_load_gt_poses(disk_scene):
    base, _, _ = disk_scene
    gt = load_gt_poses(base / "gt.txt")
    assert "q0.jpg" in gt and gt["q0.jpg"]["qvec"].shape == (4,)


def test_run_end_to_end(disk_scene):
    base, fpath, model_dir = disk_scene
    cfg = LocalizerRun(
        dataset="aachen_v1.1",
        init_type="sng",
        config=LocalizerConfig(
            ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
            covisibility_frame=5, iters=2, radius=12.0, obs_thresh=2,
            max_keypoints=512, num_hypotheses=512,
        ),
    )
    results_path = base / "out" / "poses.txt"
    stats = run(
        "aachen_v1.1", model_dir, base / "queries.txt", base / "retrieval.txt",
        fpath, results_path, cfg, gt_pose_path=base / "gt.txt",
    )
    assert stats["num_localized"] == 2
    assert stats["recall"] == [1.0, 1.0, 1.0], stats
    lines = results_path.read_text().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("q0.jpg ")
    assert (base / "out" / "poses.txt.failed").exists()
    assert (base / "out" / "poses_full.log").exists()


def test_run_clustered_init(disk_scene):
    base, fpath, model_dir = disk_scene
    cfg = LocalizerRun(
        dataset="aachen_v1.1",
        init_type="clu",
        config=LocalizerConfig(
            ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
            covisibility_frame=5, iters=1, radius=12.0, obs_thresh=2,
            max_keypoints=512, num_hypotheses=512,
        ),
    )
    stats = run(
        "aachen_v1.1", model_dir, base / "queries.txt", base / "retrieval.txt",
        fpath, base / "out2" / "poses.txt", cfg, gt_pose_path=base / "gt.txt",
    )
    assert stats["recall"] == [1.0, 1.0, 1.0], stats


def test_ecmu_query_parser(tmp_path):
    from sfd2_tpu.io.pairs import parse_img_lists_for_extended_cmu_seasons

    lst = tmp_path / "test-images-slice7.txt"
    lst.write_text("img_00122_c0_1303398475046031us.jpg\nimg_00123_c1_1303398475546123us.jpg\n")
    queries = parse_img_lists_for_extended_cmu_seasons(lst)
    assert len(queries) == 2
    name, (model, w, h, params) = queries[0]
    assert name.endswith(".jpg")
    assert model == "OPENCV" and (w, h) == (1024, 768)
    assert len(params) == 8  # fx fy cx cy k1 k2 p1 p2
    assert abs(params[0] - 868.993378) < 1e-6


def test_missing_query_features_marks_failed(disk_scene):
    """A query absent from the feature store gets the retrieval-fallback
    pose (counted as a miss), not a crash."""
    base, fpath, model_dir = disk_scene
    q2 = base / "queries_extra.txt"
    q2.write_text(
        (base / "queries.txt").read_text()
        + "query/day/missing.jpg PINHOLE 640 480 500 500 320 240\n"
    )
    r2 = base / "retrieval_extra.txt"
    r2.write_text(
        (base / "retrieval.txt").read_text()
        + "query/day/missing.jpg db/0001.jpg\n"
    )
    cfg = LocalizerRun(
        dataset="aachen_v1.1",
        config=LocalizerConfig(max_keypoints=512, num_hypotheses=256,
                               ransac_thresh=8.0),
    )
    stats = run(
        "aachen_v1.1", model_dir, q2, r2, fpath,
        base / "out3" / "poses.txt", cfg, gt_pose_path=base / "gt.txt",
    )
    assert stats["num_queries"] == 3
    # All three get poses (the missing-features query uses the top
    # retrieved frame's pose) and the bad one is listed as failed.
    assert stats["num_localized"] == 3
    assert stats["num_failed"] == 1
    # Recall denominator includes only GT-covered queries; the missing
    # query has no GT entry here so recall stays clean.
    assert stats["recall"] == [1.0, 1.0, 1.0]
    failed = (base / "out3" / "poses.txt.failed").read_text()
    assert "missing.jpg" in failed
    lines = (base / "out3" / "poses.txt").read_text().strip().splitlines()
    assert len(lines) == 3
