"""Scale stress: 100-image map, 20 queries through the full engine.

Catches host-side quadratic behavior and validates recall at a scale
closer to a real benchmark slice (marked slow)."""

import time

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import Camera, canonicalize_params
from sfd2_tpu.geometry.np_pose import pose_error
from sfd2_tpu.io.colmap_model import Image, Point3D
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
from sfd2_tpu.localization.engine import (
    LocalizationEngine,
    LocalizerConfig,
    _np_project,
)
from sfd2_tpu.sfm.map_index import MapIndex

W, H = 640, 480
CAM_PARAMS = [520.0, 520.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


@pytest.mark.slow
def test_scale_100_images_20_queries(tmp_path):
    rng = np.random.default_rng(99)
    n_pts = 3000
    # A long corridor of points; cameras sweep along x.
    pts = np.stack(
        [rng.uniform(-2, 42, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 15, n_pts)], 1
    )
    pdesc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)

    cameras = {1: Camera(1, "PINHOLE", W, H, np.array(CAM_PARAMS))}
    images = {}
    obs = {i: [] for i in range(n_pts)}
    t_build0 = time.time()
    with FeatureStore(tmp_path / "f.h5", "w") as fs:
        for i in range(100):
            iid = i + 1
            r = Rotation.from_rotvec(rng.normal(size=3) * 0.03)
            q = r.as_quat()[[3, 0, 1, 2]]
            t = -r.as_matrix() @ np.array([i * 0.4, 0, 0])
            xy, depth = _np_project(pts, q, t, CAM8)
            vis = (
                (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8)
                & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
            )
            idx = np.nonzero(vis)[0][:800]
            kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
            de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.05
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            name = f"db/{iid:05d}.jpg"
            images[iid] = Image(iid, q, t, 1, name, kp, idx.astype(np.int64))
            fs.write(name, ImageFeatures(kp.astype(np.float32), de,
                                         rng.random(len(idx)).astype(np.float32), None))
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

        # 20 queries near random corridor positions, retrieval = 10 nearest.
        queries = []
        for qi in range(20):
            cx = rng.uniform(2, 38)
            r = Rotation.from_rotvec(rng.normal(size=3) * 0.02)
            q = r.as_quat()[[3, 0, 1, 2]]
            t = -r.as_matrix() @ np.array([cx, 0.1, -0.1])
            xy, depth = _np_project(pts, q, t, CAM8)
            vis = (
                (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8)
                & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
            )
            idx = np.nonzero(vis)[0][:600]
            kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
            de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.05
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            qname = f"q/{qi:03d}.jpg"
            fs.write(qname, ImageFeatures(kp.astype(np.float32), de,
                                          rng.random(len(idx)).astype(np.float32), None))
            near = sorted(images, key=lambda iid: abs((iid - 1) * 0.4 - cx))[:10]
            queries.append((qname, q, t, near))

    mi = MapIndex(cameras, images, points3d)
    build_s = time.time() - t_build0

    cfg = LocalizerConfig(
        ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
        covisibility_frame=10, iters=2, radius=12.0, obs_thresh=3,
        max_keypoints=1024, num_hypotheses=512,
    )
    t0 = time.time()
    n_ok = 0
    errs = []
    with FeatureStore(tmp_path / "f.h5", "r") as fs:
        eng = LocalizationEngine(mi, fs, cfg)
        qinfo = ("PINHOLE", W, H, np.array(CAM_PARAMS))
        for qname, q_gt, t_gt, near in queries:
            res = eng.localize(qname, qinfo, [[i] for i in near])
            if res.source == "accepted":
                qe, te = pose_error(res.qvec, res.tvec, q_gt, t_gt)
                errs.append((qe, te))
                if qe < 0.5 and te < 0.1:
                    n_ok += 1
    loc_s = time.time() - t0

    assert n_ok >= 19, (n_ok, errs)
    # Budget guard against host-side quadratic regressions. On the CPU
    # test platform the GEMM/RANSAC device compute itself costs ~2 s per
    # query; a regression in host orchestration would push this well past
    # the bound. 8 s (not 4) absorbs CPU contention when the suite shares
    # the host with a TPU bench run.
    assert loc_s / len(queries) < 8.0, f"{loc_s/20:.2f}s per query"
    print(f"built {len(points3d)} pts in {build_s:.1f}s; "
          f"{loc_s/20*1e3:.0f} ms/query, {n_ok}/20 within (0.1m, 0.5°)")
