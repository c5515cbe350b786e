"""Incremental SfM from scratch on a synthetic scene: recovered structure
must match GT up to the gauge (similarity aligned via Umeyama)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import Camera, canonicalize_params
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures, MatchStore
from sfd2_tpu.localization.engine import _np_project
from sfd2_tpu.pipeline.match import MatchConfig, match_pairs
from sfd2_tpu.sfm.reconstruction import (
    ReconstructionConfig,
    incremental_reconstruction,
)
from sfd2_tpu.sfm.pipeline import TriangulationConfig
from sfd2_tpu.geometry.np_pose import camera_center

W, H = 640, 480
CAM_PARAMS = [520.0, 520.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


def umeyama(src, dst):
    """Similarity transform aligning src→dst (s, R, t)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, d, vt = np.linalg.svd(cov)
    s_fix = np.eye(3)
    if np.linalg.det(u @ vt) < 0:
        s_fix[2, 2] = -1
    rot = u @ s_fix @ vt
    var = (sc**2).sum() / len(src)
    scale = np.trace(np.diag(d) @ s_fix) / var
    t = mu_d - scale * rot @ mu_s
    return scale, rot, t


@pytest.mark.slow
def test_incremental_reconstruction(tmp_path):
    rng = np.random.default_rng(5)
    n_pts = 260
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 14, n_pts)], 1
    )
    pdesc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)

    gt_poses = []
    feats = {}
    names = []
    kp_to_gt = {}
    for i in range(5):
        r = Rotation.from_rotvec(rng.normal(size=3) * 0.04)
        q = r.as_quat()[[3, 0, 1, 2]]
        t = -r.as_matrix() @ np.array([i * 0.8 - 1.6, 0.05 * i, 0.0])
        xy, depth = _np_project(pts, q, t, CAM8)
        vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
        idx = np.nonzero(vis)[0]
        kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.25
        de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.04
        de /= np.linalg.norm(de, axis=1, keepdims=True)
        name = f"img_{i}.jpg"
        names.append(name)
        gt_poses.append((q, t))
        kp_to_gt[name] = idx
        feats[name] = ImageFeatures(
            kp.astype(np.float32), de, rng.random(len(idx)).astype(np.float32), None
        )

    fpath = tmp_path / "f.h5"
    mpath = tmp_path / "m.h5"
    pairs = [(a, b) for ai, a in enumerate(names) for b in names[ai + 1 :]]
    with FeatureStore(fpath, "w") as fs:
        for n, f in feats.items():
            fs.write(n, f)
    with FeatureStore(fpath, "r") as fs, MatchStore(mpath, "w") as ms:
        match_pairs(fs, pairs, ms, MatchConfig(max_keypoints=512, batch_size=8))

    cams = {n: Camera(1, "PINHOLE", W, H, np.array(CAM_PARAMS)) for n in names}
    with FeatureStore(fpath, "r") as fs, MatchStore(mpath, "r") as ms:
        out_cams, out_images, out_points, stats = incremental_reconstruction(
            fs, ms, pairs, cams,
            ReconstructionConfig(tri=TriangulationConfig(verify_batch=8)),
        )

    assert stats["num_reg_images"] == 5, stats
    assert stats["num_points3D"] > 150, stats

    # Gauge alignment from point correspondences (camera centers here are
    # near-collinear, which leaves Umeyama a free rotation): each
    # reconstructed point's track identifies its GT point via kp index.
    name_by_id = {iid: im.name for iid, im in out_images.items()}
    recon, gt = [], []
    for p in out_points.values():
        iid, k = int(p.image_ids[0]), int(p.point2D_idxs[0])
        gt_idx = kp_to_gt[name_by_id[iid]][k]
        recon.append(p.xyz)
        gt.append(pts[gt_idx])
    recon = np.array(recon)
    gt = np.array(gt)
    s, rot, tr = umeyama(recon, gt)
    aligned = (s * (rot @ recon.T)).T + tr
    d = np.linalg.norm(aligned - gt, axis=1)
    assert np.median(d) < 0.05, np.median(d)
    assert (d < 0.2).mean() > 0.9, (d < 0.2).mean()

    # Camera centers under the same transform.
    name_to_img = {im.name: im for im in out_images.values()}
    for name, (q_gt, t_gt) in zip(names, gt_poses):
        im = name_to_img[name]
        c = camera_center(im.qvec, im.tvec)
        c_al = s * (rot @ c) + tr
        err = np.linalg.norm(c_al - camera_center(q_gt, t_gt))
        assert err < 0.1, (name, err)
