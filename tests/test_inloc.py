import numpy as np
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.geometry.np_pose import pose_error
from sfd2_tpu.localization.engine import _np_project
from sfd2_tpu.localization.inloc import interpolate_scan, localize_rgbd

CAM_PARAMS = [500.0, 500.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


def test_interpolate_scan_bilinear():
    scan = np.zeros((4, 4, 3))
    scan[..., 0] = np.arange(4)[None, :]  # x-coordinate ramp
    scan[..., 1] = np.arange(4)[:, None]
    xyz, valid = interpolate_scan(scan, np.array([[1.5, 2.0], [0.0, 0.0]]))
    assert valid.all()
    np.testing.assert_allclose(xyz[0], [1.5, 2.0, 0.0], atol=1e-6)
    # NaN holes invalidate samples touching them.
    scan[2, 2] = np.nan
    _, valid = interpolate_scan(scan, np.array([[1.7, 1.7], [0.2, 0.2]]))
    assert not valid[0] and valid[1]


def test_localize_rgbd_synthetic(rng):
    n_pts = 300
    pts = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(5, 9, n_pts)], 1
    )
    pdesc = rng.normal(size=(n_pts, 32)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)

    # DB frame at identity: a dense scan grid of its visible 3D points.
    q_db = np.array([1.0, 0, 0, 0])
    t_db = np.zeros(3)
    xy_db, depth = _np_project(pts, q_db, t_db, CAM8)
    vis = (depth > 0) & (xy_db[:, 0] > 2) & (xy_db[:, 0] < 638) & (xy_db[:, 1] > 2) & (xy_db[:, 1] < 478)
    idx = np.nonzero(vis)[0]
    db_kpts = xy_db[idx].astype(np.float32)
    db_desc = pdesc[idx]
    # Scan: fill a [H, W, 3] grid by splatting the 3D points (NaN elsewhere
    # is too sparse for bilinear → use a smooth synthetic scan instead):
    # backproject every pixel at its GT depth plane via nearest point depth.
    scan = np.full((480, 640, 3), np.nan)
    for p, (x, y) in zip(pts[idx], db_kpts):
        xi, yi = int(round(x)), int(round(y))
        scan[max(yi - 1, 0) : yi + 2, max(xi - 1, 0) : xi + 2] = p

    # Query pose.
    r = Rotation.from_rotvec([0.02, -0.03, 0.01])
    q_gt = r.as_quat()[[3, 0, 1, 2]]
    t_gt = -r.as_matrix() @ np.array([0.2, 0.1, -0.2])
    xy_q, depth_q = _np_project(pts, q_gt, t_gt, CAM8)
    vis_q = (depth_q > 0) & (xy_q[:, 0] > 2) & (xy_q[:, 0] < 638) & (xy_q[:, 1] > 2) & (xy_q[:, 1] < 478)
    qi = np.nonzero(vis_q)[0][:200]
    q_kpts = (xy_q[qi] + rng.normal(size=(len(qi), 2)) * 0.3).astype(np.float32)
    q_desc = pdesc[qi] + rng.normal(size=(len(qi), 32)).astype(np.float32) * 0.05
    q_desc /= np.linalg.norm(q_desc, axis=1, keepdims=True)

    res = localize_rgbd(
        q_kpts, q_desc, [(db_kpts, db_desc, scan)], "PINHOLE", CAM_PARAMS,
        ransac_thresh=8.0,
    )
    assert res["success"], res
    qe, te = pose_error(res["qvec"], res["tvec"], q_gt, t_gt)
    assert qe < 1.0 and te < 0.15, (qe, te)
