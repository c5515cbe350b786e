import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry import (
    qvec_to_rotmat,
    rotmat_to_qvec,
    quat_angular_error_deg,
    project_points,
    world_to_camera,
)
from sfd2_tpu.geometry.cameras import canonicalize_params, unproject_normalized
from sfd2_tpu.geometry.pose import pose_error, camera_center, invert_pose, recall_at_thresholds


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def test_qvec_to_rotmat_matches_scipy(rng):
    q = random_quats(rng, 64)
    ours = np.array(qvec_to_rotmat(jnp.array(q, jnp.float32)))
    # scipy uses xyzw ordering
    theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rotmat_qvec_roundtrip(rng):
    q = random_quats(rng, 128)
    q[q[:, 0] < 0] *= -1  # canonical w>=0
    rot = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    q2 = np.array(rotmat_to_qvec(jnp.array(rot, jnp.float32)))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_rotmat_to_qvec_degenerate_cases():
    # 180-degree rotations exercise every branch of the extraction.
    for axis in range(3):
        rot = -np.eye(3)
        rot[axis, axis] = 1.0
        q = np.array(rotmat_to_qvec(jnp.array(rot, jnp.float32)))
        r2 = np.array(qvec_to_rotmat(jnp.array(q)))
        np.testing.assert_allclose(r2, rot, atol=1e-5)


def test_quat_angular_error(rng):
    q1 = np.array([1.0, 0, 0, 0])
    for deg in [0.0, 1.0, 10.0, 90.0]:
        q2 = Rotation.from_euler("z", deg, degrees=True).as_quat()[[3, 0, 1, 2]]
        err = float(quat_angular_error_deg(jnp.array(q1), jnp.array(q2)))
        assert abs(err - deg) < 1e-3


def test_project_points_pinhole(rng):
    pts = rng.uniform(-1, 1, size=(100, 3)) + np.array([0, 0, 5.0])
    q = np.array([1.0, 0, 0, 0])
    t = np.zeros(3)
    cam = canonicalize_params("PINHOLE", [500.0, 510.0, 320.0, 240.0])
    xy, depth = project_points(jnp.array(pts), jnp.array(q), jnp.array(t), jnp.array(cam))
    xy = np.array(xy)
    expect = np.stack(
        [500.0 * pts[:, 0] / pts[:, 2] + 320.0, 510.0 * pts[:, 1] / pts[:, 2] + 240.0],
        axis=1,
    )
    np.testing.assert_allclose(xy, expect, rtol=1e-5)
    np.testing.assert_allclose(np.array(depth), pts[:, 2], rtol=1e-5)


def test_project_points_opencv_matches_cv2(rng):
    import cv2

    pts = rng.uniform(-1, 1, size=(50, 3)) + np.array([0, 0, 4.0])
    rvec = rng.normal(size=3) * 0.2
    rot = Rotation.from_rotvec(rvec)
    q = rot.as_quat()[[3, 0, 1, 2]]
    t = rng.normal(size=3) * 0.1
    fx, fy, cx, cy = 400.0, 410.0, 300.0, 200.0
    dist = np.array([-0.1, 0.05, 0.001, -0.002])  # k1 k2 p1 p2
    cam = canonicalize_params("OPENCV", [fx, fy, cx, cy, *dist])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    expect, _ = cv2.projectPoints(pts.reshape(-1, 1, 3), rvec, t, K, dist)
    expect = expect[:, 0, :]
    xy, _ = project_points(
        jnp.array(pts, jnp.float32),
        jnp.array(q, jnp.float32),
        jnp.array(t, jnp.float32),
        jnp.array(cam, jnp.float32),
    )
    np.testing.assert_allclose(np.array(xy), expect, atol=5e-2)


def test_unproject_roundtrip(rng):
    cam = canonicalize_params("SIMPLE_RADIAL", [480.0, 320.0, 240.0, -0.08])
    pts = rng.uniform(-0.4, 0.4, size=(200, 3)) + np.array([0, 0, 3.0])
    q = np.array([1.0, 0, 0, 0])
    t = np.zeros(3)
    xy, _ = project_points(jnp.array(pts), jnp.array(q), jnp.array(t), jnp.array(cam))
    norm = np.array(unproject_normalized(jnp.array(xy), jnp.array(cam)))
    expect = pts[:, :2] / pts[:, 2:3]
    np.testing.assert_allclose(norm, expect, atol=1e-4)


def test_pose_error_zero_and_known(rng):
    q = random_quats(rng, 1)[0]
    t = rng.normal(size=3)
    qe, te = pose_error(jnp.array(q), jnp.array(t), jnp.array(q), jnp.array(t))
    assert float(qe) < 1e-3 and float(te) < 1e-5

    # Shift camera center by 2m: translation error must be exactly 2.
    c = np.array(camera_center(jnp.array(q), jnp.array(t)))
    rot = Rotation.from_quat(q[[1, 2, 3, 0]]).as_matrix()
    t2 = -rot @ (c + np.array([2.0, 0, 0]))
    qe, te = pose_error(jnp.array(q), jnp.array(t2), jnp.array(q), jnp.array(t))
    assert abs(float(te) - 2.0) < 1e-4


def test_invert_pose(rng):
    q = random_quats(rng, 8)
    t = rng.normal(size=(8, 3))
    qi, ti, _ = invert_pose(jnp.array(q), jnp.array(t))
    pts = rng.normal(size=(8, 5, 3))
    cam_pts = world_to_camera(jnp.array(pts), jnp.array(q), jnp.array(t))
    back = world_to_camera(cam_pts, qi, ti)
    np.testing.assert_allclose(np.array(back), pts, atol=1e-4)


def test_recall_thresholds():
    q_err = jnp.array([0.5, 3.0, 8.0, 50.0])
    t_err = jnp.array([0.1, 0.4, 2.0, 100.0])
    r = np.array(recall_at_thresholds(q_err, t_err))
    np.testing.assert_allclose(r, [0.25, 0.5, 0.75])
