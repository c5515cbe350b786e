"""Camera models, projection and reprojection (JAX, batched).

Capability parity with the reference's camera handling:
``it_loc/common.py:225-277`` (``reproject`` for SIMPLE_RADIAL analytic +
OPENCV via cv2.projectPoints) and the COLMAP camera-model registry used in
``hloc/utils/read_write_model.py``. Redesigned TPU-first: every camera is
normalised to a fixed-width parameter vector ``[fx, fy, cx, cy, k1, k2,
p1, p2]`` so projection is a single branch-free vectorised function that
jits/vmaps over points, cameras and RANSAC hypotheses alike.

Supported models (all models used by the Aachen / RobotCar / ECMU
benchmarks): SIMPLE_PINHOLE, PINHOLE, SIMPLE_RADIAL, RADIAL, OPENCV.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.geometry.rotations import qvec_to_rotmat

# COLMAP model-id registry (subset + full table for I/O round-tripping).
# (model_id, model_name, num_params) — matches COLMAP's src/base/camera_models.h.
CAMERA_MODELS = [
    (0, "SIMPLE_PINHOLE", 3),
    (1, "PINHOLE", 4),
    (2, "SIMPLE_RADIAL", 4),
    (3, "RADIAL", 5),
    (4, "OPENCV", 8),
    (5, "OPENCV_FISHEYE", 8),
    (6, "FULL_OPENCV", 12),
    (7, "FOV", 5),
    (8, "SIMPLE_RADIAL_FISHEYE", 4),
    (9, "RADIAL_FISHEYE", 5),
    (10, "THIN_PRISM_FISHEYE", 12),
]
CAMERA_MODEL_IDS = {m[0]: (m[1], m[2]) for m in CAMERA_MODELS}
CAMERA_MODEL_NAMES = {m[1]: (m[0], m[2]) for m in CAMERA_MODELS}

# Models whose projection is implemented on-device.
_PROJECTABLE = ("SIMPLE_PINHOLE", "PINHOLE", "SIMPLE_RADIAL", "RADIAL", "OPENCV")


@dataclasses.dataclass(frozen=True)
class Camera:
    """Host-side camera record (mirrors a COLMAP camera row)."""

    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # raw COLMAP parameter vector

    def canonical_params(self) -> np.ndarray:
        """Return the fixed-width [fx, fy, cx, cy, k1, k2, p1, p2] vector."""
        return canonicalize_params(self.model, self.params)


def canonicalize_params(model: str, params: Sequence[float]) -> np.ndarray:
    """Map any supported COLMAP parameter layout to [fx,fy,cx,cy,k1,k2,p1,p2]."""
    p = np.asarray(params, dtype=np.float64)
    out = np.zeros(8, dtype=np.float64)
    if model == "SIMPLE_PINHOLE":
        out[:4] = [p[0], p[0], p[1], p[2]]
    elif model == "PINHOLE":
        out[:4] = p[:4]
    elif model == "SIMPLE_RADIAL":
        out[:4] = [p[0], p[0], p[1], p[2]]
        out[4] = p[3]
    elif model == "RADIAL":
        out[:4] = [p[0], p[0], p[1], p[2]]
        out[4:6] = p[3:5]
    elif model == "OPENCV":
        out[:] = p[:8]
    else:
        raise ValueError(f"camera model {model!r} has no on-device projection")
    return out


def world_to_camera(points3d: jax.Array, qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """World points [..., N, 3] -> camera frame, COLMAP convention R@x + t."""
    rot = qvec_to_rotmat(qvec)
    return jnp.einsum("...ij,...nj->...ni", rot, points3d) + tvec[..., None, :]


def camera_depths(points3d: jax.Array, qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """Z-depth of world points in the camera frame (reference calc_depth,
    ``it_loc/common.py:217``)."""
    return world_to_camera(points3d, qvec, tvec)[..., 2]


def _distort(x: jax.Array, y: jax.Array, cam: jax.Array):
    """Apply radial(+tangential) distortion in normalised coordinates.

    cam is the canonical [fx,fy,cx,cy,k1,k2,p1,p2] vector; unused
    coefficients are zero, so the single formula covers all supported
    models without branching (TPU-friendly).
    """
    k1, k2, p1, p2 = cam[..., 4], cam[..., 5], cam[..., 6], cam[..., 7]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    x_d = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_d = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return x_d, y_d


def project_points(
    points3d: jax.Array,
    qvec: jax.Array,
    tvec: jax.Array,
    cam_params: jax.Array,
    eps: float = 1e-8,
):
    """Project world points to pixels.

    Args:
      points3d: [..., N, 3] world points.
      qvec, tvec: [..., 4] / [..., 3] COLMAP pose (world->cam).
      cam_params: [..., 8] canonical intrinsics (broadcast against batch).

    Returns:
      (xy [..., N, 2] pixel coordinates, depth [..., N] camera z).

    Mirrors the reference's ``reproject`` (``it_loc/common.py:225``) but as
    one fused branch-free program usable inside jit/vmap/RANSAC scoring.
    """
    pc = world_to_camera(points3d, qvec, tvec)
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < eps, jnp.sign(z) * eps + (z == 0) * eps, z)
    xn = pc[..., 0] * inv_z
    yn = pc[..., 1] * inv_z
    cam = cam_params[..., None, :] if cam_params.ndim == points3d.ndim - 1 else cam_params
    xd, yd = _distort(xn, yn, cam)
    u = cam[..., 0] * xd + cam[..., 2]
    v = cam[..., 1] * yd + cam[..., 3]
    return jnp.stack([u, v], axis=-1), z


def unproject_normalized(xy: jax.Array, cam_params: jax.Array, iters: int = 5):
    """Pixels -> normalised image coordinates, undistorting iteratively.

    Fixed-point undistortion (standard Newton-free scheme, `iters` static so
    it unrolls under jit). Needed by minimal PnP solvers which work on
    normalised rays.
    """
    cam = cam_params
    x = (xy[..., 0] - cam[..., 2, None]) / cam[..., 0, None] if cam.ndim == xy.ndim - 1 else (
        xy[..., 0] - cam[..., 2]
    ) / cam[..., 0]
    y = (xy[..., 1] - cam[..., 3, None]) / cam[..., 1, None] if cam.ndim == xy.ndim - 1 else (
        xy[..., 1] - cam[..., 3]
    ) / cam[..., 1]
    x0, y0 = x, y
    camb = cam[..., None, :] if cam.ndim == xy.ndim - 1 else cam
    for _ in range(iters):
        xd, yd = _distort(x, y, camb)
        x = x + (x0 - xd)
        y = y + (y0 - yd)
    return jnp.stack([x, y], axis=-1)


def reprojection_errors(
    points3d: jax.Array,
    points2d: jax.Array,
    qvec: jax.Array,
    tvec: jax.Array,
    cam_params: jax.Array,
):
    """Per-point reprojection error [..., N] and depth (for cheirality)."""
    proj, depth = project_points(points3d, qvec, tvec, cam_params)
    err = jnp.linalg.norm(proj - points2d, axis=-1)
    return err, depth
