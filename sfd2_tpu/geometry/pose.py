"""Pose metrics and pose algebra (JAX).

Capability parity with ``it_loc/common.py:298`` (compute_pose_error:
camera-to-world conversion, translation L2, quaternion angular error) —
batched and jittable here so a whole query set can be scored in one call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sfd2_tpu.geometry.rotations import (
    qvec_to_rotmat,
    quat_angular_error_deg,
)


def invert_pose(qvec: jax.Array, tvec: jax.Array):
    """Invert a COLMAP (world->cam) pose into (cam->world): R^T, -R^T t."""
    rot = qvec_to_rotmat(qvec)
    rot_inv = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_inv, tvec)
    # Conjugate quaternion = inverse rotation for unit quats.
    q_inv = qvec * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=qvec.dtype)
    return q_inv, t_inv, rot_inv


def camera_center(qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """Camera center in world coordinates: -R^T t."""
    rot = qvec_to_rotmat(qvec)
    return -jnp.einsum("...ji,...j->...i", rot, tvec)


def pose_error(
    pred_qvec: jax.Array,
    pred_tvec: jax.Array,
    gt_qvec: jax.Array,
    gt_tvec: jax.Array,
):
    """(angular error deg, translation error m) between two world->cam poses.

    Translation error is measured between camera centers (cam->world
    translations), matching the reference metric exactly.
    """
    c_pred = camera_center(pred_qvec, pred_tvec)
    c_gt = camera_center(gt_qvec, gt_tvec)
    t_err = jnp.linalg.norm(c_pred - c_gt, axis=-1)
    # Angular error between world->cam quats equals the error between their
    # conjugates (cam->world), so no conversion is needed.
    q_err = quat_angular_error_deg(pred_qvec, gt_qvec)
    return q_err, t_err


def recall_at_thresholds(
    q_err_deg: jax.Array,
    t_err_m: jax.Array,
    thresholds=((0.25, 2.0), (0.5, 5.0), (5.0, 10.0)),
) -> jax.Array:
    """Fraction of poses within each (meters, degrees) bound.

    Default thresholds are the benchmark's (0.25m,2°)/(0.5m,5°)/(5m,10°)
    (``it_loc/localizer.py:83-84``).
    """
    outs = []
    for t_th, q_th in thresholds:
        ok = (t_err_m <= t_th) & (q_err_deg <= q_th)
        outs.append(jnp.mean(ok.astype(jnp.float32)))
    return jnp.stack(outs)
