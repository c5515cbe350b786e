"""Quaternion / rotation-matrix primitives (JAX, batch-first).

Conventions follow COLMAP: quaternions are stored as ``qvec = [w, x, y, z]``
(Hamilton, scalar first), and a COLMAP image pose ``(qvec, tvec)`` maps
world points to camera coordinates: ``x_cam = R(qvec) @ x_world + tvec``.

Capability parity: reference ``hloc/utils/read_write_model.py:434,447``
(qvec2rotmat / rotmat2qvec) and ``it_loc/common.py:280`` (angular error) —
re-derived here as pure, vmappable JAX functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qvec_to_rotmat(qvec: jax.Array) -> jax.Array:
    """Quaternion(s) [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3]."""
    q = qvec / jnp.linalg.norm(qvec, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_qvec(rot: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w,x,y,z).

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the best-conditioned one with ``where`` so the
    function stays jittable/vmappable (no data-dependent control flow).
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 values (always >= 0 up to numerical noise).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate quaternions, one per dominant component.
    def safe_div(a, b):
        return a / jnp.where(b == 0, 1.0, b)

    sw = jnp.sqrt(qw2)
    cand_w = jnp.stack(
        [sw, safe_div(m21 - m12, sw), safe_div(m02 - m20, sw), safe_div(m10 - m01, sw)],
        axis=-1,
    )
    sx = jnp.sqrt(qx2)
    cand_x = jnp.stack(
        [safe_div(m21 - m12, sx), sx, safe_div(m01 + m10, sx), safe_div(m02 + m20, sx)],
        axis=-1,
    )
    sy = jnp.sqrt(qy2)
    cand_y = jnp.stack(
        [safe_div(m02 - m20, sy), safe_div(m01 + m10, sy), sy, safe_div(m12 + m21, sy)],
        axis=-1,
    )
    sz = jnp.sqrt(qz2)
    cand_z = jnp.stack(
        [safe_div(m10 - m01, sz), safe_div(m02 + m20, sz), safe_div(m12 + m21, sz), sz],
        axis=-1,
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2) * 0.5
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0 (COLMAP convention).
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of quaternions [..., 4] (w,x,y,z)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_angular_error_deg(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angular distance in degrees between unit quaternions [..., 4].

    Matches the reference metric ``it_loc/common.py:280``
    (2*acos(|<q1,q2>|) in degrees), computed stably via arccos of the
    clipped absolute inner product.
    """
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    d = jnp.clip(d, 0.0, 1.0)
    return 2.0 * jnp.degrees(jnp.arccos(d))


def rotate_points(qvec: jax.Array, points: jax.Array) -> jax.Array:
    """Rotate points [..., N, 3] by quaternion(s) [..., 4]."""
    rot = qvec_to_rotmat(qvec)
    return jnp.einsum("...ij,...nj->...ni", rot, points)
