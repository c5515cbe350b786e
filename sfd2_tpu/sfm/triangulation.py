"""Fixed-pose multi-view triangulation (batched JAX DLT + filtering).

Capability parity: the COLMAP ``point_triangulator`` binary with bundle
refinements off (``hloc/triangulation.py:129-147``,
``--Mapper.ba_refine_* 0`` — poses and intrinsics fixed): triangulate
every feature track against known camera poses, filter by reprojection
error, cheirality and minimum triangulation angle, then refine points.

TPU-native redesign (SURVEY §7.1): tracks are padded to a fixed max
length T with observation masks; triangulation is a batched weighted DLT
(eigh of the 4×4 normal matrix per track — the whole map solves in one
program), and point refinement is vmapped Gauss–Newton on the 3D point
with all observations' residuals. COLMAP defaults mirrored: max reproj
error 4 px, min triangulation angle 1.5°.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfd2_tpu.geometry.cameras import project_points, unproject_normalized
from sfd2_tpu.geometry.rotations import qvec_to_rotmat


class TriangulationResult(NamedTuple):
    xyz: jax.Array  # [P, 3]
    valid: jax.Array  # [P] bool — survived all filters
    errors: jax.Array  # [P] mean reproj error over inlier observations
    obs_inlier: jax.Array  # [P, T] per-observation inlier flags
    tri_angle_deg: jax.Array  # [P] max pairwise triangulation angle


def _triangulate_dlt(
    norm_xy: jax.Array,  # [T, 2] normalised undistorted observations
    rot: jax.Array,  # [T, 3, 3]
    tvec: jax.Array,  # [T, 3]
    w: jax.Array,  # [T] observation weights
):
    """Weighted linear triangulation: rows x·(P3) − P1, y·(P3) − P2."""
    p1 = rot[:, 0, :]
    p2 = rot[:, 1, :]
    p3 = rot[:, 2, :]
    t1, t2, t3 = tvec[:, 0], tvec[:, 1], tvec[:, 2]
    x, y = norm_xy[:, 0], norm_xy[:, 1]
    # Homogeneous rows [a | b] with a∈R³, b scalar.
    row_x = jnp.concatenate(
        [x[:, None] * p3 - p1, (x * t3 - t1)[:, None]], axis=1
    )
    row_y = jnp.concatenate(
        [y[:, None] * p3 - p2, (y * t3 - t2)[:, None]], axis=1
    )
    a = jnp.concatenate([row_x * w[:, None], row_y * w[:, None]], axis=0)  # [2T, 4]
    # SVD of A (f32 conditioning; see CLAUDE.md), not eigh of AᵀA.
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    h = vt[-1]
    return h[:3] / jnp.where(jnp.abs(h[3]) < 1e-12, 1e-12, h[3])


def _refine_point_gn(xyz, norm_xy, rot, tvec, w, iters: int = 3):
    """Gauss–Newton on the 3D point (normalised-coordinate residuals)."""

    def residuals(p):
        pc = jnp.einsum("tij,j->ti", rot, p) + tvec
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        proj = pc[:, :2] / z[:, None]
        return ((proj - norm_xy) * w[:, None]).reshape(-1)

    p = xyz
    for _ in range(iters):
        r = residuals(p)
        jac = jax.jacfwd(residuals)(p)  # [2T, 3]
        jtj = jac.T @ jac + 1e-8 * jnp.eye(3)
        step = jnp.linalg.solve(jtj, jac.T @ r)
        p_new = p - step
        ok = jnp.all(jnp.isfinite(p_new))
        p = jnp.where(ok, p_new, p)
    return p


@functools.partial(jax.jit, static_argnames=("refine_iters",))
def triangulate_tracks(
    obs_xy: jax.Array,  # [P, T, 2] pixel observations (padded)
    obs_mask: jax.Array,  # [P, T] bool
    qvecs: jax.Array,  # [P, T, 4] camera pose per observation
    tvecs: jax.Array,  # [P, T, 3]
    cam_params: jax.Array,  # [P, T, 8] canonical intrinsics
    max_reproj_error: float = 4.0,
    min_tri_angle_deg: float = 1.5,
    refine_iters: int = 3,
) -> TriangulationResult:
    """Triangulate P padded tracks in one program."""
    p_cnt, t_cnt = obs_mask.shape
    w = obs_mask.astype(obs_xy.dtype)
    rots = qvec_to_rotmat(qvecs)  # [P, T, 3, 3]

    norm_xy = jax.vmap(lambda xy, cam: unproject_normalized(xy, cam))(
        obs_xy.reshape(p_cnt * t_cnt, 1, 2),
        cam_params.reshape(p_cnt * t_cnt, 8),
    ).reshape(p_cnt, t_cnt, 2)

    xyz = jax.vmap(_triangulate_dlt)(norm_xy, rots, tvecs, w)
    xyz = jax.vmap(lambda p, nxy, r, t, ww: _refine_point_gn(p, nxy, r, t, ww, refine_iters))(
        xyz, norm_xy, rots, tvecs, w
    )

    # Reprojection + cheirality per observation.
    proj2, depth2 = project_points(
        xyz[:, None, None, :].repeat(t_cnt, 1),  # [P, T, 1, 3]
        qvecs,
        tvecs,
        cam_params,
    )
    proj2 = proj2[:, :, 0, :]  # [P, T, 2]
    depth2 = depth2[:, :, 0]
    err = jnp.linalg.norm(proj2 - obs_xy, axis=-1)
    obs_ok = obs_mask & (err <= max_reproj_error) & (depth2 > 0)

    # Triangulation angle: max pairwise angle between viewing rays.
    centers = -jnp.einsum("ptji,ptj->pti", rots, tvecs)  # [P, T, 3] cam centers
    rays = xyz[:, None, :] - centers
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.einsum("pti,psi->pts", rays, rays)
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    cosang = jnp.where(pair_ok, jnp.clip(cosang, -1.0, 1.0), 1.0)
    max_angle = jnp.degrees(jnp.arccos(jnp.min(cosang, axis=(1, 2))))

    n_inl = jnp.sum(obs_ok, axis=1)
    mean_err = jnp.sum(jnp.where(obs_ok, err, 0.0), axis=1) / jnp.maximum(n_inl, 1)
    valid = (
        (n_inl >= 2)
        & (max_angle >= min_tri_angle_deg)
        & jnp.all(jnp.isfinite(xyz), axis=1)
    )
    return TriangulationResult(
        xyz=xyz,
        valid=valid,
        errors=mean_err,
        obs_inlier=obs_ok,
        tri_angle_deg=max_angle,
    )
