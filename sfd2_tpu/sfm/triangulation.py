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


def _inv3_lanes(m):
    """Closed-form inverse of [..., 3, 3] via the adjugate — XLA's
    batched LU is pathological on TPU (same helper as sfm/ba.py)."""
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c0 = jnp.cross(r1, r2)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    det = jnp.sum(r0 * c0, axis=-1)[..., None, None]
    return jnp.stack([c0, c1, c2], axis=-1) / det


def _triangulate_dlt_lanes(
    norm_xy: jax.Array,  # [P, T, 2] normalised undistorted observations
    rots: jax.Array,  # [P, T, 3, 3]
    tvecs: jax.Array,  # [P, T, 3]
    w: jax.Array,  # [P, T] observation weights
) -> jax.Array:
    """Weighted linear triangulation of all P tracks at once: rows
    x·(P3) − P1, y·(P3) − P2, solved as the nullvector of the 4×4 Gram
    matrix with every entry a [P]-lane vector (unrolled Cholesky +
    inverse subspace iteration + Rayleigh–Ritz — the
    pnp_dlt_fast_lanes pattern at size 4; XLA's per-track SVD of
    [2T,4] is pathological batched small-matrix linalg on TPU).

    Conditioning: translations are rescaled per track by their mean
    magnitude τ so all Gram entries are O(1) in f32 (the Hartley-style
    guard CLAUDE.md requires before Gram-form solves); the solution is
    scaled back by τ. The Gauss–Newton polish then converges from this
    starting point exactly as it did from the SVD solution."""
    dt = norm_xy.dtype
    wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)  # [P]
    tau = jnp.sum(jnp.linalg.norm(tvecs, axis=-1) * w, axis=-1) / wsum
    tau = jnp.maximum(tau, 1e-6)  # [P]
    ts = tvecs / tau[:, None, None]
    p1, p2, p3 = rots[..., 0, :], rots[..., 1, :], rots[..., 2, :]
    x, y = norm_xy[..., 0], norm_xy[..., 1]
    rx = x[..., None] * p3 - p1  # [P, T, 3]
    bx = x * ts[..., 2] - ts[..., 0]  # [P, T]
    ry = y[..., None] * p3 - p2
    by = y * ts[..., 2] - ts[..., 1]
    w2 = w * w

    # 4×4 Gram from both row families; entries are [P] vectors.
    def acc(a3, b1):
        g = {}
        for i in range(3):
            for j in range(i, 3):
                g[(i, j)] = jnp.sum(w2 * a3[..., i] * a3[..., j], axis=-1)
            g[(i, 3)] = jnp.sum(w2 * a3[..., i] * b1, axis=-1)
        g[(3, 3)] = jnp.sum(w2 * b1 * b1, axis=-1)
        return g

    gx, gy = acc(rx, bx), acc(ry, by)
    m = {}
    for i in range(4):
        for j in range(i, 4):
            m[(i, j)] = m[(j, i)] = gx[(i, j)] + gy[(i, j)]
    trace = sum(m[(d, d)] for d in range(4))
    eps = 1e-6 * (trace / 4.0) + 1e-30
    for d in range(4):
        m[(d, d)] = m[(d, d)] + eps

    ch = {}
    for j in range(4):
        djj = m[(j, j)] - sum(ch[(j, k)] * ch[(j, k)] for k in range(j))
        ljj = jnp.sqrt(jnp.maximum(djj, 1e-30))
        ch[(j, j)] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, 4):
            ch[(i, j)] = (
                m[(i, j)] - sum(ch[(i, k)] * ch[(j, k)] for k in range(j))
            ) * inv

    lead = x.shape[:-1]
    cols_iter = [
        [jnp.full(lead, 0.5, dt) for _ in range(4)],
        [jnp.full(lead, (0.5 if i % 2 == 0 else -0.5), dt) for i in range(4)],
    ]
    for _ in range(4):
        new_cols = []
        for bvec in cols_iter:
            yv = []
            for i in range(4):
                yv.append(
                    (bvec[i] - sum(ch[(i, k)] * yv[k] for k in range(i)))
                    / ch[(i, i)]
                )
            xv = [None] * 4
            for i in range(3, -1, -1):
                xv[i] = (
                    yv[i] - sum(ch[(k, i)] * xv[k] for k in range(i + 1, 4))
                ) / ch[(i, i)]
            new_cols.append(xv)
        c0, c1 = new_cols
        n0 = jnp.sqrt(sum(t * t for t in c0))
        c0 = [t / jnp.maximum(n0, 1e-30) for t in c0]
        d01 = sum(a * b for a, b in zip(c0, c1))
        c1 = [b - d01 * a for a, b in zip(c0, c1)]
        n1 = jnp.sqrt(sum(t * t for t in c1))
        c1 = [t / jnp.maximum(n1, 1e-30) for t in c1]
        cols_iter = [c0, c1]

    c0, c1 = cols_iter
    m0 = [sum(m[(i, j)] * c0[j] for j in range(4)) for i in range(4)]
    m1 = [sum(m[(i, j)] * c1[j] for j in range(4)) for i in range(4)]
    baa = sum(a * b for a, b in zip(c0, m0))
    bab = sum(a * b for a, b in zip(c0, m1))
    bcc = sum(a * b for a, b in zip(c1, m1))
    lam = 0.5 * (baa + bcc) - jnp.sqrt(
        jnp.square(0.5 * (baa - bcc)) + jnp.square(bab)
    )
    use_a = jnp.abs(lam - baa) > jnp.abs(lam - bcc)
    v0 = jnp.where(use_a, bab, lam - bcc)
    v1 = jnp.where(use_a, lam - baa, bab)
    vn = jnp.sqrt(v0 * v0 + v1 * v1)
    tiny = vn < 1e-20
    v0 = jnp.where(tiny, jnp.where(baa <= bcc, 1.0, 0.0), v0)
    v1 = jnp.where(tiny, jnp.where(baa <= bcc, 0.0, 1.0), v1)
    vn = jnp.sqrt(v0 * v0 + v1 * v1)
    v0, v1 = v0 / vn, v1 / vn
    h = [a * v0 + b * v1 for a, b in zip(c0, c1)]
    h3 = jnp.where(jnp.abs(h[3]) < 1e-12,
                   jnp.where(h[3] < 0, -1e-12, 1e-12), h[3])
    xyz = jnp.stack([h[0] / h3, h[1] / h3, h[2] / h3], axis=-1)
    return xyz * tau[:, None]


def _refine_points_gn_lanes(xyz, norm_xy, rots, tvecs, w, iters: int = 3):
    """Gauss–Newton on all P 3D points at once (normalised-coordinate
    residuals, analytic 2×3 Jacobians, adjugate 3×3 solves — no jacfwd,
    no batched LU)."""
    p = xyz
    eye3 = jnp.eye(3, dtype=xyz.dtype)
    for _ in range(iters):
        pc = jnp.einsum("ptij,pj->pti", rots, p) + tvecs
        z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
        proj = pc[..., :2] / z[..., None]
        r = (proj - norm_xy) * w[..., None]  # [P, T, 2]
        # ∂proj/∂p = (R[:2] − proj ⊗ R[2]) / z, scaled by w.
        jac = (
            (rots[..., :2, :] - proj[..., None] * rots[..., 2:3, :])
            / z[..., None, None] * w[..., None, None]
        )  # [P, T, 2, 3]
        jtj = jnp.einsum("ptci,ptcj->pij", jac, jac) + 1e-8 * eye3
        g = jnp.einsum("ptci,ptc->pi", jac, r)
        step = jnp.einsum("pij,pj->pi", _inv3_lanes(jtj), g)
        p_new = p - step
        ok = jnp.all(jnp.isfinite(p_new), axis=-1, keepdims=True)
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

    xyz = _triangulate_dlt_lanes(norm_xy, rots, tvecs, w)
    xyz = _refine_points_gn_lanes(xyz, norm_xy, rots, tvecs, w, refine_iters)

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
