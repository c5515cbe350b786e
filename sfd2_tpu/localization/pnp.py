"""Perspective-n-Point solvers and nonlinear pose refinement (pure JAX).

Capability parity: the C++ externals ``pycolmap.absolute_pose_estimation``
(P3P + LO-RANSAC, ``it_loc/localize_cv2.py:731``) and
``pycolmap.pose_refinement`` (Ceres pose-only LM, ``:451``) — re-designed
for TPU as fully batched, statically-shaped programs:

* minimal/least-squares solver: normalised DLT on ≥6 correspondences,
  orthonormalised via SVD (TPU-supported), cheirality-corrected. Used
  both as the RANSAC hypothesis generator (vmapped over sampled minimal
  sets) and as the full-inlier initialisation.
* refinement: Levenberg–Marquardt over an se(3)-style (axis-angle, t)
  parameterisation with masked residuals (invalid/outlier rows weight 0),
  fixed iteration count (static → one compiled program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfd2_tpu.geometry.cameras import project_points, unproject_normalized
from sfd2_tpu.geometry.rotations import qvec_to_rotmat, rotmat_to_qvec


def _axis_angle_to_rotmat(w: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    Formulated on the *unnormalised* skew matrix with Taylor-guarded
    sin(θ)/θ and (1−cosθ)/θ² coefficients so it is differentiable at
    w = 0 (the LM linearisation point).
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    km = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], -1),
            jnp.stack([wz, zero, -wx], -1),
            jnp.stack([-wy, wx, zero], -1),
        ],
        -2,
    )
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))  # safe sqrt
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), km.shape)
    return eye + a * km + b * (km @ km)


def _hartley_normalize(points3d, points2d_norm, w):
    """Weighted Hartley normalisation; returns (x3, x2, s3, c3, s2, c2)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c3 = jnp.sum(points3d * w[:, None], axis=0) / wsum
    x3 = points3d - c3
    s3 = jnp.sqrt(3.0) / jnp.maximum(
        jnp.sum(jnp.linalg.norm(x3, axis=1) * w) / wsum, 1e-12
    )
    x3 = x3 * s3
    c2 = jnp.sum(points2d_norm * w[:, None], axis=0) / wsum
    x2 = points2d_norm - c2
    s2 = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sum(jnp.linalg.norm(x2, axis=1) * w) / wsum, 1e-12
    )
    x2 = x2 * s2
    return x3, x2, s3, c3, s2, c2


def _dlt_rows(x3, x2, w):
    """Stack the 2N×12 DLT system from normalised correspondences."""
    n = x3.shape[0]
    xh = jnp.concatenate([x3, jnp.ones((n, 1), x3.dtype)], axis=1)  # [N,4]
    u = x2[:, 0:1]
    v = x2[:, 1:2]
    zeros = jnp.zeros_like(xh)
    row_u = jnp.concatenate([xh, zeros, -u * xh], axis=1)  # [N,12]
    row_v = jnp.concatenate([zeros, xh, -v * xh], axis=1)
    return jnp.concatenate([row_u * w[:, None], row_v * w[:, None]], axis=0)


def _det3(m):
    return jnp.sum(m[0] * jnp.cross(m[1], m[2]), axis=-1)


def _cofactor3(m):
    """Cofactor matrix of a 3×3 (rows = cross products of the other rows);
    inv(M)ᵀ = cof(M) / det(M)."""
    return jnp.stack(
        [jnp.cross(m[1], m[2]), jnp.cross(m[2], m[0]), jnp.cross(m[0], m[1])]
    )


def _polar_rotation(m, iters: int = 5):
    """Nearest rotation to M by Newton polar iteration X ← ½(X + X⁻ᵀ).

    Direct 3×3 arithmetic only (cross-product cofactors) — no iterative
    LAPACK-style factorisation, so it vmaps efficiently over RANSAC
    hypothesis lanes on TPU. Quadratic convergence; 5 rounds ≫ enough
    after Frobenius pre-scaling. Returns (R, scale) with scale =
    tr(RᵀM)/3, the mean singular value (what the SVD path calls
    mean(ss))."""
    x = m * (jnp.sqrt(3.0) / jnp.maximum(jnp.linalg.norm(m), 1e-12))
    for _ in range(iters):
        det = _det3(x)
        inv_t = _cofactor3(x) / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        x = 0.5 * (x + inv_t)
    scale = jnp.trace(x.T @ m) / 3.0
    return x, scale


def _null12_inverse_iteration(a, iters: int = 4):
    """Smallest-singular-vector of a [2N, 12] DLT system via shifted
    Cholesky inverse SUBSPACE iteration (dimension 2) on AᵀA.

    The general pnp_dlt keeps SVD-of-A (f32 conditioning, see below);
    this path exists for the RANSAC *minimal* solves, where XLA's batched
    iterative SVD costs ~38 µs/hypothesis on TPU while Cholesky +
    triangular solves are direct and ~20× cheaper. Hypothesis poses only
    need to classify inliers at a pixel threshold — the survivors are
    re-fit by the SVD path during local optimisation.

    A 2-vector subspace (instead of one start vector) makes the result
    robust to (a) a start vector nearly orthogonal to the null direction
    and (b) a small gap between the two smallest singular values on
    near-degenerate samples: convergence is then governed by σ₃, and the
    closed-form 2×2 Rayleigh–Ritz picks the best vector in the span."""
    m = a.T @ a  # [12, 12]
    eps = 1e-6 * (jnp.trace(m) / 12.0) + 1e-30
    chol = jnp.linalg.cholesky(m + eps * jnp.eye(12, dtype=a.dtype))
    # Fixed orthonormal 2-frame start; the alternating-sign second vector
    # keeps a nonzero component on any null direction the flat one lacks.
    x = jnp.stack(
        [
            jnp.ones((12,), a.dtype) / jnp.sqrt(12.0),
            jnp.array([1, -1] * 6, a.dtype) / jnp.sqrt(12.0),
        ],
        axis=1,
    )  # [12, 2]
    for _ in range(iters):
        y = jax.scipy.linalg.solve_triangular(chol, x, lower=True)
        x = jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)
        # 2-column Gram–Schmidt re-orthonormalisation.
        c0 = x[:, 0] / jnp.maximum(jnp.linalg.norm(x[:, 0]), 1e-30)
        c1 = x[:, 1] - jnp.dot(c0, x[:, 1]) * c0
        c1 = c1 / jnp.maximum(jnp.linalg.norm(c1), 1e-30)
        x = jnp.stack([c0, c1], axis=1)
    # Rayleigh–Ritz on span(x): B = xᵀ M x, closed-form smallest eigvec.
    mx = m @ x
    baa = jnp.dot(x[:, 0], mx[:, 0])
    bab = jnp.dot(x[:, 0], mx[:, 1])
    bcc = jnp.dot(x[:, 1], mx[:, 1])
    lam = 0.5 * (baa + bcc) - jnp.sqrt(jnp.square(0.5 * (baa - bcc)) + jnp.square(bab))
    # Eigvec of [[baa,bab],[bab,bcc]] for λ: pick the better-conditioned form.
    v_a = jnp.stack([bab, lam - baa])
    v_b = jnp.stack([lam - bcc, bab])
    v = jnp.where(jnp.abs(lam - baa) > jnp.abs(lam - bcc), v_a, v_b)
    # bab≈0 ⇒ B diagonal ⇒ basis vector with the smaller diagonal wins.
    diag = jnp.where(baa <= bcc, jnp.array([1.0, 0.0], a.dtype), jnp.array([0.0, 1.0], a.dtype))
    v = jnp.where(jnp.linalg.norm(v) < 1e-20, diag, v)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    out = x @ v
    return out / jnp.maximum(jnp.linalg.norm(out), 1e-30)


def _pose_from_pnorm(p_norm, s3, c3, s2, c2, fast: bool):
    """Denormalise P and extract (qvec, tvec) — shared DLT tail."""
    dtype = p_norm.dtype
    t2_inv = jnp.array(
        [[1 / s2, 0, c2[0]], [0, 1 / s2, c2[1]], [0, 0, 1]], dtype
    )
    t3 = jnp.concatenate(
        [
            jnp.concatenate([s3 * jnp.eye(3, dtype=dtype), (-s3 * c3)[:, None]], 1),
            jnp.array([[0.0, 0, 0, 1]], dtype),
        ],
        0,
    )
    p = t2_inv @ p_norm @ t3
    m = p[:, :3]
    det = _det3(m) if fast else jnp.linalg.det(m)
    p = jnp.where(det < 0, -p, p)
    m = p[:, :3]
    if fast:
        rot, scale = _polar_rotation(m)
    else:
        uu, ss, vt = jnp.linalg.svd(m)
        rot = uu @ vt
        scale = jnp.mean(ss)
    t = p[:, 3] / jnp.maximum(scale, 1e-12)
    return rotmat_to_qvec(rot), t


def pnp_dlt_fast(points3d: jax.Array, points2d_norm: jax.Array):
    """Minimal-sample DLT PnP without iterative factorisations.

    Same contract as `pnp_dlt(points3d, points2d_norm)` but the null
    vector comes from Cholesky inverse iteration and the rotation from a
    Newton polar iteration — all direct small-matrix arithmetic, built
    for vmapping over RANSAC hypothesis lanes (~20× faster than the
    batched SVD path on TPU). Use ONLY for hypothesis generation; final
    fits go through `pnp_dlt`.
    """
    n = points3d.shape[0]
    w = jnp.ones((n,), points3d.dtype)
    x3, x2, s3, c3, s2, c2 = _hartley_normalize(points3d, points2d_norm, w)
    a = _dlt_rows(x3, x2, w)
    p_norm = _null12_inverse_iteration(a).reshape(3, 4)
    return _pose_from_pnorm(p_norm, s3, c3, s2, c2, fast=True)


def pnp_dlt(
    points3d: jax.Array,
    points2d_norm: jax.Array,
    weights: jax.Array | None = None,
):
    """Direct linear transform PnP on normalised image coordinates.

    Args:
      points3d: [N, 3] world points.
      points2d_norm: [N, 2] undistorted normalised coords (x/z, y/z).
      weights: optional [N] row weights (0 disables a correspondence).

    Returns (qvec [4], tvec [3]). Requires ≥6 effective correspondences;
    with fewer the result is garbage but finite (callers gate on inlier
    counts, mirroring the reference's ≥8-matches gate,
    ``it_loc/localize_cv2.py:719``).
    """
    n = points3d.shape[0]
    w = jnp.ones((n,), points3d.dtype) if weights is None else weights

    # Hartley normalisation (weighted) — essential for float32 conditioning.
    x3, x2, s3, c3, s2, c2 = _hartley_normalize(points3d, points2d_norm, w)
    a = _dlt_rows(x3, x2, w)  # [2N, 12]
    # SVD of A, not eigh of AᵀA: squaring the condition number is fatal in
    # float32 for near-degenerate RANSAC minimal samples.
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    p_norm = vt[-1, :].reshape(3, 4)
    # Denormalise: x2_norm = T2 · x2, X3_norm = T3 · X3  ⇒  P = T2⁻¹ P_n T3.
    return _pose_from_pnorm(p_norm, s3, c3, s2, c2, fast=False)


def refine_pose_lm(
    qvec: jax.Array,
    tvec: jax.Array,
    points3d: jax.Array,
    points2d: jax.Array,
    cam_params: jax.Array,
    weights: jax.Array,
    iterations: int = 10,
    init_lambda: float = 1e-3,
):
    """Levenberg–Marquardt pose-only refinement (pixel reprojection).

    Masked rows (weight 0) contribute nothing; `iterations` is static.
    Parity target: ``pycolmap.pose_refinement`` (Ceres LM with fixed
    inliers). Returns (qvec, tvec).
    """
    rot0 = qvec_to_rotmat(qvec)

    def project_rot(rot, t):
        # Rotation-matrix projection path (avoids the non-differentiable
        # rotmat→qvec extraction inside the LM inner loop).
        pc = points3d @ rot.T + t
        z = pc[:, 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        xn = pc[:, 0] * inv_z
        yn = pc[:, 1] * inv_z
        from sfd2_tpu.geometry.cameras import _distort

        xd, yd = _distort(xn, yn, cam_params)
        u = cam_params[0] * xd + cam_params[2]
        v = cam_params[1] * yd + cam_params[3]
        return jnp.stack([u, v], axis=-1)

    def residuals(delta):
        w, dt = delta[:3], delta[3:]
        rot = _axis_angle_to_rotmat(w) @ rot0
        r = (project_rot(rot, tvec + dt) - points2d) * weights[:, None]
        return r.reshape(-1)

    def step(carry, _):
        delta, lam, best_cost = carry
        r = residuals(delta)
        jac = jax.jacfwd(residuals)(delta)  # [2N, 6]
        jtj = jac.T @ jac
        jtr = jac.T @ r
        damped = jtj + lam * jnp.diag(jnp.diag(jtj)) + 1e-9 * jnp.eye(6)
        upd = jnp.linalg.solve(damped, jtr)
        cand = delta - upd
        new_cost = jnp.sum(residuals(cand) ** 2)
        improved = new_cost < best_cost
        delta = jnp.where(improved, cand, delta)
        lam = jnp.where(improved, lam * 0.3, lam * 4.0)
        best_cost = jnp.minimum(best_cost, new_cost)
        return (delta, lam, best_cost), None

    init_cost = jnp.sum(residuals(jnp.zeros(6)) ** 2)
    (delta, _, _), _ = jax.lax.scan(
        step, (jnp.zeros(6, qvec.dtype), jnp.array(init_lambda, qvec.dtype), init_cost),
        None, length=iterations,
    )
    w, dt = delta[:3], delta[3:]
    rot = _axis_angle_to_rotmat(w) @ rot0
    return rotmat_to_qvec(rot), tvec + dt


@functools.partial(jax.jit, static_argnames=("iters", "lm_iterations"))
def refine_pose_iterative(
    qvec: jax.Array,
    tvec: jax.Array,
    points3d: jax.Array,
    points2d: jax.Array,
    cam_params: jax.Array,
    base_mask: jax.Array,  # [N] bool — RANSAC inliers (AND'd every iter)
    opt_thresh: jax.Array | float,
    iters: int = 5,
    lm_iterations: int = 10,
):
    """Fused covisibility-refinement inner loop: per iteration, reproject,
    re-select inliers (err ≤ opt_thresh AND base_mask), stop permanently
    when support < 6, else LM-refine on the selection.

    Parity: the reference's host loop in ``pose_refinement_covisibility``
    (``it_loc/localize_cv2.py:341-370``) — identical selection rule, but
    ONE jitted program instead of `iters` host↔device round-trips (each
    costs a full relay RTT here, and op-by-op eager dispatch besides).

    Returns (qvec, tvec, num — support of the last executed iteration
    (0 if none ran), nums [iters] — per-iteration support, −1 where the
    iteration did not run).
    """
    def body(carry, _):
        q, t, stopped, num = carry
        proj, _ = project_points(points3d, q, t, cam_params)
        err = jnp.linalg.norm(points2d - proj, axis=1)
        mask = (err <= opt_thresh) & base_mask
        n = jnp.sum(mask)
        run = (~stopped) & (n >= 6)
        q_new, t_new = refine_pose_lm(
            q, t, points3d, points2d, cam_params,
            mask.astype(points3d.dtype), iterations=lm_iterations,
        )
        q = jnp.where(run, q_new, q)
        t = jnp.where(run, t_new, t)
        num = jnp.where(run, n, num)
        stopped = stopped | ~run
        return (q, t, stopped, num), jnp.where(run, n, -1)

    (q, t, _, num), nums = jax.lax.scan(
        body,
        (qvec, tvec, jnp.array(False), jnp.array(0, jnp.int32)),
        None,
        length=iters,
    )
    return q, t, num, nums


# ---------------------------------------------------------------------------
# Hypothesis-lanes minimal solver (structure-of-arrays)
# ---------------------------------------------------------------------------


def _polar_rotation_lanes(m, iters: int = 5):
    """`_polar_rotation` over a leading hypothesis axis: m [H, 3, 3] →
    (R [H, 3, 3], scale [H]). Same Newton iteration, written with
    axis-wise cross products and trace-as-elementwise-sum so no batched
    LAPACK-style op is emitted."""

    def det3(x):
        return jnp.sum(x[:, 0] * jnp.cross(x[:, 1], x[:, 2]), axis=-1)

    def cof3(x):
        return jnp.stack(
            [
                jnp.cross(x[:, 1], x[:, 2]),
                jnp.cross(x[:, 2], x[:, 0]),
                jnp.cross(x[:, 0], x[:, 1]),
            ],
            axis=1,
        )

    fro = jnp.sqrt(jnp.sum(m * m, axis=(-2, -1), keepdims=True))
    x = m * (jnp.sqrt(3.0) / jnp.maximum(fro, 1e-12))
    for _ in range(iters):
        det = det3(x)
        det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        x = 0.5 * (x + cof3(x) / det[:, None, None])
    scale = jnp.sum(x * m, axis=(-2, -1)) / 3.0
    return x, scale


def pnp_dlt_fast_lanes(points3d: jax.Array, points2d_norm: jax.Array):
    """`pnp_dlt_fast` over hypothesis lanes: [H, 6, 3] + [H, 6, 2] →
    (qvec [H, 4], tvec [H, 3]).

    Why not ``jax.vmap(pnp_dlt_fast)``: XLA's *batched* 12×12 linalg is
    pathological on TPU — measured [1024,12,12] AᵀA 1.0 ms, batched
    Cholesky 1.17 ms, each triangular solve 0.3 ms (the whole vmapped
    solver: 1.26 ms). Here every matrix entry is an [H]-wide vector and
    the Cholesky / triangular solves / Gram–Schmidt are unrolled into
    static scalar formulas over those vectors, so the entire solver
    compiles to fused elementwise ops with hypotheses on the VPU lanes
    (~10× faster). Same algorithm, same guards; results agree with the
    vmapped path to float tolerance.
    """
    h, n = points3d.shape[0], points3d.shape[1]
    dt = points3d.dtype

    # Hartley normalisation (per hypothesis, elementwise).
    c3 = jnp.mean(points3d, axis=1)  # [H, 3]
    x3 = points3d - c3[:, None, :]
    s3 = jnp.sqrt(3.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(x3, axis=-1), axis=1), 1e-12
    )  # [H]
    x3 = x3 * s3[:, None, None]
    c2 = jnp.mean(points2d_norm, axis=1)
    x2 = points2d_norm - c2[:, None, :]
    s2 = jnp.sqrt(2.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(x2, axis=-1), axis=1), 1e-12
    )
    x2 = x2 * s2[:, None, None]

    # M = AᵀA in 4×4 blocks, from the DLT row structure
    #   row_u = [xh, 0, -u·xh], row_v = [0, xh, -v·xh]:
    #   B00 = B11 = Σ xh xhᵀ;  B01 = 0;  B02 = -Σ u xh xhᵀ;
    #   B12 = -Σ v xh xhᵀ;     B22 = Σ (u²+v²) xh xhᵀ.
    xh = jnp.concatenate([x3, jnp.ones((h, n, 1), dt)], axis=-1)  # [H, 6, 4]
    u = x2[..., 0]
    v = x2[..., 1]
    wu, wv, wuv = -u, -v, u * u + v * v

    def gram(weight):  # Σ_n weight_n · xh_i · xh_j → dict [H] vectors
        g = {}
        for i in range(4):
            for j in range(i, 4):
                s = jnp.sum(
                    (xh[..., i] * xh[..., j]) if weight is None
                    else (weight * xh[..., i] * xh[..., j]),
                    axis=1,
                )
                g[(i, j)] = g[(j, i)] = s
        return g

    g1, gu, gv, guv = gram(None), gram(wu), gram(wv), gram(wuv)

    zero = jnp.zeros((h,), dt)
    M = {}
    for i in range(4):
        for j in range(4):
            M[(i, j)] = g1[(i, j)]
            M[(i + 4, j + 4)] = g1[(i, j)]
            M[(i + 8, j + 8)] = guv[(i, j)]
            M[(i, j + 4)] = M[(i + 4, j)] = zero
            M[(i, j + 8)] = M[(j + 8, i)] = gu[(i, j)]
            M[(i + 4, j + 8)] = M[(j + 8, i + 4)] = gv[(i, j)]

    trace = sum(M[(d, d)] for d in range(12))
    eps = 1e-6 * (trace / 12.0) + 1e-30
    for d in range(12):
        M[(d, d)] = M[(d, d)] + eps

    # Unrolled Cholesky M = L Lᵀ (NaN on indefinite samples — callers
    # mask non-finite poses, same as the vmapped path).
    L = {}
    for j in range(12):
        d = M[(j, j)] - sum(L[(j, k)] * L[(j, k)] for k in range(j))
        ljj = jnp.sqrt(d)
        L[(j, j)] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, 12):
            L[(i, j)] = (
                M[(i, j)] - sum(L[(i, k)] * L[(j, k)] for k in range(j))
            ) * inv

    # Inverse subspace iteration, 2 columns, unrolled solves.
    cols = [
        [jnp.full((h,), 1.0 / jnp.sqrt(12.0), dt) for _ in range(12)],
        [
            jnp.full((h,), (1.0 if i % 2 == 0 else -1.0) / jnp.sqrt(12.0), dt)
            for i in range(12)
        ],
    ]
    for _ in range(4):
        new_cols = []
        for b in cols:
            y = []
            for i in range(12):
                y.append(
                    (b[i] - sum(L[(i, k)] * y[k] for k in range(i)))
                    / L[(i, i)]
                )
            x = [None] * 12
            for i in range(11, -1, -1):
                x[i] = (
                    y[i] - sum(L[(k, i)] * x[k] for k in range(i + 1, 12))
                ) / L[(i, i)]
            new_cols.append(x)
        c0, c1 = new_cols
        n0 = jnp.sqrt(sum(t * t for t in c0))
        c0 = [t / jnp.maximum(n0, 1e-30) for t in c0]
        dot01 = sum(a * b for a, b in zip(c0, c1))
        c1 = [b - dot01 * a for a, b in zip(c0, c1)]
        n1 = jnp.sqrt(sum(t * t for t in c1))
        c1 = [t / jnp.maximum(n1, 1e-30) for t in c1]
        cols = [c0, c1]

    # Rayleigh–Ritz on span(c0, c1).
    c0, c1 = cols
    m0 = [sum(M[(i, j)] * c0[j] for j in range(12)) for i in range(12)]
    m1 = [sum(M[(i, j)] * c1[j] for j in range(12)) for i in range(12)]
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
    sol = [a * v0 + b * v1 for a, b in zip(c0, c1)]
    sn = jnp.sqrt(sum(t * t for t in sol))
    sol = [t / jnp.maximum(sn, 1e-30) for t in sol]
    p_norm = jnp.stack(sol, axis=-1).reshape(h, 3, 4)

    # Denormalise + rotation extraction ([H,·,·] matmuls are on the fast
    # batched path; only transposed contractions are pathological).
    t2_inv = jnp.zeros((h, 3, 3), dt)
    t2_inv = t2_inv.at[:, 0, 0].set(1.0 / s2).at[:, 1, 1].set(1.0 / s2)
    t2_inv = (
        t2_inv.at[:, 0, 2].set(c2[:, 0]).at[:, 1, 2].set(c2[:, 1])
        .at[:, 2, 2].set(1.0)
    )
    t3 = jnp.zeros((h, 4, 4), dt)
    for d in range(3):
        t3 = t3.at[:, d, d].set(s3)
    t3 = t3.at[:, :3, 3].set(-s3[:, None] * c3).at[:, 3, 3].set(1.0)
    p = t2_inv @ p_norm @ t3  # [H, 3, 4]
    m3 = p[:, :, :3]
    det = jnp.sum(m3[:, 0] * jnp.cross(m3[:, 1], m3[:, 2]), axis=-1)
    p = jnp.where((det < 0)[:, None, None], -p, p)
    rot, scale = _polar_rotation_lanes(p[:, :, :3])
    t = p[:, :, 3] / jnp.maximum(scale, 1e-12)[:, None]
    return rotmat_to_qvec(rot), t
