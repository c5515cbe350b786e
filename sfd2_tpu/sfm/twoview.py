"""Two-view geometric verification: batched 8-point RANSAC (pure JAX).

Capability parity: the COLMAP ``matches_importer`` C++ binary
(``hloc/triangulation.py:114-125``) — RANSAC fundamental-matrix fitting
over candidate matches with a Sampson-error inlier test, producing the
verified ``two_view_geometries`` that gate triangulation.

TPU-native redesign (SURVEY §7.1): hypotheses are a lane dimension — H
8-point samples are solved simultaneously (vmapped normalised 8-point
algorithm, eigh on the 9×9 normal matrix), all H×N Sampson distances
score in one fused program, followed by a least-squares re-fit on the
winner's inliers (local optimisation). Statically shaped: matches arrive
padded with a validity mask; every pair in a batch verifies in parallel
via vmap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TwoViewResult(NamedTuple):
    fmatrix: jax.Array  # [3, 3]
    inliers: jax.Array  # [N] bool
    num_inliers: jax.Array  # [] int32
    success: jax.Array  # [] bool


def _normalize_points(xy: jax.Array, w: jax.Array):
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c = jnp.sum(xy * w[:, None], axis=0) / wsum
    d = jnp.sum(jnp.linalg.norm(xy - c, axis=1) * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    t = jnp.array(
        [[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]], xy.dtype
    )
    return (xy - c) * s, t


def fit_fundamental(xy1: jax.Array, xy2: jax.Array, weights: jax.Array | None = None):
    """Weighted 8-point fundamental-matrix fit (≥8 effective points)."""
    n = xy1.shape[0]
    w = jnp.ones((n,), xy1.dtype) if weights is None else weights
    p1, t1 = _normalize_points(xy1, w)
    p2, t2 = _normalize_points(xy2, w)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    a = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )
    a = a * w[:, None]
    # SVD of A (not eigh of AᵀA — squaring the condition number is fatal
    # in float32 for the epipolar data matrix).
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    f = vt[-1, :].reshape(3, 3)
    # Enforce rank 2.
    u, s, vt = jnp.linalg.svd(f)
    f = u @ jnp.diag(s.at[2].set(0.0)) @ vt
    f = t2.T @ f @ t1
    return f / jnp.where(jnp.abs(f[2, 2]) < 1e-12, 1.0, f[2, 2])


def sampson_error(f: jax.Array, xy1: jax.Array, xy2: jax.Array):
    """First-order geometric (Sampson) distance per correspondence."""
    ones = jnp.ones((*xy1.shape[:-1], 1), xy1.dtype)
    h1 = jnp.concatenate([xy1, ones], axis=-1)
    h2 = jnp.concatenate([xy2, ones], axis=-1)
    fx1 = h1 @ f.T  # = F · x1 per row
    ftx2 = h2 @ f  # = Fᵀ · x2 per row
    num = jnp.sum(h2 * fx1, axis=-1) ** 2
    den = fx1[..., 0] ** 2 + fx1[..., 1] ** 2 + ftx2[..., 0] ** 2 + ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


# ---------------------------------------------------------------------------
# Lanes-form 8-point machinery: every matrix entry is a leading-lane-shaped
# array and the 9×9 factorisation / nullvector extraction are unrolled into
# static scalar formulas — XLA's *batched* small-matrix linalg (the vmapped
# SVD path) is pathological on TPU (CLAUDE.md "TPU performance rules";
# same redesign as localization/pnp.py::pnp_dlt_fast_lanes).
# ---------------------------------------------------------------------------


def _sym3_smallest_eigvec(a: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric 3×3
    matrices [..., 3, 3] — closed-form (trigonometric eigenvalues + row
    cross products), no batched linalg."""
    dt = a.dtype
    eye = jnp.eye(3, dtype=dt)
    q = (a[..., 0, 0] + a[..., 1, 1] + a[..., 2, 2]) / 3.0
    b = a - q[..., None, None] * eye
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    bn = b / p[..., None, None]
    det = (
        bn[..., 0, 0] * (bn[..., 1, 1] * bn[..., 2, 2] - bn[..., 1, 2] * bn[..., 2, 1])
        - bn[..., 0, 1] * (bn[..., 1, 0] * bn[..., 2, 2] - bn[..., 1, 2] * bn[..., 2, 0])
        + bn[..., 0, 2] * (bn[..., 1, 0] * bn[..., 2, 1] - bn[..., 1, 1] * bn[..., 2, 0])
    )
    r = jnp.clip(det / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    c = a - lam_min[..., None, None] * eye
    r0, r1, r2 = c[..., 0, :], c[..., 1, :], c[..., 2, :]
    cands = jnp.stack(
        [jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)], axis=-2
    )  # [..., 3, 3]
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), axis=-2)[
        ..., 0, :
    ]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Degenerate (isotropic) case: any unit vector is an eigenvector.
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dt), v.shape)
    return jnp.where(vn > 1e-20, v / jnp.maximum(vn, 1e-30), fallback)


def _rank2_project(f: jax.Array) -> jax.Array:
    """Project [..., 3, 3] onto rank 2: F ← F(I − v₃v₃ᵀ) with v₃ the
    right singular vector of the smallest singular value (F v₃ = σ₃u₃,
    so subtracting (Fv₃)v₃ᵀ removes exactly the σ₃ component)."""
    ftf = jnp.einsum("...ki,...kj->...ij", f, f)
    v3 = _sym3_smallest_eigvec(ftf)
    fv3 = jnp.einsum("...ij,...j->...i", f, v3)
    return f - fv3[..., :, None] * v3[..., None, :]


def _fit_fundamental_lanes(
    xy1: jax.Array, xy2: jax.Array, w: jax.Array
) -> jax.Array:
    """Weighted 8-point fundamental fit over arbitrary leading lane dims:
    xy1/xy2 [..., N, 2], w [..., N] (rows scaled by w, matching
    ``fit_fundamental``) → rank-2 F [..., 3, 3], Frobenius-normalised.

    Hartley normalisation keeps the 9×9 Gram matrix O(1)-conditioned in
    f32; the Cholesky + inverse subspace iteration + Rayleigh–Ritz
    nullvector extraction is the pnp_dlt_fast_lanes pattern at size 9."""
    dt = xy1.dtype
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)

    def norm_pts(xy):
        c = jnp.sum(xy * w[..., None], axis=-2) / wsum  # [..., 2]
        d = jnp.sum(
            jnp.linalg.norm(xy - c[..., None, :], axis=-1) * w, axis=-1
        ) / wsum[..., 0]
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)  # [...]
        return (xy - c[..., None, :]) * s[..., None, None], c, s

    p1, c1, s1 = norm_pts(xy1)
    p2, c2, s2 = norm_pts(xy2)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    cols = [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones]

    w2 = w * w
    m = {}
    for i in range(9):
        for j in range(i, 9):
            s = jnp.sum(w2 * cols[i] * cols[j], axis=-1)
            m[(i, j)] = m[(j, i)] = s
    trace = sum(m[(d, d)] for d in range(9))
    eps = 1e-6 * (trace / 9.0) + 1e-30
    for d in range(9):
        m[(d, d)] = m[(d, d)] + eps

    # Unrolled Cholesky M = L Lᵀ.
    ch = {}
    for j in range(9):
        djj = m[(j, j)] - sum(ch[(j, k)] * ch[(j, k)] for k in range(j))
        ljj = jnp.sqrt(jnp.maximum(djj, 1e-30))
        ch[(j, j)] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, 9):
            ch[(i, j)] = (
                m[(i, j)] - sum(ch[(i, k)] * ch[(j, k)] for k in range(j))
            ) * inv

    lead = x1.shape[:-1]
    cols_iter = [
        [jnp.full(lead, 1.0 / 3.0, dt) for _ in range(9)],
        [
            jnp.full(lead, (1.0 if i % 2 == 0 else -1.0) / 3.0, dt)
            for i in range(9)
        ],
    ]
    for _ in range(4):
        new_cols = []
        for bvec in cols_iter:
            y = []
            for i in range(9):
                y.append(
                    (bvec[i] - sum(ch[(i, k)] * y[k] for k in range(i)))
                    / ch[(i, i)]
                )
            x = [None] * 9
            for i in range(8, -1, -1):
                x[i] = (
                    y[i] - sum(ch[(k, i)] * x[k] for k in range(i + 1, 9))
                ) / ch[(i, i)]
            new_cols.append(x)
        c0, c1v = new_cols
        n0 = jnp.sqrt(sum(t * t for t in c0))
        c0 = [t / jnp.maximum(n0, 1e-30) for t in c0]
        dot01 = sum(a * b for a, b in zip(c0, c1v))
        c1v = [b - dot01 * a for a, b in zip(c0, c1v)]
        n1 = jnp.sqrt(sum(t * t for t in c1v))
        c1v = [t / jnp.maximum(n1, 1e-30) for t in c1v]
        cols_iter = [c0, c1v]

    # Rayleigh–Ritz on span(c0, c1) picks the true smallest direction.
    c0, c1v = cols_iter
    m0 = [sum(m[(i, j)] * c0[j] for j in range(9)) for i in range(9)]
    m1 = [sum(m[(i, j)] * c1v[j] for j in range(9)) for i in range(9)]
    baa = sum(a * b for a, b in zip(c0, m0))
    bab = sum(a * b for a, b in zip(c0, m1))
    bcc = sum(a * b for a, b in zip(c1v, m1))
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
    sol = [a * v0 + b * v1 for a, b in zip(c0, c1v)]
    f_norm = jnp.stack(sol, axis=-1).reshape(*lead, 3, 3)

    # Denormalise F = T2ᵀ F̂ T1 (batched [...,3,3] matmuls are fine; only
    # *transposed-contraction* batched linalg is pathological).
    def tmat(c, s):
        t = jnp.zeros((*lead, 3, 3), dt)
        t = t.at[..., 0, 0].set(s).at[..., 1, 1].set(s)
        t = t.at[..., 0, 2].set(-s * c[..., 0])
        t = t.at[..., 1, 2].set(-s * c[..., 1])
        return t.at[..., 2, 2].set(1.0)

    t1m = tmat(c1, s1)
    t2m = tmat(c2, s2)
    f = jnp.einsum("...ki,...kl,...lj->...ij", t2m, f_norm, t1m)
    f = _rank2_project(f)
    fn = jnp.linalg.norm(f.reshape(*lead, 9), axis=-1)
    return f / jnp.maximum(fn, 1e-30)[..., None, None]


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "min_inliers"))
def verify_fundamental_ransac(
    xy1: jax.Array,
    xy2: jax.Array,
    valid: jax.Array,
    threshold: float = 4.0,
    key: jax.Array | None = None,
    num_hypotheses: int = 2048,
    min_inliers: int = 15,
    min_inlier_ratio: float = 0.1,
) -> TwoViewResult:
    """F-RANSAC over padded matches. Thresholds mirror the reference's
    colmap invocation (max_error 4, min_inlier_ratio 0.1,
    min_num_inliers 15; ``hloc/triangulation.py:118-124``)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = xy1.shape[0]
    fvalid = valid.astype(xy1.dtype)
    thr2 = threshold * threshold

    def sample_one(k):
        g = jax.random.gumbel(k, (n,)) + jnp.log(fvalid + 1e-30)
        _, idx = jax.lax.top_k(g, 8)
        return idx

    keys = jax.random.split(key, num_hypotheses)
    idx = jax.vmap(sample_one)(keys)  # [H, 8]
    # Hypotheses as lanes (not vmapped SVD — see _fit_fundamental_lanes).
    ones8 = jnp.ones((num_hypotheses, 8), xy1.dtype)
    fs = _fit_fundamental_lanes(xy1[idx], xy2[idx], ones8)  # [H, 3, 3]

    errs = jax.vmap(lambda f: sampson_error(f, xy1, xy2))(fs)  # [H, N]
    # MSAC scoring: truncated squared error rewards tight fits, not just
    # raw counts (plain counting picks loose hypotheses whose refit then
    # stalls).
    msac = jnp.sum(
        jnp.where(valid[None, :], jnp.minimum(errs, thr2), thr2), axis=1
    )
    finite = jnp.all(jnp.isfinite(fs.reshape(num_hypotheses, -1)), axis=1)
    msac = jnp.where(finite, msac, jnp.inf)
    best = jnp.argmin(msac)
    f = fs[best]

    # Local optimisation: iterative least-squares re-fit on inliers,
    # accepted on MSAC improvement.
    def msac_of(fm):
        e = sampson_error(fm, xy1, xy2)
        return jnp.sum(jnp.where(valid, jnp.minimum(e, thr2), thr2))

    cur = msac_of(f)
    for _ in range(4):
        # Soft IRLS weights: inliers weighted by 1/(1+e/thr²) so marginal
        # (possibly contaminated) inliers pull the refit less.
        e = sampson_error(f, xy1, xy2)
        wts = jnp.where((e <= thr2) & valid, 1.0 / (1.0 + e / thr2), 0.0)
        f_ls = _fit_fundamental_lanes(xy1, xy2, wts.astype(xy1.dtype))
        ok = jnp.all(jnp.isfinite(f_ls))
        cand = jnp.where(ok, msac_of(f_ls), jnp.inf)
        take = cand < cur
        f = jnp.where(take, f_ls, f)
        cur = jnp.minimum(cand, cur)

    inliers = (sampson_error(f, xy1, xy2) <= thr2) & valid
    num = jnp.sum(inliers).astype(jnp.int32)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    success = (num >= min_inliers) & (
        num.astype(jnp.float32) / n_valid.astype(jnp.float32) >= min_inlier_ratio
    )
    return TwoViewResult(fmatrix=f, inliers=inliers, num_inliers=num, success=success)


# ---------------------------------------------------------------------------
# Essential-matrix decomposition (incremental-SfM bootstrap)
# ---------------------------------------------------------------------------


def essential_from_fundamental(f: jax.Array, k1: jax.Array, k2: jax.Array):
    """E = K2ᵀ F K1 with singular values normalised to (1, 1, 0)."""
    e = k2.T @ f @ k1
    u, s, vt = jnp.linalg.svd(e)
    return u @ jnp.diag(jnp.array([1.0, 1.0, 0.0], e.dtype)) @ vt


def _triangulate_midpoint(norm1, norm2, rot, t):
    """Linear two-view triangulation in normalised coords (cam1 frame)."""
    n = norm1.shape[0]
    ones = jnp.ones((n, 1), norm1.dtype)
    r1 = jnp.concatenate([norm1, ones], axis=1)  # rays in cam1
    # DLT rows per point for P1 = [I|0], P2 = [R|t].
    def tri_one(x1, x2):
        p1 = jnp.concatenate([jnp.eye(3, dtype=rot.dtype), jnp.zeros((3, 1), rot.dtype)], 1)
        p2 = jnp.concatenate([rot, t[:, None]], 1)
        rows = jnp.stack(
            [
                x1[0] * p1[2] - p1[0],
                x1[1] * p1[2] - p1[1],
                x2[0] * p2[2] - p2[0],
                x2[1] * p2[2] - p2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(rows)
        h = vt[-1]
        return h[:3] / jnp.where(jnp.abs(h[3]) < 1e-12, 1e-12, h[3])

    return jax.vmap(tri_one)(norm1, norm2)


def decompose_essential(
    e: jax.Array,
    norm1: jax.Array,
    norm2: jax.Array,
    weights: jax.Array | None = None,
):
    """Recover (R, t̂) from E by cheirality voting over the 4 candidates.

    Args: normalised (undistorted) image coords in the two views. Returns
    (rot [3,3], t_unit [3], n_in_front) for the winning configuration —
    pose of view 2 w.r.t. view 1 with ‖t‖=1 (scale is unobservable).
    """
    n = norm1.shape[0]
    w = jnp.ones((n,), norm1.dtype) if weights is None else weights
    u, _, vt = jnp.linalg.svd(e)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    wmat = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], e.dtype)
    r_a = u @ wmat @ vt
    r_b = u @ wmat.T @ vt
    t_u = u[:, 2]

    def count_front(rot, t):
        x1 = _triangulate_midpoint(norm1, norm2, rot, t)
        z1 = x1[:, 2]
        z2 = (x1 @ rot.T + t)[:, 2]
        return jnp.sum(((z1 > 0) & (z2 > 0)).astype(w.dtype) * w), (rot, t)

    cands = [(r_a, t_u), (r_a, -t_u), (r_b, t_u), (r_b, -t_u)]
    counts = jnp.stack([count_front(r, t)[0] for r, t in cands])
    best = jnp.argmax(counts)
    rots = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return rots[best], ts[best], counts[best]
