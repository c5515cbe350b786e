"""Bundle adjustment: Schur-complement LM with matrix-free PCG (JAX).

Capability parity: the Ceres solves inside COLMAP that the reference
delegates to — point-only refinement inside ``point_triangulator``
(poses fixed, ``hloc/triangulation.py:140-142``) and the full BA of
``colmap mapper`` (``hloc/reconstruction.py:66-83``) — plus the
north-star requirement (BASELINE.json): a *sharded* reduced-camera-system
BA that scales over a device mesh.

TPU-native design (SURVEY §7.1):
* observations are flat padded arrays (xy, cam-idx, point-idx, weight);
  every per-entity reduction is a ``segment_sum`` — under pjit with the
  observation axis sharded across the mesh these compile to psum-style
  collectives automatically, which IS the distributed Schur assembly.
* the normal equations are never materialised: the Schur complement
  S = Hcc − Hcp·Hpp⁻¹·Hpc is applied matrix-free inside preconditioned
  CG (block-Jacobi preconditioner from the damped Hcc diagonal blocks);
  wall-clock per iteration is a handful of [O]-length fused elementwise
  passes + tiny [C,6] solves.
* Huber robust weights; LM damping with a gain-ratio trust-region
  schedule (Ceres/Madsen-Nielsen semantics — the trust-region update
  behind ``hloc/triangulation.py:129-147``'s Ceres solves): λ shrinks by
  max(1/3, 1−(2ρ−1)³) on accept, grows by a doubling ν on reject.
* ONE gather+residual pass per LM iteration: each iteration linearizes
  (residual + Jacobian + robust cost in a single fused pass) at the
  trial point, and an accepted trial's linearization is reused as the
  next iteration's — rejected iterations re-solve the carried normal
  equations with a larger λ without touching the observations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfd2_tpu.ops.pallas_gather import gather_rows
from sfd2_tpu.geometry.cameras import _distort
from sfd2_tpu.geometry.rotations import qvec_to_rotmat, rotmat_to_qvec
from sfd2_tpu.localization.pnp import _axis_angle_to_rotmat


class BAProblem(NamedTuple):
    """Static-shape BA instance. Padded observations have weight 0."""

    obs_xy: jax.Array  # [O, 2] pixel observations
    obs_cam: jax.Array  # [O] int32 camera index
    obs_point: jax.Array  # [O] int32 point index
    obs_w: jax.Array  # [O] weight (0 = padding)
    qvecs: jax.Array  # [C, 4] initial poses (world→cam)
    tvecs: jax.Array  # [C, 3]
    cam_params: jax.Array  # [C, 8] canonical intrinsics (fixed)
    points: jax.Array  # [P, 3] initial points
    fixed_cams: jax.Array  # [C] bool — poses to keep fixed (gauge/anchors)


class BAResult(NamedTuple):
    qvecs: jax.Array
    tvecs: jax.Array
    points: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array


def _inv3_lanes(m):
    """Closed-form inverse of batched 3x3 matrices [..., 3, 3] via the
    adjugate (columns = cross products of the other rows). XLA's batched
    LU path for [P,3,3] is pathologically slow on TPU; this is pure
    elementwise/cross arithmetic over the batch lanes."""
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c0 = jnp.cross(r1, r2)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    det = jnp.sum(r0 * c0, axis=-1)[..., None, None]
    return jnp.stack([c0, c1, c2], axis=-1) / det


def _inv6_spd_lanes(m):
    """Inverse of batched SPD 6x6 matrices [..., 6, 6] by an UNROLLED
    Cholesky + column solves (static scalar formulas over batch-lane
    vectors - no XLA batched-LU op). Used for the block-Jacobi
    preconditioner; matrices are damped, so plain sqrt is safe."""
    L = {}
    for j in range(6):
        d = m[..., j, j] - sum(L[(j, k)] * L[(j, k)] for k in range(j))
        # f32 near-singular blocks can drive d <= 0; a NaN here would
        # poison every camera through the global PCG dot products, so
        # clamp to keep the preconditioner finite (huge-but-finite, like
        # the LU inverse it replaced).
        ljj = jnp.sqrt(jnp.maximum(d, 1e-20))
        L[(j, j)] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, 6):
            L[(i, j)] = (
                m[..., i, j] - sum(L[(i, k)] * L[(j, k)] for k in range(j))
            ) * inv
    cols = []
    zero = jnp.zeros_like(m[..., 0, 0])
    for c in range(6):
        y = []
        for i in range(6):
            e = jnp.ones_like(zero) if i == c else zero
            y.append((e - sum(L[(i, k)] * y[k] for k in range(i))) / L[(i, i)])
        x = [None] * 6
        for i in range(5, -1, -1):
            x[i] = (
                y[i] - sum(L[(k, i)] * x[k] for k in range(i + 1, 6))
            ) / L[(i, i)]
        cols.append(jnp.stack(x, axis=-1))
    return jnp.stack(cols, axis=-1)


def _project_one(cam6, rot0, tvec0, point, cam_params):
    """Pixel projection with a local (rotvec, dt) pose perturbation."""
    rot = _axis_angle_to_rotmat(cam6[:3]) @ rot0
    t = tvec0 + cam6[3:]
    pc = rot @ point + t
    z = jnp.where(jnp.abs(pc[2]) < 1e-8, 1e-8, pc[2])
    xn, yn = pc[0] / z, pc[1] / z
    xd, yd = _distort(xn, yn, cam_params)
    return jnp.stack(
        [cam_params[0] * xd + cam_params[2], cam_params[1] * yd + cam_params[3]]
    )


def _residual_one(cam6, dpoint, rot0, tvec0, point0, cam_params, xy):
    return _project_one(cam6, rot0, tvec0, point0 + dpoint, cam_params) - xy


def _huber_weight(r2, delta):
    """Sqrt-scaled IRLS weight for the Huber kernel."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)


@functools.partial(
    jax.jit, static_argnames=("lm_iters", "cg_iters", "optimize_points")
)
def bundle_adjust(
    problem: BAProblem,
    lm_iters: int = 10,
    cg_iters: int = 20,
    huber_delta: float = 4.0,
    init_lambda: float = 1e-4,
    optimize_points: bool = True,
) -> BAResult:
    """Run LM with Schur-complement PCG steps. Returns updated poses,
    points and costs. All shapes static; jit-compiled once per size."""
    # Sort observations by point index once per solve: every downstream
    # consumer is order-invariant (segment_sum / global sums), and sorted
    # point indices make the Pallas row gathers' bounded chunk walk
    # O(M/128 + P/128) instead of O(M/128 · P/128) — the point table is
    # the one that grows with map size (camera tables stay tiny, their
    # unsorted walk is a few chunks). See ops/pallas_gather.py.
    order = jnp.argsort(problem.obs_point)
    obs_xy = problem.obs_xy[order]
    obs_cam = problem.obs_cam[order]
    obs_point = problem.obs_point[order]
    base_w = problem.obs_w[order]
    cam_params_all = problem.cam_params
    n_cam = problem.qvecs.shape[0]
    n_pt = problem.points.shape[0]

    free_cam = (~problem.fixed_cams).astype(jnp.float32)[:, None]  # [C, 1]

    def unpack(qvecs, tvecs, points):
        rot0 = qvec_to_rotmat(qvecs)
        return rot0, tvecs, points

    def gather_obs(rot0, tvecs, points):
        """Per-observation camera/point blocks via the pallas row gather
        (XLA's scalar gather on [O]←[P] costs ~1 ms per pass here)."""
        rot_o = gather_rows(rot0.reshape(n_cam, 9), obs_cam).reshape(-1, 3, 3)
        t_o = gather_rows(tvecs, obs_cam)
        p_o = gather_rows(points, obs_point, idx_sorted=True)
        cp_o = gather_rows(cam_params_all, obs_cam)
        return rot_o, t_o, p_o, cp_o

    def linearize(rot0, tvecs, points):
        """ONE fused gather pass: residuals, Jacobians, IRLS weights and
        the true Huber cost at the given parameters. An accepted trial's
        linearization is carried into the next LM iteration, so accepted
        iterations touch the observation tables exactly once."""
        rot_o, t_o, p_o, cp_o = gather_obs(rot0, tvecs, points)

        def jac_res(o_xy, ro, to, po, cpo):
            f = lambda c6, dp: _residual_one(c6, dp, ro, to, po, cpo, o_xy)
            r = f(jnp.zeros(6), jnp.zeros(3))
            jc, jp = jax.jacfwd(f, argnums=(0, 1))(jnp.zeros(6), jnp.zeros(3))
            return r, jc, jp  # [2], [2,6], [2,3]

        r, jc, jp = jax.vmap(jac_res)(obs_xy, rot_o, t_o, p_o, cp_o)
        r2 = jnp.sum(r * r, axis=1)
        w = base_w * _huber_weight(r2, huber_delta)  # IRLS weights [O]
        # Zero camera Jacobians of fixed cameras.
        jc = jc * gather_rows(free_cam, obs_cam)[:, None, :]
        if not optimize_points:
            jp = jp * 0.0
        # Huber cost (integrated form).
        rr = jnp.sqrt(jnp.maximum(r2, 1e-12))
        c = jnp.where(
            rr <= huber_delta, 0.5 * r2, huber_delta * (rr - 0.5 * huber_delta)
        )
        return (r, jc, jp, w), jnp.sum(c * base_w)

    def solve(lin, lam):
        """Damped Schur-PCG solve of the carried normal equations.
        Returns (dcam [C,6], dpt [P,3], predicted cost reduction)."""
        r, jc, jp, w = lin
        wj = w[:, None, None]
        hcc = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", jc * wj, jc), obs_cam, n_cam
        )  # [C,6,6]
        hpp = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", jp * wj, jp), obs_point, n_pt,
            indices_are_sorted=True
        )  # [P,3,3]
        bc = jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", jc, r * w[:, None]), obs_cam, n_cam
        )  # [C,6]
        bp = jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", jp, r * w[:, None]), obs_point, n_pt,
            indices_are_sorted=True
        )  # [P,3]

        eye6 = jnp.eye(6)
        eye3 = jnp.eye(3)
        # Damping: multiplicative λ·diag (Marquardt) on both blocks.
        hcc_d = hcc + (lam * jnp.maximum(jnp.einsum("cii->ci", hcc), 1e-6))[
            :, :, None
        ] * eye6[None]
        hpp_d = hpp + (lam * jnp.maximum(jnp.einsum("pii->pi", hpp), 1e-6))[
            :, :, None
        ] * eye3[None]
        hpp_inv = _inv3_lanes(hpp_d + 1e-9 * eye3[None])  # [P,3,3]

        # Schur RHS: b̃_c = b_c − Hcp · Hpp⁻¹ · b_p (obs-wise).
        hpp_inv_bp = jnp.einsum("pjk,pk->pj", hpp_inv, bp)  # [P,3]

        def hcp_apply(vp):  # [P,3] → [C,6]: Σ_o w Jcᵀ Jp v_p(o)
            contrib = jnp.einsum(
                "oij,oik,ok->oj", jc * wj, jp, gather_rows(vp, obs_point, idx_sorted=True)
            )
            return jax.ops.segment_sum(contrib, obs_cam, n_cam)

        def hpc_apply(vc):  # [C,6] → [P,3]
            contrib = jnp.einsum(
                "oik,oij,oj->ok", jp * wj, jc, gather_rows(vc, obs_cam)
            )
            return jax.ops.segment_sum(contrib, obs_point, n_pt,
                                       indices_are_sorted=True)

        rhs = bc - hcp_apply(hpp_inv_bp)  # [C,6]

        def s_apply(vc):  # S·v matrix-free
            hcc_v = jnp.einsum("cjk,ck->cj", hcc_d, vc)
            tmp = hpc_apply(vc)  # [P,3]
            tmp = jnp.einsum("pjk,pk->pj", hpp_inv, tmp)
            return hcc_v - hcp_apply(tmp)

        # Block-Jacobi preconditioner.
        m_inv = _inv6_spd_lanes(hcc_d + 1e-9 * eye6[None])  # [C,6,6]

        def prec(vc):
            return jnp.einsum("cjk,ck->cj", m_inv, vc)

        # PCG on S x = rhs.
        x = jnp.zeros_like(rhs)
        rvec = rhs - s_apply(x)
        z = prec(rvec)
        p = z
        rz = jnp.sum(rvec * z)

        def cg_body(carry, _):
            x, rvec, p, rz = carry
            sp = s_apply(p)
            denom = jnp.sum(p * sp)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            x = x + alpha * p
            rvec = rvec - alpha * sp
            z = prec(rvec)
            rz_new = jnp.sum(rvec * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
            p = z + beta * p
            return (x, rvec, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(
            cg_body, (x, rvec, p, rz), None, length=cg_iters
        )
        dcam = -x * free_cam  # GN solves J d = −r with our sign convention
        # Back-substitute points: d_p = −Hpp⁻¹ (b_p + Hpc d_c).
        dpt = -jnp.einsum("pjk,pk->pj", hpp_inv, bp + hpc_apply(dcam))
        if not optimize_points:
            dpt = dpt * 0.0
        # Predicted reduction of the quadratic model for the damped solve
        # (H + λD) d = −g:  pred = ½(λ dᵀDd − gᵀd) — both terms ≥ 0 for a
        # descent step (Madsen-Nielsen eq. 3.21 adapted to D = diag(H)).
        d_c = jnp.maximum(jnp.einsum("cii->ci", hcc), 1e-6)
        d_p = jnp.maximum(jnp.einsum("pii->pi", hpp), 1e-6)
        dtd = jnp.sum(dcam * d_c * dcam) + jnp.sum(dpt * d_p * dpt)
        gtd = jnp.sum(dcam * bc) + jnp.sum(dpt * bp)
        pred = 0.5 * (lam * dtd - gtd)
        return dcam, dpt, pred

    def apply_update(rot0, tvecs, points, dcam, dpt):
        rot_new = jax.vmap(lambda d, r: _axis_angle_to_rotmat(d) @ r)(
            dcam[:, :3], rot0
        )
        return rot_new, tvecs + dcam[:, 3:], points + dpt

    rot0, tvecs, points = unpack(problem.qvecs, problem.tvecs, problem.points)
    lin0, cost0 = linearize(rot0, tvecs, points)

    def lm_body(carry, _):
        rot0, tvecs, points, lam, nu, cost, lin = carry
        dcam, dpt, pred = solve(lin, lam)
        rot_n, tvec_n, pts_n = apply_update(rot0, tvecs, points, dcam, dpt)
        lin_n, new_cost = linearize(rot_n, tvec_n, pts_n)
        finite = (
            jnp.isfinite(new_cost)
            & jnp.all(jnp.isfinite(rot_n))
            & jnp.all(jnp.isfinite(pts_n))
        )
        accept = finite & (new_cost < cost)
        # Gain ratio: actual / model-predicted reduction. On a rejected
        # step rho only feeds the (discarded) accept branch of lam.
        rho = (cost - new_cost) / jnp.maximum(pred, 1e-12)
        sel = lambda a, b: jnp.where(accept, a, b)
        rot0 = sel(rot_n, rot0)
        tvecs = sel(tvec_n, tvecs)
        points = sel(pts_n, points)
        cost = sel(new_cost, cost)
        lin = jax.tree_util.tree_map(sel, lin_n, lin)
        # Madsen-Nielsen gain-ratio schedule (Ceres trust-region
        # semantics): strong agreement with the model (rho→1) cuts λ by
        # up to 3×; marginal agreement barely changes it; each rejection
        # doubles the growth factor ν.
        lam_acc = lam * jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
        )
        lam = jnp.where(
            accept,
            jnp.clip(lam_acc, 1e-10, 1e8),
            jnp.minimum(lam * nu, 1e8),
        )
        nu = jnp.where(accept, 2.0, jnp.minimum(nu * 2.0, 64.0))
        return (rot0, tvecs, points, lam, nu, cost, lin), cost

    (rot0, tvecs, points, _, _, cost, _), _ = jax.lax.scan(
        lm_body,
        (rot0, tvecs, points, jnp.float32(init_lambda), jnp.float32(2.0),
         cost0, lin0),
        None,
        length=lm_iters,
    )
    qvecs = rotmat_to_qvec(rot0)
    return BAResult(
        qvecs=qvecs,
        tvecs=tvecs,
        points=points,
        initial_cost=cost0,
        final_cost=cost,
    )
