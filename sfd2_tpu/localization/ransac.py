"""Batched LO-RANSAC PnP on device (hypotheses as a lane dimension).

Capability parity: ``pycolmap.absolute_pose_estimation`` — P3P/LO-RANSAC
with a pixel reprojection threshold, returning pose + inlier set + count
(``it_loc/localize_cv2.py:731``). TPU-native redesign per SURVEY §7.1:
instead of a sequential adaptive C++ loop, H hypotheses are drawn and
solved *simultaneously* (structure-of-arrays minimal DLT,
`pnp_dlt_fast_lanes`), all H×N reprojection
errors are scored in one fused program, the best hypothesis wins, and a
local-optimisation step (least-squares DLT on its inliers + masked LM)
recovers the accuracy a sequential LO-RANSAC gets from its inner loop.

Everything is statically shaped: correspondences arrive padded [N] with a
validity mask; sampling uses stateless `jax.random`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfd2_tpu.geometry.cameras import (
    project_points,
    unproject_normalized,
)
from sfd2_tpu.localization.pnp import (
    pnp_dlt,
    pnp_dlt_fast_lanes,
    refine_pose_lm,
)

_MIN_SAMPLE = 6  # DLT minimal set


class PnPResult(NamedTuple):
    qvec: jax.Array  # [4]
    tvec: jax.Array  # [3]
    num_inliers: jax.Array  # [] int32
    inliers: jax.Array  # [N] bool
    success: jax.Array  # [] bool


def _inlier_mask(qvec, tvec, points3d, points2d, cam_params, threshold, valid):
    proj, depth = project_points(points3d, qvec, tvec, cam_params)
    err = jnp.linalg.norm(proj - points2d, axis=-1)
    return (err <= threshold) & (depth > 0) & valid


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "lo_iterations", "min_inliers")
)
def pnp_ransac(
    points2d: jax.Array,
    points3d: jax.Array,
    cam_params: jax.Array,
    valid: jax.Array,
    threshold: float | jax.Array = 12.0,
    key: jax.Array | None = None,
    num_hypotheses: int = 1024,
    lo_iterations: int = 2,
    min_inliers: int = 6,
) -> PnPResult:
    """Estimate a world→cam pose from padded 2D-3D matches.

    Args:
      points2d: [N, 2] pixel observations.
      points3d: [N, 3] world points.
      cam_params: [8] canonical intrinsics.
      valid: [N] bool mask of real correspondences.
      threshold: inlier reprojection threshold (px) — the localizer's
        ransac_thresh knob (15 Aachen / 12 RobotCar, SURVEY §2.10).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = points2d.shape[0]
    fvalid = valid.astype(points2d.dtype)

    # Undistorted normalised coordinates for the DLT.
    pts_norm = unproject_normalized(points2d, cam_params)

    # --- hypothesis generation -----------------------------------------
    # Sample minimal sets ∝ validity (Gumbel top-k over the mask).
    def sample_one(k):
        g = jax.random.gumbel(k, (n,)) + jnp.log(fvalid + 1e-30)
        _, idx = jax.lax.top_k(g, _MIN_SAMPLE)
        return idx

    keys = jax.random.split(key, num_hypotheses)
    sample_idx = jax.vmap(sample_one)(keys)  # [H, 6]

    # Fast direct minimal solver (Cholesky inverse iteration + polar
    # Newton) in structure-of-arrays form — hypothesis lanes don't need
    # SVD-grade accuracy; the LO refits below use the careful SVD path.
    h_q, h_t = pnp_dlt_fast_lanes(
        points3d[sample_idx], pts_norm[sample_idx]
    )  # [H,4], [H,3]

    # --- scoring --------------------------------------------------------
    def score_one(q, t):
        m = _inlier_mask(q, t, points3d, points2d, cam_params, threshold, valid)
        return jnp.sum(m)

    counts = jax.vmap(score_one)(h_q, h_t)  # [H]
    # Guard NaN poses (degenerate samples): zero their score.
    finite = jnp.all(jnp.isfinite(h_q), -1) & jnp.all(jnp.isfinite(h_t), -1)
    counts = jnp.where(finite, counts, 0)
    best = jnp.argmax(counts)
    q, t = h_q[best], h_t[best]

    # --- local optimisation (static unrolled rounds) --------------------
    for _ in range(lo_iterations):
        inl = _inlier_mask(q, t, points3d, points2d, cam_params, threshold, valid)
        w = inl.astype(points2d.dtype)
        enough = jnp.sum(w) >= _MIN_SAMPLE
        # Least-squares DLT re-fit on inliers, then masked LM polish.
        q_ls, t_ls = pnp_dlt(points3d, pts_norm, weights=w)
        ok_ls = jnp.all(jnp.isfinite(q_ls)) & jnp.all(jnp.isfinite(t_ls))
        cnt_ls = jnp.sum(
            _inlier_mask(q_ls, t_ls, points3d, points2d, cam_params, threshold, valid)
        )
        cnt_cur = jnp.sum(inl)
        take_ls = enough & ok_ls & (cnt_ls >= cnt_cur)
        q = jnp.where(take_ls, q_ls, q)
        t = jnp.where(take_ls, t_ls, t)
        inl = _inlier_mask(q, t, points3d, points2d, cam_params, threshold, valid)
        q_lm, t_lm = refine_pose_lm(
            q, t, points3d, points2d, cam_params, inl.astype(points2d.dtype)
        )
        ok_lm = jnp.all(jnp.isfinite(q_lm)) & jnp.all(jnp.isfinite(t_lm))
        cnt_lm = jnp.sum(
            _inlier_mask(q_lm, t_lm, points3d, points2d, cam_params, threshold, valid)
        )
        cnt_cur = jnp.sum(inl)
        take_lm = ok_lm & (cnt_lm >= cnt_cur)
        q = jnp.where(take_lm, q_lm, q)
        t = jnp.where(take_lm, t_lm, t)

    inliers = _inlier_mask(q, t, points3d, points2d, cam_params, threshold, valid)
    num = jnp.sum(inliers).astype(jnp.int32)
    success = (num >= min_inliers) & jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(t))
    return PnPResult(qvec=q, tvec=t, num_inliers=num, inliers=inliers, success=success)
