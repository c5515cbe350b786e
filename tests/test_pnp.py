import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import canonicalize_params, project_points
from sfd2_tpu.geometry.pose import pose_error
from sfd2_tpu.localization.pnp import pnp_dlt, refine_pose_lm
from sfd2_tpu.localization.ransac import pnp_ransac


def synth_scene(rng, n=200, noise=0.0, outlier_frac=0.0, model="SIMPLE_RADIAL"):
    if model == "SIMPLE_RADIAL":
        cam = canonicalize_params(model, [600.0, 320.0, 240.0, -0.05])
    else:
        cam = canonicalize_params("PINHOLE", [600.0, 600.0, 320.0, 240.0])
    rot = Rotation.from_rotvec(rng.normal(size=3) * 0.3)
    q = rot.as_quat()[[3, 0, 1, 2]].astype(np.float32)
    t = (rng.normal(size=3) * 0.5).astype(np.float32)
    # Points in front of the camera: generate in cam frame, move to world.
    pc = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(3, 10, n),
        ],
        axis=1,
    ).astype(np.float32)
    pw = (pc - t) @ rot.as_matrix()  # R^T (pc - t)
    xy, depth = project_points(jnp.array(pw), jnp.array(q), jnp.array(t), jnp.array(cam))
    xy = np.array(xy)
    assert np.all(np.array(depth) > 0)
    if noise:
        xy += rng.normal(size=xy.shape) * noise
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        xy[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return pw.astype(np.float32), xy.astype(np.float32), q, t, cam.astype(np.float32)


def test_pnp_dlt_exact(rng):
    pw, xy, q, t, cam = synth_scene(rng, n=60, model="PINHOLE")
    from sfd2_tpu.geometry.cameras import unproject_normalized

    pts_norm = unproject_normalized(jnp.array(xy), jnp.array(cam))
    q_est, t_est = pnp_dlt(jnp.array(pw), pts_norm)
    qe, te = pose_error(q_est, t_est, jnp.array(q), jnp.array(t))
    assert float(qe) < 0.1 and float(te) < 0.02


def test_refine_pose_lm_recovers_from_perturbation(rng):
    pw, xy, q, t, cam = synth_scene(rng, n=100)
    # Perturb the pose.
    dq = Rotation.from_rotvec([0.02, -0.015, 0.01])
    q0 = (Rotation.from_quat(q[[1, 2, 3, 0]]) * dq).as_quat()[[3, 0, 1, 2]]
    t0 = t + np.array([0.1, -0.05, 0.08], np.float32)
    w = np.ones(len(pw), np.float32)
    q_r, t_r = refine_pose_lm(
        jnp.array(q0, jnp.float32), jnp.array(t0), jnp.array(pw), jnp.array(xy),
        jnp.array(cam), jnp.array(w),
    )
    qe, te = pose_error(q_r, t_r, jnp.array(q), jnp.array(t))
    assert float(qe) < 0.05 and float(te) < 0.01


def test_pnp_ransac_with_outliers(rng):
    pw, xy, q, t, cam = synth_scene(rng, n=256, noise=0.5, outlier_frac=0.4)
    valid = np.ones(len(pw), bool)
    res = pnp_ransac(
        jnp.array(xy), jnp.array(pw), jnp.array(cam), jnp.array(valid),
        threshold=6.0, key=jax.random.PRNGKey(1),
    )
    assert bool(res.success)
    qe, te = pose_error(res.qvec, res.tvec, jnp.array(q), jnp.array(t))
    assert float(qe) < 0.3, float(qe)
    assert float(te) < 0.05, float(te)
    # Roughly the right inlier count (60% of 256 ≈ 154).
    assert int(res.num_inliers) > 120


def test_pnp_ransac_padding_invariance(rng):
    pw, xy, q, t, cam = synth_scene(rng, n=128, noise=0.3, outlier_frac=0.2)
    pad = 64
    pw_p = np.concatenate([pw, np.zeros((pad, 3), np.float32)])
    xy_p = np.concatenate([xy, np.full((pad, 2), 1e6, np.float32)])
    valid = np.concatenate([np.ones(128, bool), np.zeros(pad, bool)])
    res = pnp_ransac(
        jnp.array(xy_p), jnp.array(pw_p), jnp.array(cam), jnp.array(valid),
        threshold=6.0, key=jax.random.PRNGKey(2),
    )
    assert bool(res.success)
    assert not bool(np.any(np.array(res.inliers)[128:]))
    qe, te = pose_error(res.qvec, res.tvec, jnp.array(q), jnp.array(t))
    assert float(qe) < 0.3 and float(te) < 0.05


def test_pnp_ransac_fails_gracefully_on_garbage(rng):
    n = 64
    xy = rng.uniform(0, 640, size=(n, 2)).astype(np.float32)
    pw = rng.normal(size=(n, 3)).astype(np.float32) * 10
    cam = canonicalize_params("PINHOLE", [600.0, 600.0, 320.0, 240.0]).astype(np.float32)
    res = pnp_ransac(
        jnp.array(xy), jnp.array(pw), jnp.array(cam),
        jnp.array(np.ones(n, bool)), threshold=2.0, key=jax.random.PRNGKey(3),
    )
    # Must not produce NaNs, and should find only a tiny consensus.
    assert np.all(np.isfinite(np.array(res.qvec)))
    assert int(res.num_inliers) < 30


def test_pnp_dlt_fast_matches_svd_path():
    """The hypothesis-lane solver (Cholesky inverse subspace iteration +
    polar Newton) must agree with the SVD DLT on WELL-CONDITIONED minimal
    samples. It forms AᵀA, which squares the condition number, so on
    near-degenerate samples (σ₂/σ_max ≪ 1) a few degrees of drift is
    inherent — those hypotheses lose the inlier vote anyway and RANSAC
    survivors are re-fit by the SVD path; the statistical gate is
    tests/test_pnp_parity.py."""
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.geometry.cameras import canonicalize_params, project_points
    from sfd2_tpu.geometry.cameras import unproject_normalized
    from sfd2_tpu.geometry.rotations import qvec_to_rotmat
    from sfd2_tpu.localization.pnp import (
        _dlt_rows, _hartley_normalize, pnp_dlt, pnp_dlt_fast,
    )

    cam8 = canonicalize_params("PINHOLE", [500.0, 500.0, 320.0, 240.0])
    rng = np.random.RandomState(3)
    checked = 0
    for trial in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        t = rng.randn(3) * 0.5 + np.array([0, 0, 1.0])
        pts = rng.uniform(-3, 3, (6, 3)) + np.array([0, 0, 10.0])
        xy, _ = project_points(jnp.asarray(pts), jnp.asarray(q), jnp.asarray(t),
                               jnp.asarray(cam8))
        pn = unproject_normalized(xy, jnp.asarray(cam8))
        q_s, t_s = pnp_dlt(jnp.asarray(pts, jnp.float32), pn)
        q_f, t_f = pnp_dlt_fast(jnp.asarray(pts, jnp.float32), pn)
        assert np.all(np.isfinite(np.asarray(q_f)))
        assert np.all(np.isfinite(np.asarray(t_f)))
        # Conditioning of the (normalised) DLT system in f64.
        w = jnp.ones((6,), jnp.float32)
        x3, x2, *_ = _hartley_normalize(jnp.asarray(pts, jnp.float32), pn, w)
        sv = np.linalg.svd(
            np.asarray(_dlt_rows(x3, x2, w), np.float64), compute_uv=False
        )
        if sv[-2] / sv[0] < 1e-2:  # near-degenerate sample: skip tight check
            continue
        checked += 1
        r_s = np.asarray(qvec_to_rotmat(q_s))
        r_f = np.asarray(qvec_to_rotmat(q_f))
        # Rotation agreement (angle of R_s R_fᵀ) below 0.2°.
        cos = (np.trace(r_s @ r_f.T) - 1) / 2
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang < 0.2, (trial, ang)
        np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_f),
                                   atol=2e-2, rtol=2e-2)
    assert checked >= 6  # the skip gate must not hollow out the test


def test_pnp_dlt_fast_lanes_matches_vmapped(rng):
    """The SoA hypothesis-lanes solver agrees with vmap(pnp_dlt_fast)."""
    import jax
    import jax.numpy as jnp
    from sfd2_tpu.localization.pnp import pnp_dlt_fast, pnp_dlt_fast_lanes

    h = 32
    p3 = rng.uniform([-4, -3, 6], [4, 3, 14], size=(h, 6, 3)).astype(np.float32)
    q = np.array([0.96, 0.1, -0.2, 0.15], np.float32)
    q /= np.linalg.norm(q)
    r = Rotation.from_quat(q[[1, 2, 3, 0]]).as_matrix().astype(np.float32)
    t = np.array([0.3, -0.2, 0.5], np.float32)
    cam = (p3 @ r.T) + t
    p2 = (cam[..., :2] / cam[..., 2:3]).astype(np.float32)

    ql, tl = pnp_dlt_fast_lanes(jnp.asarray(p3), jnp.asarray(p2))
    qv, tv = jax.vmap(pnp_dlt_fast)(jnp.asarray(p3), jnp.asarray(p2))
    ql, tl, qv, tv = map(np.asarray, (ql, tl, qv, tv))
    # quaternion sign is arbitrary
    sign = np.sign(np.sum(ql * qv, axis=1, keepdims=True))
    np.testing.assert_allclose(ql * sign, qv, atol=2e-3)
    np.testing.assert_allclose(tl, tv, atol=2e-2)
    # and both recover the ground truth
    sign_gt = np.sign(ql @ q)[:, None]
    np.testing.assert_allclose(ql * sign_gt, np.tile(q, (h, 1)), atol=2e-2)
