"""Statistical parity of the batched LO-RANSAC PnP vs OpenCV's
solvePnPRansac (the in-sandbox stand-in oracle for pycolmap's
LO-RANSAC, ``it_loc/localize_cv2.py:731``; SURVEY §7.4(2) asks for
distributional parity — inlier counts and pose-error distributions —
not bit-exactness).

Grid of noise/outlier regimes × seeds; per regime we compare success
rates, median inlier counts, and median rotation/translation errors
between `pnp_ransac` (hypotheses-as-lanes, device) and cv2 (sequential
host RANSAC).
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from sfd2_tpu.geometry.pose import pose_error
from sfd2_tpu.localization.ransac import pnp_ransac
from tests.test_pnp import synth_scene

_N = 200
_THRESH = 12.0
_HYP = 512


def _cv2_pnp(pw, xy, cam8, thresh):
    K = np.array(
        [[cam8[0], 0, cam8[2]], [0, cam8[1], cam8[3]], [0, 0, 1]], np.float64
    )
    dist = np.array(cam8[4:8], np.float64)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        pw.astype(np.float64),
        xy.astype(np.float64).reshape(-1, 1, 2),
        K,
        dist,
        reprojectionError=thresh,
        iterationsCount=2000,
        confidence=0.9999,
        flags=cv2.SOLVEPNP_EPNP,
    )
    if not ok or inl is None:
        return None
    rot, _ = cv2.Rodrigues(rvec)
    # rotmat → qvec (w, x, y, z)
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(rot).as_quat()[[3, 0, 1, 2]]
    return q.astype(np.float32), tvec.reshape(3).astype(np.float32), len(inl)


def _run_regime(noise, outlier_frac, n_seeds=5):
    ours, theirs = [], []
    for seed in range(n_seeds):
        rng = np.random.default_rng(1000 * seed + 7)
        pw, xy, q_gt, t_gt, cam = synth_scene(
            rng, n=_N, noise=noise, outlier_frac=outlier_frac, model="PINHOLE"
        )
        valid = np.ones(_N, bool)
        res = pnp_ransac(
            jnp.asarray(xy), jnp.asarray(pw), jnp.asarray(cam),
            jnp.asarray(valid), threshold=_THRESH, num_hypotheses=_HYP,
        )
        if bool(res.success):
            qe, te = pose_error(
                res.qvec, res.tvec, jnp.asarray(q_gt), jnp.asarray(t_gt)
            )
            ours.append((int(res.num_inliers), float(qe), float(te)))
        cv = _cv2_pnp(pw, xy, cam, _THRESH)
        if cv is not None:
            qe, te = pose_error(
                jnp.asarray(cv[0]), jnp.asarray(cv[1]),
                jnp.asarray(q_gt), jnp.asarray(t_gt),
            )
            theirs.append((cv[2], float(qe), float(te)))
    return ours, theirs


@pytest.mark.parametrize(
    "noise,outlier_frac",
    [(0.5, 0.0), (0.5, 0.3), (1.5, 0.3), (1.5, 0.5)],
)
def test_pnp_parity_regime(noise, outlier_frac):
    ours, cv = _run_regime(noise, outlier_frac)
    n_seeds = 5
    # Success rate: we must succeed at least as often as cv2 − 1 trial.
    assert len(ours) >= min(len(cv), n_seeds) - 1
    assert len(ours) >= 4  # these regimes are all solvable
    o_inl = np.median([o[0] for o in ours])
    o_qerr = np.median([o[1] for o in ours])
    o_terr = np.median([o[2] for o in ours])
    # Absolute quality bounds (deg / world units ~ meters at scene scale).
    assert o_qerr < 1.0 and o_terr < 0.15
    if cv:
        c_inl = np.median([c[0] for c in cv])
        c_qerr = np.median([c[1] for c in cv])
        c_terr = np.median([c[2] for c in cv])
        # Inlier support within 10% of the oracle's.
        assert o_inl >= 0.9 * c_inl
        # Pose errors within 2× the oracle's median (or already tiny).
        assert o_qerr <= max(2.0 * c_qerr, 0.2)
        assert o_terr <= max(2.0 * c_terr, 0.03)


def test_pnp_parity_distorted():
    """SIMPLE_RADIAL-style intrinsics (nonzero k1) against cv2."""
    ours, cv = _run_regime_distorted()
    assert len(ours) >= 4
    o_qerr = np.median([o[1] for o in ours])
    o_terr = np.median([o[2] for o in ours])
    assert o_qerr < 1.0 and o_terr < 0.15
    if cv:
        assert np.median([o[0] for o in ours]) >= 0.9 * np.median(
            [c[0] for c in cv]
        )


def _run_regime_distorted(n_seeds=5):
    ours, theirs = [], []
    for seed in range(n_seeds):
        rng = np.random.default_rng(99 * seed + 3)
        pw, xy, q_gt, t_gt, cam = synth_scene(
            rng, n=_N, noise=0.5, outlier_frac=0.2, model="SIMPLE_RADIAL"
        )
        valid = np.ones(_N, bool)
        res = pnp_ransac(
            jnp.asarray(xy), jnp.asarray(pw), jnp.asarray(cam),
            jnp.asarray(valid), threshold=_THRESH, num_hypotheses=_HYP,
        )
        if bool(res.success):
            qe, te = pose_error(
                res.qvec, res.tvec, jnp.asarray(q_gt), jnp.asarray(t_gt)
            )
            ours.append((int(res.num_inliers), float(qe), float(te)))
        cv_res = _cv2_pnp(pw, xy, cam, _THRESH)
        if cv_res is not None:
            qe, te = pose_error(
                jnp.asarray(cv_res[0]), jnp.asarray(cv_res[1]),
                jnp.asarray(q_gt), jnp.asarray(t_gt),
            )
            theirs.append((cv_res[2], float(qe), float(te)))
    return ours, theirs
