"""Cluster-level statistical parity: the LocalizationEngine vs a
cv2-based oracle pipeline on the SAME synthetic queries.

SURVEY §7.4(2): recall depends on RANSAC behaviour — validate
statistically, not bit-exactly. test_pnp_parity.py covers the bare
solver; this covers the full per-query path the reference runs in
``pose_from_cluster_with_matcher`` (``it_loc/localize_cv2.py:652``):
matching → 2D-3D assembly with track-length filter + dedup →
PnP-RANSAC. The oracle replays it with numpy mutual-NN and
cv2.solvePnPRansac, across noise/outlier regimes; inlier counts and
pose-error distributions must stay within bounds of each other.
"""

import numpy as np
import cv2
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.geometry.np_pose import pose_error
from sfd2_tpu.io.feature_store import FeatureStore
from sfd2_tpu.localization.engine import LocalizationEngine, LocalizerConfig
from sfd2_tpu.utils.synth import build_corridor_scene

_K = 512


def _oracle_localize(scene, fs, qname, near, thresh=8.0):
    """numpy mutual-NN + track-length-3 filter + (qid, p3d) dedup +
    cv2.solvePnPRansac — the reference pipeline's host twin."""
    mi = scene.map_index
    cam8 = np.asarray(canonicalize_params("PINHOLE", scene.cam_params))
    kpq, qd, _, qv, _ = fs.read_padded(qname, _K, with_labels=True)
    q_idx_all, p_rows_all = [], []
    for iid in near:
        name = mi.images[iid].name
        kp, dd, _, dv, _ = fs.read_padded(name, _K, with_labels=True)
        prow_full = mi.p3d_rows_per_image[mi.image_row[iid]]
        prow = np.full(_K, -1, np.int64)
        n = min(len(prow_full), _K)
        prow[:n] = prow_full[:n]
        valid3d = dv & (prow >= 0)
        sim = qd @ dd.T
        sim[~qv] = -1e9
        sim[:, ~valid3d] = -1e9
        nn12 = sim.argmax(1)
        nn21 = sim.argmax(0)
        mutual = np.arange(_K) == nn21[nn12]
        ok = mutual & qv & (sim[np.arange(_K), nn12] > -1e8)
        qi = np.nonzero(ok)[0]
        rows = prow[nn12[qi]]
        keep = (rows >= 0) & (mi.track_len[rows] >= 3)
        q_idx_all.append(qi[keep])
        p_rows_all.append(rows[keep])
    qc = np.concatenate(q_idx_all)
    pc = np.concatenate(p_rows_all)
    keys = qc * (mi.incidence.shape[1] + 1) + pc
    _, first = np.unique(keys, return_index=True)
    qc, pc = qc[np.sort(first)], pc[np.sort(first)]
    if len(qc) < 8:
        return None
    pts3d = mi.point_xyz[pc]
    pix = kpq[qc].astype(np.float64) + 0.5
    K = np.array([[cam8[0], 0, cam8[2]], [0, cam8[1], cam8[3]], [0, 0, 1]])
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        pts3d, pix.reshape(-1, 1, 2), K, np.asarray(cam8[4:8], np.float64),
        reprojectionError=thresh, iterationsCount=2000, confidence=0.9999,
        flags=cv2.SOLVEPNP_EPNP,
    )
    if not ok or inl is None:
        return None
    q = Rotation.from_matrix(cv2.Rodrigues(rvec)[0]).as_quat()[[3, 0, 1, 2]]
    return q, tvec.reshape(3), len(inl)


@pytest.mark.slow
@pytest.mark.parametrize("noise,outliers", [(0.3, 0.0), (1.0, 0.2), (1.5, 0.4)])
def test_engine_matches_cv2_oracle_distribution(tmp_path, noise, outliers):
    scene = build_corridor_scene(
        tmp_path / f"f_{noise}_{outliers}.h5", n_images=40, n_queries=8,
        n_points=1800, kp_per_image=450, kp_per_query=400, retrieval_k=8,
        noise_px=noise, outlier_frac=outliers, seed=int(noise * 10 + outliers * 100),
    )
    cfg = LocalizerConfig(
        ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
        covisibility_frame=8, iters=2, radius=12.0, obs_thresh=3,
        max_keypoints=_K, num_hypotheses=512,
    )
    eng_err, ora_err = [], []
    eng_inl, ora_inl = [], []
    with FeatureStore(scene.feature_path, "r") as fs:
        eng = LocalizationEngine(scene.map_index, fs, cfg)
        for qname, q_gt, t_gt, near in scene.queries:
            res = eng.localize(qname, scene.qinfo, [[i] for i in near])
            if res.source in ("accepted", "best_fallback"):
                qe, te = pose_error(res.qvec, res.tvec, q_gt, t_gt)
                eng_err.append((qe, te))
                eng_inl.append(max(res.num_inliers, 0))
            oracle = _oracle_localize(scene, fs, qname, near, thresh=8.0)
            if oracle is not None:
                qe, te = pose_error(oracle[0], oracle[1], q_gt, t_gt)
                ora_err.append((qe, te))
                ora_inl.append(oracle[2])

    # The engine must localize at least as reliably as the oracle.
    assert len(eng_err) >= len(ora_err) - 1, (len(eng_err), len(ora_err))
    assert len(eng_err) >= 6
    med = lambda v: float(np.median(v)) if len(v) else float("inf")
    eng_q, eng_t = med([e[0] for e in eng_err]), med([e[1] for e in eng_err])
    ora_q, ora_t = med([e[0] for e in ora_err]), med([e[1] for e in ora_err])
    # Median pose errors within oracle × 2 + an absolute floor (both
    # pipelines bottom out at the keypoint-noise floor).
    assert eng_q <= max(2.0 * ora_q, 0.15), (eng_q, ora_q)
    assert eng_t <= max(2.0 * ora_t, 0.05), (eng_t, ora_t)
    # Inlier support within a factor 2 of the oracle's (the engine's
    # covis refinement can ADD inliers; a large deficit would flag a
    # matching/assembly bug).
    assert med(eng_inl) >= 0.5 * med(ora_inl), (med(eng_inl), med(ora_inl))
