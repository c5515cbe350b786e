"""Incremental SfM: from-scratch reconstruction with known intrinsics.

Capability parity: ``hloc/reconstruction.py`` (the ``colmap mapper``
subprocess, ``:66-83``) — initialise from the best two-view pair,
register images by PnP, triangulate new tracks, run bundle adjustment,
and keep the largest connected model (``:91-98``).

TPU-native composition: every numeric stage is one of this framework's
batched device programs — F-RANSAC verification, E-decomposition
bootstrap, PnP-RANSAC registration, bucketed multi-view triangulation
and Schur-complement BA — with only the registration order / bookkeeping
on the host.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.geometry.cameras import Camera, canonicalize_params
from sfd2_tpu.geometry.np_pose import qvec_to_rotmat
from sfd2_tpu.geometry.rotations import rotmat_to_qvec
from sfd2_tpu.io.colmap_model import Image, Point3D
from sfd2_tpu.io.feature_store import FeatureStore, MatchStore
from sfd2_tpu.localization.ransac import pnp_ransac
from sfd2_tpu.sfm.ba import BAProblem, bundle_adjust
from sfd2_tpu.sfm.pipeline import TriangulationConfig, geometric_verification
from sfd2_tpu.sfm.stats import analyze_model
from sfd2_tpu.sfm.tracks import build_tracks
from sfd2_tpu.sfm.triangulation import triangulate_tracks
from sfd2_tpu.sfm.twoview import (
    decompose_essential,
    essential_from_fundamental,
    fit_fundamental,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ReconstructionConfig:
    tri: TriangulationConfig = dataclasses.field(default_factory=TriangulationConfig)
    pnp_threshold: float = 8.0
    min_reg_inliers: int = 12
    ba_every: int = 3  # run global BA every N registrations
    ba_lm_iters: int = 6
    max_track_length: int = 32


def _k_matrix(cam8: np.ndarray) -> np.ndarray:
    return np.array(
        [[cam8[0], 0, cam8[2]], [0, cam8[1], cam8[3]], [0, 0, 1.0]], np.float64
    )


def incremental_reconstruction(
    features: FeatureStore,
    matches: MatchStore,
    pairs: Sequence[Tuple[str, str]],
    cameras_by_name: Dict[str, Camera],
    cfg: ReconstructionConfig = ReconstructionConfig(),
):
    """Returns (cameras, images, points3d, stats) — a COLMAP-style model
    in the gauge of the initial pair (first camera at identity, unit
    baseline)."""
    names = sorted({n for p in pairs for n in p})
    name_id = {n: i + 1 for i, n in enumerate(names)}
    kps = {n: features.read(n).keypoints + 0.5 for n in names}
    cam8 = {
        n: canonicalize_params(
            cameras_by_name[n].model, cameras_by_name[n].params
        ).astype(np.float32)
        for n in names
    }

    verified = geometric_verification(features, matches, pairs, cfg.tri)
    if not verified:
        raise RuntimeError("no verified pairs")
    tracks = build_tracks(
        {name_id[n]: len(kps[n]) for n in names},
        [(name_id[a], name_id[b], m) for a, b, m in verified],
        min_track_length=2,
    )
    # Observation lookup: (image_id, kp_idx) → track index.
    obs_to_track: Dict[Tuple[int, int], int] = {}
    for ti, tr in enumerate(tracks):
        for iid, k in tr:
            obs_to_track[(iid, k)] = ti

    # ---- bootstrap from the best verified pair -------------------------
    verified.sort(key=lambda v: -len(v[2]))
    init = None
    for n0, n1, m in verified:
        if len(m) < 30:
            break
        xy1 = kps[n0][m[:, 0]]
        xy2 = kps[n1][m[:, 1]]
        f = fit_fundamental(jnp.asarray(xy1, jnp.float32), jnp.asarray(xy2, jnp.float32))
        k1 = _k_matrix(cam8[n0])
        k2 = _k_matrix(cam8[n1])
        e = essential_from_fundamental(
            f, jnp.asarray(k1, jnp.float32), jnp.asarray(k2, jnp.float32)
        )
        nrm1 = (np.concatenate([xy1, np.ones((len(xy1), 1))], 1) @ np.linalg.inv(k1).T)[:, :2]
        nrm2 = (np.concatenate([xy2, np.ones((len(xy2), 1))], 1) @ np.linalg.inv(k2).T)[:, :2]
        rot, t, n_front = decompose_essential(
            e, jnp.asarray(nrm1, jnp.float32), jnp.asarray(nrm2, jnp.float32)
        )
        if float(n_front) > 0.8 * len(m):
            init = (n0, n1, np.asarray(rot, np.float64), np.asarray(t, np.float64))
            break
    if init is None:
        raise RuntimeError("no valid initial pair")
    n0, n1, rot01, t01 = init
    logger.info("init pair: %s ↔ %s", n0, n1)

    # Registered poses (world = cam of n0).
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]] = {
        name_id[n0]: (np.array([1.0, 0, 0, 0]), np.zeros(3)),
        name_id[n1]: (np.asarray(rotmat_to_qvec(jnp.asarray(rot01, jnp.float32))), t01),
    }
    point_xyz: Dict[int, np.ndarray] = {}  # track idx → xyz
    id_to_name = {v: k for k, v in name_id.items()}

    def triangulate_ready_tracks():
        """(Re)triangulate all tracks with ≥2 registered observations."""
        todo = []
        for ti, tr in enumerate(tracks):
            n_reg = sum(1 for iid, _ in tr if iid in poses)
            if n_reg >= 2:
                todo.append(ti)
        if not todo:
            return
        t_max = cfg.max_track_length
        p = len(todo)
        obs = np.zeros((p, t_max, 2), np.float32)
        mask = np.zeros((p, t_max), bool)
        qv = np.zeros((p, t_max, 4), np.float32)
        qv[..., 0] = 1
        tv = np.zeros((p, t_max, 3), np.float32)
        cm = np.ones((p, t_max, 8), np.float32)
        for pi, ti in enumerate(todo):
            oi = 0
            for iid, k in tracks[ti]:
                if iid not in poses or oi >= t_max:
                    continue
                nm = id_to_name[iid]
                obs[pi, oi] = kps[nm][k]
                mask[pi, oi] = True
                qv[pi, oi] = poses[iid][0]
                tv[pi, oi] = poses[iid][1]
                cm[pi, oi] = cam8[nm]
                oi += 1
        res = triangulate_tracks(
            jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(qv),
            jnp.asarray(tv), jnp.asarray(cm),
            max_reproj_error=cfg.tri.max_reproj_error,
            min_tri_angle_deg=cfg.tri.min_tri_angle_deg,
        )
        val = np.asarray(res.valid)
        xyz = np.asarray(res.xyz)
        for pi, ti in enumerate(todo):
            if val[pi]:
                point_xyz[ti] = xyz[pi]
            else:
                point_xyz.pop(ti, None)

    def run_ba():
        reg = sorted(poses.keys())
        cam_row = {iid: i for i, iid in enumerate(reg)}
        pt_ids = sorted(point_xyz.keys())
        pt_row = {ti: i for i, ti in enumerate(pt_ids)}
        if len(pt_ids) < 8:
            return
        o_xy, o_c, o_p = [], [], []
        for ti in pt_ids:
            for iid, k in tracks[ti]:
                if iid in poses:
                    o_xy.append(kps[id_to_name[iid]][k])
                    o_c.append(cam_row[iid])
                    o_p.append(pt_row[ti])
        fixed = np.zeros(len(reg), bool)
        fixed[0] = True
        if len(reg) > 1:
            fixed[1] = True  # gauge: fix scale via second anchor
        problem = BAProblem(
            obs_xy=jnp.asarray(np.array(o_xy, np.float32)),
            obs_cam=jnp.asarray(np.array(o_c, np.int32)),
            obs_point=jnp.asarray(np.array(o_p, np.int32)),
            obs_w=jnp.ones(len(o_xy), jnp.float32),
            qvecs=jnp.asarray(np.array([poses[i][0] for i in reg], np.float32)),
            tvecs=jnp.asarray(np.array([poses[i][1] for i in reg], np.float32)),
            cam_params=jnp.asarray(
                np.array([cam8[id_to_name[i]] for i in reg], np.float32)
            ),
            points=jnp.asarray(np.array([point_xyz[t] for t in pt_ids], np.float32)),
            fixed_cams=jnp.asarray(fixed),
        )
        res = bundle_adjust(problem, lm_iters=cfg.ba_lm_iters, cg_iters=15)
        q_out = np.asarray(res.qvecs, np.float64)
        t_out = np.asarray(res.tvecs, np.float64)
        p_out = np.asarray(res.points, np.float64)
        for i, iid in enumerate(reg):
            poses[iid] = (q_out[i], t_out[i])
        for i, ti in enumerate(pt_ids):
            point_xyz[ti] = p_out[i]

    triangulate_ready_tracks()
    run_ba()

    # ---- incremental registration --------------------------------------
    n_since_ba = 0
    while True:
        # Next image = most visible triangulated points.
        best_name, best_obs = None, []
        for nm in names:
            iid = name_id[nm]
            if iid in poses:
                continue
            obs2d3d = [
                (k, obs_to_track[(iid, k)])
                for k in range(len(kps[nm]))
                if (iid, k) in obs_to_track and obs_to_track[(iid, k)] in point_xyz
            ]
            if len(obs2d3d) > len(best_obs):
                best_name, best_obs = nm, obs2d3d
        if best_name is None or len(best_obs) < cfg.min_reg_inliers:
            break
        xy = np.array([kps[best_name][k] for k, _ in best_obs], np.float32)
        p3 = np.array([point_xyz[t] for _, t in best_obs], np.float32)
        n = len(xy)
        n_pad = max(64, 1 << (n - 1).bit_length())
        xy_p = np.zeros((n_pad, 2), np.float32)
        p3_p = np.zeros((n_pad, 3), np.float32)
        va = np.zeros(n_pad, bool)
        xy_p[:n], p3_p[:n], va[:n] = xy, p3, True
        res = pnp_ransac(
            jnp.asarray(xy_p), jnp.asarray(p3_p),
            jnp.asarray(cam8[best_name]), jnp.asarray(va),
            threshold=cfg.pnp_threshold, key=jax.random.PRNGKey(len(poses)),
        )
        if not bool(res.success) or int(res.num_inliers) < cfg.min_reg_inliers:
            logger.info("registration failed for %s", best_name)
            names = [nm for nm in names if nm != best_name]  # skip permanently
            continue
        poses[name_id[best_name]] = (
            np.asarray(res.qvec, np.float64),
            np.asarray(res.tvec, np.float64),
        )
        logger.info(
            "registered %s (%d inliers)", best_name, int(res.num_inliers)
        )
        triangulate_ready_tracks()
        n_since_ba += 1
        if n_since_ba >= cfg.ba_every:
            run_ba()
            n_since_ba = 0

    run_ba()
    triangulate_ready_tracks()

    # ---- assemble model -------------------------------------------------
    points3d: Dict[int, Point3D] = {}
    img_p3d = {iid: np.full(len(kps[id_to_name[iid]]), -1, np.int64) for iid in poses}
    pid = 1
    for ti, xyz in point_xyz.items():
        obs_list = [(iid, k) for iid, k in tracks[ti] if iid in poses]
        if len(obs_list) < 2:
            continue
        points3d[pid] = Point3D(
            pid, np.asarray(xyz, np.float64), np.zeros(3, np.uint8), 0.0,
            np.array([o[0] for o in obs_list], np.int32),
            np.array([o[1] for o in obs_list], np.int32),
        )
        for iid, k in obs_list:
            img_p3d[iid][k] = pid
        pid += 1

    cameras = {}
    images = {}
    for iid, (q, t) in poses.items():
        nm = id_to_name[iid]
        cam = cameras_by_name[nm]
        cameras[cam.camera_id] = cam
        images[iid] = Image(iid, q, t, cam.camera_id, nm, kps[nm], img_p3d[iid])

    stats = analyze_model(cameras, images, points3d)
    return cameras, images, points3d, stats
