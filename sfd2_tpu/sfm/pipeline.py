"""Map building: features + matches + known poses → triangulated 3D model.

Capability parity: ``hloc/triangulation.py`` end to end —
``create_empty_model:18`` (keep cameras/poses, strip observations),
feature/match import (+0.5 px COLMAP origin shift, ``:64``),
``geometric_verification:114`` (→ batched F-RANSAC on device instead of
the colmap matches_importer subprocess), ``run_triangulation:129``
(→ track building + batched fixed-pose triangulation instead of the
colmap point_triangulator subprocess) and the model_analyzer stats file.

TPU-native layout: pairs are verified in device batches; tracks are
bucketed by length into a few padded [P, T] shapes so the whole map
triangulates in a handful of jitted launches.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.io.colmap_model import Image, Point3D, read_model, write_model
from sfd2_tpu.io.feature_store import FeatureStore, MatchStore
from sfd2_tpu.sfm.stats import analyze_model, format_stats
from sfd2_tpu.sfm.tracks import build_tracks
from sfd2_tpu.sfm.triangulation import triangulate_tracks
from sfd2_tpu.sfm.twoview import verify_fundamental_ransac


@dataclasses.dataclass
class TriangulationConfig:
    verify_threshold: float = 4.0  # colmap max_error default
    verify_min_inliers: int = 15
    verify_min_inlier_ratio: float = 0.1  # reference flag (triangulation.py:123)
    max_reproj_error: float = 4.0
    min_tri_angle_deg: float = 1.5
    min_track_length: int = 2
    max_track_length: int = 64  # longer tracks truncated (obs beyond dropped)
    verify_batch: int = 32


def _pad_pow2(n: int, lo: int = 64) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


def geometric_verification(
    features: FeatureStore,
    matches: MatchStore,
    pairs: Sequence[Tuple[str, str]],
    cfg: TriangulationConfig = TriangulationConfig(),
    max_matches: int = 1024,
) -> List[Tuple[str, str, np.ndarray]]:
    """Verify candidate pairs; returns (name0, name1, inlier kp-idx pairs).

    Pairs are grouped into fixed-size device batches (padded match arrays)
    — one vmapped F-RANSAC launch per group instead of one C++ subprocess
    for the whole dataset.
    """
    results: List[Tuple[str, str, np.ndarray]] = []
    feats_cache: Dict[str, np.ndarray] = {}

    def kpts(name):
        if name not in feats_cache:
            feats_cache[name] = features.read(name).keypoints
        return feats_cache[name]

    # Assemble per-pair padded correspondences.
    batch_xy1, batch_xy2, batch_valid, batch_meta = [], [], [], []

    def flush():
        if not batch_xy1:
            return
        xy1 = jnp.asarray(np.stack(batch_xy1))
        xy2 = jnp.asarray(np.stack(batch_xy2))
        val = jnp.asarray(np.stack(batch_valid))
        keys = jax.random.split(jax.random.PRNGKey(len(results)), xy1.shape[0])
        res = jax.vmap(
            lambda a, b, v, k: verify_fundamental_ransac(
                a, b, v, cfg.verify_threshold, k,
                min_inliers=cfg.verify_min_inliers,
                min_inlier_ratio=cfg.verify_min_inlier_ratio,
            )
        )(xy1, xy2, val, keys)
        ok = np.asarray(res.success)
        inl = np.asarray(res.inliers)
        for bi, (n0, n1, idx_pairs) in enumerate(batch_meta):
            if not ok[bi]:
                continue
            keep = inl[bi][: len(idx_pairs)]
            results.append((n0, n1, idx_pairs[keep]))
        batch_xy1.clear()
        batch_xy2.clear()
        batch_valid.clear()
        batch_meta.clear()

    for n0, n1 in pairs:
        m, _ = matches.read(n0, n1)
        src = np.nonzero(m >= 0)[0]
        if len(src) < 8:
            continue
        idx_pairs = np.stack([src, m[src]], axis=1)[:max_matches]
        k0, k1 = kpts(n0), kpts(n1)
        n = len(idx_pairs)
        xy1 = np.zeros((max_matches, 2), np.float32)
        xy2 = np.zeros((max_matches, 2), np.float32)
        val = np.zeros(max_matches, bool)
        xy1[:n] = k0[idx_pairs[:, 0]]
        xy2[:n] = k1[idx_pairs[:, 1]]
        val[:n] = True
        batch_xy1.append(xy1)
        batch_xy2.append(xy2)
        batch_valid.append(val)
        batch_meta.append((n0, n1, idx_pairs))
        if len(batch_xy1) >= cfg.verify_batch:
            flush()
    flush()
    return results


def triangulate_map(
    reference_model_dir,
    features: FeatureStore,
    matches: MatchStore,
    pairs: Sequence[Tuple[str, str]],
    output_dir=None,
    cfg: TriangulationConfig = TriangulationConfig(),
):
    """Full map build against reference poses. Returns (cameras, images,
    points3d, stats) and optionally writes the COLMAP model + stats."""
    cameras, ref_images, _ = read_model(reference_model_dir)
    name_to_id = {im.name: iid for iid, im in ref_images.items()}

    verified = geometric_verification(features, matches, pairs, cfg)
    verified_ids = [
        (name_to_id[n0], name_to_id[n1], m)
        for n0, n1, m in verified
        if n0 in name_to_id and n1 in name_to_id
    ]

    kp_all: Dict[int, np.ndarray] = {}
    for iid, im in ref_images.items():
        # COLMAP convention: +0.5 px origin shift on import
        # (hloc/triangulation.py:64).
        kp_all[iid] = features.read(im.name).keypoints + 0.5

    tracks = build_tracks(
        {iid: len(kp_all[iid]) for iid in ref_images},
        verified_ids,
        min_track_length=cfg.min_track_length,
    )

    # Bucket tracks by padded length and triangulate per bucket.
    cam8 = {
        iid: canonicalize_params(
            cameras[im.camera_id].model, cameras[im.camera_id].params
        ).astype(np.float32)
        for iid, im in ref_images.items()
    }
    qvec = {iid: im.qvec.astype(np.float32) for iid, im in ref_images.items()}
    tvec = {iid: im.tvec.astype(np.float32) for iid, im in ref_images.items()}

    buckets: Dict[int, List[int]] = {}
    for ti, tr in enumerate(tracks):
        t_pad = _pad_pow2(min(len(tr), cfg.max_track_length), lo=4)
        buckets.setdefault(t_pad, []).append(ti)

    xyz_out = np.zeros((len(tracks), 3), np.float64)
    err_out = np.zeros(len(tracks))
    valid_out = np.zeros(len(tracks), bool)
    obs_inlier: List[np.ndarray] = [None] * len(tracks)

    for t_pad, tids in sorted(buckets.items()):
        p = len(tids)
        obs = np.zeros((p, t_pad, 2), np.float32)
        mask = np.zeros((p, t_pad), bool)
        qv = np.zeros((p, t_pad, 4), np.float32)
        qv[..., 0] = 1.0
        tv = np.zeros((p, t_pad, 3), np.float32)
        cm = np.ones((p, t_pad, 8), np.float32)
        for pi, ti in enumerate(tids):
            tr = tracks[ti][: cfg.max_track_length]
            for oi, (iid, kidx) in enumerate(tr):
                obs[pi, oi] = kp_all[iid][kidx]
                mask[pi, oi] = True
                qv[pi, oi] = qvec[iid]
                tv[pi, oi] = tvec[iid]
                cm[pi, oi] = cam8[iid]
        res = triangulate_tracks(
            jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(qv),
            jnp.asarray(tv), jnp.asarray(cm),
            max_reproj_error=cfg.max_reproj_error,
            min_tri_angle_deg=cfg.min_tri_angle_deg,
        )
        xyz = np.asarray(res.xyz)
        val = np.asarray(res.valid)
        errs = np.asarray(res.errors)
        oinl = np.asarray(res.obs_inlier)
        for pi, ti in enumerate(tids):
            xyz_out[ti] = xyz[pi]
            err_out[ti] = errs[pi]
            valid_out[ti] = val[pi]
            obs_inlier[ti] = oinl[pi]

    # Assemble the output model.
    points3d: Dict[int, Point3D] = {}
    img_p3d: Dict[int, np.ndarray] = {
        iid: np.full(len(kp_all[iid]), -1, np.int64) for iid in ref_images
    }
    pid = 1
    for ti, tr in enumerate(tracks):
        if not valid_out[ti]:
            continue
        obs_list = [
            (iid, kidx)
            for oi, (iid, kidx) in enumerate(tr[: cfg.max_track_length])
            if obs_inlier[ti][oi]
        ]
        if len(obs_list) < cfg.min_track_length:
            continue
        points3d[pid] = Point3D(
            pid,
            xyz_out[ti],
            np.zeros(3, np.uint8),
            float(err_out[ti]),
            np.array([o[0] for o in obs_list], np.int32),
            np.array([o[1] for o in obs_list], np.int32),
        )
        for iid, kidx in obs_list:
            img_p3d[iid][kidx] = pid
        pid += 1

    images = {
        iid: Image(
            iid, im.qvec, im.tvec, im.camera_id, im.name,
            kp_all[iid], img_p3d[iid],
        )
        for iid, im in ref_images.items()
    }

    stats = analyze_model(cameras, images, points3d)
    if output_dir is not None:
        out = Path(output_dir)
        write_model(cameras, images, points3d, out, ext=".bin")
        (out / "statics.txt").write_text(format_stats(stats) + "\n")
    return cameras, images, points3d, stats
