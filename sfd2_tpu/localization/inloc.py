"""RGB-D (InLoc-style) localization: depth scans → 2D-3D PnP.

Capability parity: ``hloc/localize_inloc.py`` — localize a query against
RGB-D database images whose per-pixel 3D coordinates come from aligned
scans: match query↔DB descriptors, look up each matched DB keypoint's 3D
point by interpolating the scan grid (``interpolate_scan``), assemble
2D-3D correspondences over the top-k retrieved frames, and solve PnP.

The dense scan interpolation is a vectorised bilinear lookup with
NaN-aware validity (invalid scan cells poison their taps, as in the
reference's nearest-valid handling).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.localization.ransac import pnp_ransac
from sfd2_tpu.ops.matching import mutual_nn_match


def interpolate_scan(scan_xyz: np.ndarray, kpts: np.ndarray):
    """Bilinearly interpolate a [H, W, 3] scan at keypoints [N, 2] (x, y).

    Returns (xyz [N, 3], valid [N]); a sample is valid only when all four
    taps are finite.
    """
    h, w = scan_xyz.shape[:2]
    x = np.clip(kpts[:, 0], 0, w - 1 - 1e-6)
    y = np.clip(kpts[:, 1], 0, h - 1 - 1e-6)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = scan_xyz[y0, x0]
    c01 = scan_xyz[y0, np.minimum(x0 + 1, w - 1)]
    c10 = scan_xyz[np.minimum(y0 + 1, h - 1), x0]
    c11 = scan_xyz[np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)]
    xyz = (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )
    valid = np.isfinite(np.stack([c00, c01, c10, c11], 0)).all(axis=(0, 2))
    return xyz, valid


def localize_rgbd(
    q_kpts: np.ndarray,
    q_desc: np.ndarray,
    db_entries: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    camera_model: str,
    camera_params,
    ransac_thresh: float = 48.0,
    min_matches: int = 8,
):
    """Localize one query against RGB-D DB frames.

    Args:
      q_kpts/q_desc: query keypoints [N,2] and descriptors [N,C].
      db_entries: per retrieved frame (kpts [M,2], desc [M,C],
        scan_xyz [H,W,3] with NaN holes).
      ransac_thresh: reference uses 48 px for InLoc.

    Returns dict with qvec/tvec/num_inliers/success.
    """
    cam8 = canonicalize_params(camera_model, camera_params).astype(np.float32)
    all_2d: List[np.ndarray] = []
    all_3d: List[np.ndarray] = []
    for kpts, desc, scan in db_entries:
        m, _ = mutual_nn_match(jnp.asarray(q_desc), jnp.asarray(desc))
        m = np.asarray(m)
        src = np.nonzero(m >= 0)[0]
        if len(src) == 0:
            continue
        xyz, valid = interpolate_scan(scan, kpts[m[src]])
        all_2d.append(q_kpts[src[valid]])
        all_3d.append(xyz[valid])
    if not all_2d or sum(len(a) for a in all_2d) < min_matches:
        return {"success": False, "num_inliers": 0, "qvec": None, "tvec": None}
    p2d = np.concatenate(all_2d).astype(np.float32)
    p3d = np.concatenate(all_3d).astype(np.float32)
    n = len(p2d)
    n_pad = max(64, 1 << (n - 1).bit_length())
    xy = np.zeros((n_pad, 2), np.float32)
    pw = np.zeros((n_pad, 3), np.float32)
    va = np.zeros(n_pad, bool)
    xy[:n], pw[:n], va[:n] = p2d, p3d, True
    res = pnp_ransac(
        jnp.asarray(xy), jnp.asarray(pw), jnp.asarray(cam8), jnp.asarray(va),
        threshold=ransac_thresh, key=jax.random.PRNGKey(0),
    )
    return {
        "success": bool(res.success),
        "num_inliers": int(res.num_inliers),
        "qvec": np.asarray(res.qvec, np.float64),
        "tvec": np.asarray(res.tvec, np.float64),
    }
