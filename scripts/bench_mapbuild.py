"""Map-build stage timings on device: two-view geometric verification
(pairs/s) and fixed-pose multi-view triangulation (points/s).

These are the reference's COLMAP matches_importer / point_triangulator
workloads (hloc/triangulation.py:114-147) — VERDICT r4 #4 asked for TPU
numbers. Prints one JSON line with per-stage results; used to baseline
the vmapped-SVD paths and to validate the lanes-form rewrites.

Usage: timeout 900 python scripts/bench_mapbuild.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sfd2_tpu.utils.benchtime import (  # noqa: E402
    enable_compile_cache, measure_rtt, timed_per_item)

enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sfd2_tpu.geometry.cameras import canonicalize_params, project_points  # noqa: E402
from sfd2_tpu.sfm.triangulation import triangulate_tracks  # noqa: E402
from sfd2_tpu.sfm.twoview import verify_fundamental_ransac  # noqa: E402


def main():
    quick = "--quick" in sys.argv or jax.devices()[0].platform != "tpu"
    out = {"platform": jax.devices()[0].platform}
    key = jax.random.PRNGKey(0)
    rtt = measure_rtt()
    out["rtt_ms"] = round(rtt * 1e3, 2)

    # ---- two-view verification ------------------------------------------
    # Production-ish shapes: N padded candidate matches per pair (mutual-NN
    # of 4096-kp images lands ~0.5-1.5k), H hypotheses, VB pairs/dispatch.
    n = 256 if quick else 1024
    h_hyp = 256 if quick else 2048
    vb = 2 if quick else 16
    kk = jax.random.fold_in(key, 1)
    cam8 = jnp.asarray(np.asarray(
        canonicalize_params("SIMPLE_RADIAL", [1200.0, 800.0, 600.0, 0.0]),
        np.float32))
    pts = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kk, 0), (vb, n), minval=-5, maxval=5),
        jax.random.uniform(jax.random.fold_in(kk, 1), (vb, n), minval=-4, maxval=4),
        jax.random.uniform(jax.random.fold_in(kk, 2), (vb, n), minval=8, maxval=16),
    ], axis=-1)  # [VB, N, 3]
    q1 = jnp.tile(jnp.array([1.0, 0, 0, 0]), (vb, 1))
    t1 = jnp.zeros((vb, 3))
    ang = 0.06
    q2 = jnp.tile(jnp.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0]),
                  (vb, 1)).astype(jnp.float32)
    t2 = jnp.tile(jnp.array([0.8, 0.05, 0.0]), (vb, 1)).astype(jnp.float32)
    xy1, _ = jax.vmap(lambda p, q, t: project_points(p, q, t, cam8))(pts, q1, t1)
    xy2, _ = jax.vmap(lambda p, q, t: project_points(p, q, t, cam8))(pts, q2, t2)
    noise = jax.random.normal(jax.random.fold_in(kk, 3), xy2.shape) * 0.6
    xy2 = xy2 + noise
    # 30% outliers: replace xy2 rows with random in-image positions.
    out_mask = jax.random.uniform(jax.random.fold_in(kk, 4), (vb, n)) < 0.3
    rand_xy = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kk, 5), (vb, n), minval=0, maxval=2400),
        jax.random.uniform(jax.random.fold_in(kk, 6), (vb, n), minval=0, maxval=1600),
    ], axis=-1)
    xy2 = jnp.where(out_mask[..., None], rand_xy, xy2)
    valid = jax.random.uniform(jax.random.fold_in(kk, 7), (vb, n)) < 0.85

    vkeys = jax.random.split(jax.random.fold_in(key, 2), vb)
    verify = jax.jit(jax.vmap(
        lambda a, b, v, k: verify_fundamental_ransac(
            a, b, v, threshold=4.0, key=k, num_hypotheses=h_hyp)))
    t0 = time.time()
    res = verify(xy1, xy2, valid, vkeys)
    ninl = np.asarray(res.num_inliers)
    out["verify_compile_s"] = round(time.time() - t0, 1)
    out["verify_inliers_mean"] = float(ninl.mean())
    out["verify_success"] = int(np.asarray(res.success).sum())
    t = timed_per_item(lambda: verify(xy1, xy2, valid, vkeys),
                       lambda o: np.asarray(o.num_inliers[:4]),
                       items_per_call=vb, inner=4, rtt=rtt)
    out["verify_pair_ms"] = round(t * 1e3, 3)
    out["verify_pairs_per_s"] = round(1.0 / t, 1)
    out["verify_shapes"] = f"N={n} H={h_hyp} VB={vb}"
    print(json.dumps(out), flush=True)

    # ---- multi-view triangulation ---------------------------------------
    p_cnt = 512 if quick else 8192
    t_cnt = 8
    kt = jax.random.fold_in(key, 3)
    tp = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kt, 0), (p_cnt,), minval=-8, maxval=8),
        jax.random.uniform(jax.random.fold_in(kt, 1), (p_cnt,), minval=-6, maxval=6),
        jax.random.uniform(jax.random.fold_in(kt, 2), (p_cnt,), minval=10, maxval=25),
    ], axis=1)
    cam_x = jnp.linspace(-4, 4, t_cnt)
    qv = jnp.tile(jnp.array([1.0, 0, 0, 0]), (p_cnt, t_cnt, 1))
    tv = jnp.tile(
        jnp.stack([cam_x, jnp.zeros(t_cnt), jnp.zeros(t_cnt)], 1)[None],
        (p_cnt, 1, 1))
    cams = jnp.tile(cam8[None, None], (p_cnt, t_cnt, 1))
    obs_xy = jax.vmap(
        lambda p, q, t, c: project_points(p[None].repeat(t_cnt, 0)[:, None],
                                          q, t, c)[0][:, 0])(tp, qv, tv, cams)
    obs_xy = obs_xy + jax.random.normal(jax.random.fold_in(kt, 3),
                                        obs_xy.shape) * 0.4
    obs_mask = jax.random.uniform(jax.random.fold_in(kt, 4),
                                  (p_cnt, t_cnt)) < 0.75
    obs_mask = obs_mask.at[:, :2].set(True)

    tri = jax.jit(lambda xy, m, q, t, c: triangulate_tracks(xy, m, q, t, c))
    t0 = time.time()
    r = tri(obs_xy, obs_mask, qv, tv, cams)
    nval = int(np.asarray(r.valid).sum())
    out2 = {"triang_compile_s": round(time.time() - t0, 1),
            "triang_valid": nval, "triang_P": p_cnt, "triang_T": t_cnt}
    err = np.asarray(r.errors)[np.asarray(r.valid)]
    out2["triang_mean_err_px"] = round(float(err.mean()), 3) if len(err) else -1.0
    t = timed_per_item(lambda: tri(obs_xy, obs_mask, qv, tv, cams),
                       lambda o: np.asarray(o.errors[:4]),
                       items_per_call=p_cnt, inner=4, rtt=rtt)
    out2["triang_pt_us"] = round(t * 1e6, 3)
    out2["triang_pts_per_s"] = round(1.0 / t, 1)
    print(json.dumps(out2), flush=True)


if __name__ == "__main__":
    main()
