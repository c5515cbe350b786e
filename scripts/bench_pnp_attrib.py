"""Attribute pnp_ransac's per-query time across its phases on the real
TPU (DCE-truncated jit programs, CLAUDE.md methodology), and A/B the
hypothesis-sampling strategy.

The bench pnp stage measures ~1.2 ms/query (N=2048 correspondences,
H=1024 hypotheses) — this pins which phase owns it:
  sample  gumbel + per-hypothesis lax.top_k(6) over [H, N]
  solve   + pnp_dlt_fast_lanes minimal DLT (SoA, no LAPACK)
  score   + H x N reprojection inlier counts + argmax
  full    + 2 rounds of LO (weighted pnp_dlt SVD-of-A refit + masked LM)

Sampling A/B: top_k(6) of one gumbel field (exact sampling w/o
replacement) vs argmax over 6 independent gumbel fields (categorical
WITH replacement; a duplicate inside a 6-set is a degenerate hypothesis
that the finite/score guards already discard, p~C(6,2)/N = 0.7% at
N=2048).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from sfd2_tpu.utils.benchtime import (  # noqa: E402
    enable_compile_cache,
    measure_rtt,
    timed_per_item as timed,
)


def main():
    import jax
    import jax.numpy as jnp

    enable_compile_cache(_REPO)

    from sfd2_tpu.geometry.cameras import (
        canonicalize_params,
        project_points,
        unproject_normalized,
    )
    from sfd2_tpu.localization.pnp import (
        pnp_dlt,
        pnp_dlt_fast_lanes,
        refine_pose_lm,
    )
    from sfd2_tpu.localization.ransac import pnp_ransac

    on_tpu = jax.default_backend() == "tpu"
    n = 2048
    n_hyp = 1024 if on_tpu else 128
    thr = 12.0

    key = jax.random.PRNGKey(0)
    cam8 = jnp.asarray(
        np.asarray(
            canonicalize_params("SIMPLE_RADIAL", [1200.0, 800.0, 600.0, 0.0]),
            np.float32,
        )
    )
    kk = jax.random.fold_in(key, 6)
    pts3d = jnp.stack(
        [
            jax.random.uniform(jax.random.fold_in(kk, 0), (n,), minval=-5, maxval=5),
            jax.random.uniform(jax.random.fold_in(kk, 1), (n,), minval=-5, maxval=5),
            jax.random.uniform(jax.random.fold_in(kk, 2), (n,), minval=4, maxval=12),
        ],
        axis=1,
    )
    proj, _ = project_points(pts3d, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), cam8)
    pts2d = proj + 0.5 * jax.random.normal(jax.random.fold_in(kk, 3), (n, 2))
    valid = jnp.ones((n,), bool)
    rkey = jax.random.fold_in(key, 9)

    rtt = measure_rtt(6)
    print(
        json.dumps({"rtt_ms": round(rtt * 1e3, 2), "n": n, "h": n_hyp}),
        flush=True,
    )

    def upto(stage):
        @jax.jit
        def run(points2d, points3d, valid, key):
            fvalid = valid.astype(points2d.dtype)
            pts_norm = unproject_normalized(points2d, cam8)

            def sample_one(k):
                g = jax.random.gumbel(k, (n,)) + jnp.log(fvalid + 1e-30)
                _, idx = jax.lax.top_k(g, 6)
                return idx

            keys = jax.random.split(key, n_hyp)
            sample_idx = jax.vmap(sample_one)(keys)
            if stage == "sample":
                return sample_idx
            h_q, h_t = pnp_dlt_fast_lanes(
                points3d[sample_idx], pts_norm[sample_idx]
            )
            if stage == "solve":
                return h_q, h_t

            def score_one(q, t):
                p, depth = project_points(points3d, q, t, cam8)
                err = jnp.linalg.norm(p - points2d, axis=-1)
                return jnp.sum((err <= thr) & (depth > 0) & valid)

            counts = jax.vmap(score_one)(h_q, h_t)
            finite = jnp.all(jnp.isfinite(h_q), -1) & jnp.all(
                jnp.isfinite(h_t), -1
            )
            counts = jnp.where(finite, counts, 0)
            best = jnp.argmax(counts)
            return h_q[best], h_t[best]

        return run

    def fence(o):
        if isinstance(o, tuple):
            return np.asarray(o[0]).reshape(-1)[:4]
        return np.asarray(o).reshape(-1)[:4]

    prev = 0.0
    for stage in ("sample", "solve", "score"):
        run = upto(stage)
        fence(run(pts2d, pts3d, valid, rkey))
        t = timed(
            lambda: run(pts2d, pts3d, valid, rkey),
            fence,
            items_per_call=1,
            iters=3,
            inner=8,
            rtt=rtt,
        )
        ms = t * 1e3
        print(
            json.dumps(
                {
                    "upto": stage,
                    "cum_ms": round(ms, 3),
                    "delta_ms": round(ms - prev, 3),
                }
            ),
            flush=True,
        )
        prev = ms

    # full pnp_ransac (adds the 2-round LO: 2x weighted pnp_dlt SVD refit
    # + 2x masked LM + inlier recounts)
    fence(pnp_ransac(pts2d, pts3d, cam8, valid, thr, rkey).qvec)
    t = timed(
        lambda: pnp_ransac(pts2d, pts3d, cam8, valid, thr, rkey),
        lambda o: np.asarray(o.qvec),
        items_per_call=1,
        iters=3,
        inner=8,
        rtt=rtt,
    )
    print(
        json.dumps(
            {
                "upto": "full",
                "cum_ms": round(t * 1e3, 3),
                "delta_ms(lo)": round(t * 1e3 - prev, 3),
            }
        ),
        flush=True,
    )

    # --- LO internals standalone ----------------------------------------
    w_all = valid.astype(jnp.float32)
    pts_norm = unproject_normalized(pts2d, cam8)

    dlt = jax.jit(lambda p3, pn, w: pnp_dlt(p3, pn, weights=w))
    fence(dlt(pts3d, pts_norm, w_all))
    t = timed(
        lambda: dlt(pts3d, pts_norm, w_all),
        fence,
        items_per_call=1,
        iters=3,
        inner=8,
        rtt=rtt,
    )
    print(json.dumps({"op": "pnp_dlt_svd_refit", "ms": round(t * 1e3, 3)}))

    q0 = jnp.array([1.0, 0, 0, 0])
    t0 = jnp.zeros(3)
    lm = jax.jit(
        lambda q, tt, w: refine_pose_lm(q, tt, pts3d, pts2d, cam8, w)
    )
    fence(lm(q0, t0, w_all))
    t = timed(
        lambda: lm(q0, t0, w_all),
        fence,
        items_per_call=1,
        iters=3,
        inner=8,
        rtt=rtt,
    )
    print(json.dumps({"op": "refine_pose_lm", "ms": round(t * 1e3, 3)}))

    # --- sampling A/B -----------------------------------------------------
    @jax.jit
    def sample_topk(valid, key):
        fvalid = valid.astype(jnp.float32)

        def sample_one(k):
            g = jax.random.gumbel(k, (n,)) + jnp.log(fvalid + 1e-30)
            _, idx = jax.lax.top_k(g, 6)
            return idx

        return jax.vmap(sample_one)(jax.random.split(key, n_hyp))

    @jax.jit
    def sample_argmax(valid, key):
        fvalid = valid.astype(jnp.float32)
        g = jax.random.gumbel(key, (n_hyp, 6, n)) + jnp.log(fvalid + 1e-30)
        return jnp.argmax(g, axis=-1).astype(jnp.int32)

    for name, fn in (("sample_topk", sample_topk), ("sample_argmax", sample_argmax)):
        fence(fn(valid, rkey))
        t = timed(
            lambda: fn(valid, rkey),
            fence,
            items_per_call=1,
            iters=3,
            inner=8,
            rtt=rtt,
        )
        print(json.dumps({"op": name, "ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
