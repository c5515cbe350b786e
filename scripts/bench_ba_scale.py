"""Measure the pallas row-gather vs XLA gather crossover and BA step
time at realistic map scale, ON THE REAL TPU.

Prints one JSON line per configuration:
  {"n": N, "m": M, "sorted": b, "pallas_ms": x, "xla_ms": y}
then a BA line: {"ba_scale_ms": t, "n_obs": O, "n_pts": P, "n_cams": C}.

Informs `_CROSSOVER_CHUNKS` in ops/pallas_gather.py (documented policy,
VERDICT r2 #5). Run under `timeout` — the TPU relay can wedge.
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

    from sfd2_tpu.ops.pallas_gather import gather_rows_pallas

    key = jax.random.PRNGKey(0)
    rtt = measure_rtt(6)
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2)}), flush=True)

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    for n in (8192, 32768, 131072):
        for m in (51200, 409600):
            table = jax.random.normal(jax.random.fold_in(key, n), (n, 3), jnp.float32)
            idx_u = jax.random.randint(jax.random.fold_in(key, n + m), (m,), 0, n)
            idx_s = jnp.sort(idx_u)
            for tag, idx in (("sorted", idx_s), ("unsorted", idx_u)):
                gp = lambda: gather_rows_pallas(table, idx)
                gx = lambda: take(table, idx)
                np.asarray(gp()[0]); np.asarray(gx()[0])
                tp = timed(gp, lambda o: np.asarray(o[0, :1]), rtt=rtt)
                tx = timed(gx, lambda o: np.asarray(o[0, :1]), rtt=rtt)
                print(json.dumps({
                    "n": n, "m": m, "idx": tag,
                    "pallas_ms": round(tp * 1e3, 3),
                    "xla_ms": round(tx * 1e3, 3),
                    "speedup": round(tx / tp, 2),
                }), flush=True)

    # BA step at map scale (sorted-obs path end-to-end).
    from sfd2_tpu.sfm.ba import BAProblem, bundle_adjust
    from sfd2_tpu.geometry.cameras import canonicalize_params, project_points

    n_cams, n_pts, obs_per_cam = 300, 131072, 1536
    n_obs = n_cams * obs_per_cam
    cam8 = jnp.asarray(np.asarray(
        canonicalize_params("PINHOLE", [500.0, 500.0, 320.0, 240.0]), np.float32))
    kb = jax.random.fold_in(key, 99)
    pts = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kb, 0), (n_pts,), minval=-8, maxval=68),
        jax.random.uniform(jax.random.fold_in(kb, 1), (n_pts,), minval=-6, maxval=6),
        jax.random.uniform(jax.random.fold_in(kb, 2), (n_pts,), minval=10, maxval=25),
    ], axis=1)
    obs_cam = jnp.repeat(jnp.arange(n_cams, dtype=jnp.int32), obs_per_cam)
    obs_pt = jax.random.randint(jax.random.fold_in(kb, 3), (n_obs,), 0, n_pts)
    cam_t = jnp.stack([jnp.linspace(0, 60, n_cams), jnp.zeros(n_cams),
                       jnp.zeros(n_cams)], axis=1)
    qvecs = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n_cams, 1))
    obs_xy = jax.vmap(
        lambda p, ci: project_points(p[None], qvecs[ci], cam_t[ci], cam8)[0][0]
    )(pts[obs_pt], obs_cam) + jax.random.normal(
        jax.random.fold_in(kb, 4), (n_obs, 2)) * 0.5
    fixed = jnp.zeros(n_cams, bool).at[0].set(True).at[1].set(True)
    prob = BAProblem(
        obs_xy=obs_xy, obs_cam=obs_cam, obs_point=obs_pt,
        obs_w=jnp.ones(n_obs), qvecs=qvecs, tvecs=cam_t,
        cam_params=jnp.tile(cam8[None], (n_cams, 1)),
        points=pts + jax.random.normal(jax.random.fold_in(kb, 5), pts.shape) * 0.05,
        fixed_cams=fixed,
    )
    ba = jax.jit(lambda p: bundle_adjust(p, lm_iters=3, cg_iters=10))
    np.asarray(ba(prob).final_cost)
    t = timed(lambda: ba(prob), lambda o: np.asarray(o.final_cost), inner=2, rtt=rtt)
    print(json.dumps({"ba_scale_ms": round(t * 1e3, 2), "n_obs": n_obs,
                      "n_pts": n_pts, "n_cams": n_cams,
                      "lm_iters": 3, "cg_iters": 10}), flush=True)


if __name__ == "__main__":
    main()
