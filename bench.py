"""Benchmark: per-stage device timings for the full localization pipeline
on one chip, plus an MFU estimate for the extraction forward.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: frames/s/chip over the north-star pipeline
(BASELINE.md: "extraction + matching + BA") —
  per-frame time = extract + match(50 candidates) + PnP-RANSAC
                 + covisibility refinement PnP + amortised map BA/frame.
The BA stage builds + solves a Schur/CG bundle adjustment over a 50-frame
synthetic map and its cost is divided by the frame count (map building is
per-map work, not per-query; the reference runs COLMAP point_triangulator
once per dataset).

The reference publishes no speed numbers, so vs_baseline compares against
the PREVIOUS round's BENCH_r*.json (round-over-round ledger); 1.0 when no
prior bench exists.

Timing method: the sandbox TPU sits behind a high-latency relay
(~50-100 ms RPC round-trip), so each stage processes a BATCH of items
per dispatch (amortising the round-trip), is fenced by a small host
transfer, and the relay RTT (measured with a trivial op) is subtracted;
medians over repeats are reported.

MFU: extraction FLOPs come from XLA's compiled cost analysis; the
denominator is the chip's measured large-GEMM rate (a 4096³ matmul timed
the same way), so `mfu` = achieved FLOP/s ÷ measured-GEMM FLOP/s.
"""

from __future__ import annotations

import glob
import json
import re
import time
import traceback

import numpy as np


def _timed_per_item(fn, fence, items_per_call, iters=3, inner=8, rtt=0.0):
    """MIN per-item time over `iters` windows of `inner` ASYNC dispatches
    fenced once at the end.

    The relay RTT (~25-35 ms, jittery) is paid once per *window*, not per
    dispatch, so the subtraction is a small correction instead of the
    dominant term — a mis-estimated RTT previously could zero out short
    stages entirely (negative device time → nonsense MFU). The estimator
    is the MIN across windows, not the median: the relay intermittently
    enters multi-second turbulence phases that inflate whole windows by
    10-30× (device time is fixed; relay noise is strictly additive), and
    a median over 3-4 windows cannot reject a majority-turbulent sample.
    run_bench additionally measures every stage in TWO passes separated
    by the other stages' work (minutes apart) and keeps per-stage minima,
    since a turbulence phase usually covers all back-to-back windows of
    a single stage.
    """
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        fence(out)
        ts.append(time.perf_counter() - t0)
    t_window = min(ts)
    return max(t_window - rtt, t_window * 0.05) / (inner * items_per_call)


def _prev_bench_value() -> float | None:
    """Latest BENCH_r*.json headline value > 0 (round ledger)."""
    best = None
    for p in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        if not m:
            continue
        try:
            data = json.loads(open(p).read())
            parsed = data.get("parsed", data)
            v = float(parsed.get("value", 0.0))
        except Exception:
            continue
        if v > 0 and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), v)
    return best[1] if best else None


def run_bench():
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.matching import mutual_nn_match
    from sfd2_tpu.ops.pallas_match import mutual_nn_match_pallas

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    h = w = 1024
    k = 4096
    c = 128
    n_db = 50  # candidate DB frames per query (test_aachenv_1_1 NetVLAD top-50)
    ex_batch = 8 if on_tpu else 1
    match_chunk = n_db if on_tpu else 10

    key = jax.random.PRNGKey(0)

    # Relay RTT: every fenced dispatch pays a fixed host↔device round-trip.
    tiny = jnp.zeros((8, 128))
    tiny_f = jax.jit(lambda x, s: x + s)
    np.asarray(tiny_f(tiny, 0.0)[0, :4])
    rtts = []
    for i in range(8):
        t0 = time.perf_counter()
        np.asarray(tiny_f(tiny, float(i + 1))[0, :4])
        rtts.append(time.perf_counter() - t0)
    # min, not median: RTT is a fixed overhead plus positive jitter.
    rtt = min(rtts)

    # --- measured large-GEMM rate (MFU denominator) ---------------------
    gemm_n = 4096 if on_tpu else 512
    a = jax.random.normal(jax.random.fold_in(key, 1), (gemm_n, gemm_n), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 2), (gemm_n, gemm_n), jnp.float32)
    reps = 8 if on_tpu else 1

    @jax.jit
    def gemm_loop(a, b):
        x = a
        for _ in range(reps):
            x = jnp.dot(x, b)
        return x

    np.asarray(gemm_loop(a, b)[0, :4])
    stages = []  # (name, fn, fence, items_per_call, inner)
    stages.append(("gemm", lambda: gemm_loop(a, b),
                   lambda o: np.asarray(o[0, :4]), 1, 8))
    gemm_flops_total = reps * 2 * gemm_n**3

    # --- extraction -----------------------------------------------------
    # bf16 trunk on TPU (the production Extractor default): f32 matmuls
    # already run at bf16 MXU precision on TPU, so bf16 cuts HBM traffic
    # only — heads stay f32 (see models/sfd2.py).
    ex_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ResSegNetV2(require_stability=True, dtype=ex_dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    if on_tpu:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )

    @jax.jit
    def extract(variables, images):
        out = model.apply(variables, images)
        return extract_keypoints(
            out.score, out.descriptors, out.stability,
            max_keypoints=k, conf_threshold=0.001,
        )

    imgs = jax.random.normal(jax.random.fold_in(key, 3), (ex_batch, h, w, 3), jnp.float32)
    # FLOPs from XLA's own cost analysis of the compiled program.
    try:
        cost = jax.jit(extract).lower(variables, imgs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        extract_flops = float(cost.get("flops", 0.0))
    except Exception:
        extract_flops = 0.0
    np.asarray(extract(variables, imgs).scores)  # compile + warm

    stages.append(("extract", lambda: extract(variables, imgs),
                   lambda o: np.asarray(o.scores[:, :8]), ex_batch, 8))

    # --- matching (50 candidate DB frames per query) --------------------
    def unit(key, shape):
        d = jax.random.normal(key, shape, jnp.float32)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    qdj = unit(jax.random.fold_in(key, 4), (match_chunk, k, c))
    ddj = unit(jax.random.fold_in(key, 5), (match_chunk, k, c))

    if on_tpu:
        match = lambda: mutual_nn_match_pallas(qdj, ddj, None, None)[0]
        matcher_name = "pallas"
    else:
        vm = jax.jit(jax.vmap(lambda a, b: mutual_nn_match(a, b, None, None)))
        match = lambda: vm(qdj, ddj)[0]
        matcher_name = "xla"
    np.asarray(match()[:, :4])  # compile + warm
    stages.append(("match", match, lambda o: np.asarray(o[:, :4]),
                   match_chunk, 8))

    # --- PnP-RANSAC + covisibility-refinement PnP -----------------------
    from sfd2_tpu.geometry.cameras import canonicalize_params, project_points
    from sfd2_tpu.localization.pnp import refine_pose_lm
    from sfd2_tpu.localization.ransac import pnp_ransac

    n_corr = 2048  # 2D-3D matches per query after cluster assembly
    n_hyp = 1024
    cam8 = jnp.asarray(
        np.asarray(canonicalize_params("SIMPLE_RADIAL", [1200.0, 800.0, 600.0, 0.0]),
                   np.float32)
    )

    kk = jax.random.fold_in(key, 6)
    pts3d = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kk, 0), (n_corr,), minval=-5, maxval=5),
        jax.random.uniform(jax.random.fold_in(kk, 1), (n_corr,), minval=-4, maxval=4),
        jax.random.uniform(jax.random.fold_in(kk, 2), (n_corr,), minval=8, maxval=16),
    ], axis=1)
    q_gt = jnp.array([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.zeros(3)
    xy, _ = project_points(pts3d, q_gt, t_gt, cam8)
    xy = xy + jax.random.normal(jax.random.fold_in(kk, 3), xy.shape) * 1.0
    valid = jnp.ones(n_corr, bool)

    pnp = jax.jit(
        lambda xy, p3, v, kr: pnp_ransac(
            xy, p3, cam8, v, threshold=15.0, key=kr, num_hypotheses=n_hyp
        )
    )
    res = pnp(xy, pts3d, valid, jax.random.PRNGKey(1))
    np.asarray(res.qvec)
    key_pnp = jax.device_put(jax.random.PRNGKey(1))
    stages.append(("pnp", lambda: pnp(xy, pts3d, valid, key_pnp),
                   lambda o: np.asarray(o.qvec), 1, 24))

    # Refinement: 5 masked-LM iterations on the inlier set (iters knob of
    # test_aachenv_1_1) — jitted as ONE program.
    @jax.jit
    def refine(qv, tv, xy, p3, w):
        for _ in range(5):
            qv, tv = refine_pose_lm(qv, tv, p3, xy, cam8, w, iterations=2)
        return qv, tv

    w_inl = res.inliers.astype(jnp.float32)
    rq, rt = refine(res.qvec, res.tvec, xy, pts3d, w_inl)
    np.asarray(rq)
    stages.append(("refine",
                   lambda: refine(res.qvec, res.tvec, xy, pts3d, w_inl),
                   lambda o: np.asarray(o[0]), 1, 24))

    # --- map BA (amortised per frame) -----------------------------------
    from sfd2_tpu.sfm.ba import BAProblem, bundle_adjust

    n_cams = n_db
    n_pts = 8192 if on_tpu else 1024
    obs_per_cam = 1024 if on_tpu else 128
    n_obs = n_cams * obs_per_cam
    kb = jax.random.fold_in(key, 7)
    ba_pts = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kb, 0), (n_pts,), minval=-8, maxval=8),
        jax.random.uniform(jax.random.fold_in(kb, 1), (n_pts,), minval=-6, maxval=6),
        jax.random.uniform(jax.random.fold_in(kb, 2), (n_pts,), minval=10, maxval=25),
    ], axis=1)
    obs_cam = jnp.repeat(jnp.arange(n_cams, dtype=jnp.int32), obs_per_cam)
    obs_pt = jax.random.randint(jax.random.fold_in(kb, 3), (n_obs,), 0, n_pts)
    cam_t = jnp.stack([
        jnp.linspace(-5, 5, n_cams), jnp.zeros(n_cams), jnp.zeros(n_cams)
    ], axis=1)
    qvecs = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n_cams, 1))
    obs_xy_clean = jax.vmap(
        lambda p, ci: project_points(p[None], qvecs[ci], cam_t[ci], cam8)[0][0]
    )(ba_pts[obs_pt], obs_cam)
    obs_xy = obs_xy_clean + jax.random.normal(
        jax.random.fold_in(kb, 4), (n_obs, 2)) * 0.5
    fixed = jnp.zeros(n_cams, bool).at[0].set(True).at[1].set(True)
    problem = BAProblem(
        obs_xy=obs_xy, obs_cam=obs_cam, obs_point=obs_pt,
        obs_w=jnp.ones(n_obs), qvecs=qvecs, tvecs=cam_t,
        cam_params=jnp.tile(cam8[None], (n_cams, 1)),
        points=ba_pts + jax.random.normal(jax.random.fold_in(kb, 5),
                                          ba_pts.shape) * 0.05,
        fixed_cams=fixed,
    )
    ba = jax.jit(lambda p: bundle_adjust(p, lm_iters=3, cg_iters=10))
    np.asarray(ba(problem).final_cost)
    stages.append(("ba", lambda: ba(problem),
                   lambda o: np.asarray(o.final_cost), 1, 3))

    # --- two measurement passes, per-stage minima -----------------------
    times = {}
    for _pass in range(2):
        for name, fn, fence, items, inner in stages:
            t = _timed_per_item(fn, fence, items, inner=inner, rtt=rtt)
            times[name] = min(times.get(name, float("inf")), t)
    gemm_rate = gemm_flops_total / times["gemm"]
    t_extract_dev = times["extract"]
    t_match_dev = times["match"] * n_db
    t_pnp_dev = times["pnp"]
    t_refine_dev = times["refine"]
    t_ba_dev = times["ba"]
    t_ba_per_frame = t_ba_dev / n_cams
    mfu = (
        (extract_flops / ex_batch) / t_extract_dev / gemm_rate
        if extract_flops and gemm_rate
        else 0.0
    )

    # --- headline -------------------------------------------------------
    frame_time = t_extract_dev + t_match_dev + t_pnp_dev + t_refine_dev + t_ba_per_frame
    fps = 1.0 / frame_time
    prev = _prev_bench_value()
    return {
        "metric": "localization_pipeline_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s (1024px extract@4096kp + 50-pair mutual-NN + "
                "PnP-RANSAC + 5-iter LM refine + map-BA/50 frames; device "
                "time, relay RTT subtracted)",
        "vs_baseline": round(fps / prev, 3) if prev else 1.0,
        "platform": platform,
        "extract_ms": round(t_extract_dev * 1e3, 2),
        "match50_ms": round(t_match_dev * 1e3, 2),
        "pnp_ms": round(t_pnp_dev * 1e3, 2),
        "refine_ms": round(t_refine_dev * 1e3, 2),
        "ba_ms": round(t_ba_dev * 1e3, 2),
        "ba_ms_per_frame": round(t_ba_per_frame * 1e3, 3),
        "extract_gflops": round(extract_flops / ex_batch / 1e9, 1),
        "measured_gemm_tflops": round(gemm_rate / 1e12, 1),
        "mfu": round(mfu, 3),
        "relay_rtt_ms": round(rtt * 1e3, 2),
        "matcher": matcher_name,
        "prev_round_fps": prev,
    }


_WATCHDOG_S = 480  # the relay TPU occasionally hangs inside a jax call


def main():
    """Run the bench under a hard watchdog: the relay-backed TPU can hang
    inside device calls (no exception to catch), so the workload runs in a
    daemon thread and a timeout still yields the JSON line."""
    import os
    import threading

    result_box = {}

    def work():
        try:
            result_box["result"] = run_bench()
        except Exception as e:  # never exit without the JSON line
            result_box["result"] = {
                "metric": "localization_pipeline_frames_per_s_per_chip",
                "value": 0.0,
                "unit": "frames/s (bench failed)",
                "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}",
            }
            traceback.print_exc()

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(_WATCHDOG_S)
    result = result_box.get(
        "result",
        {
            "metric": "localization_pipeline_frames_per_s_per_chip",
            "value": 0.0,
            "unit": "frames/s (bench timed out)",
            "vs_baseline": 0.0,
            "error": f"watchdog timeout after {_WATCHDOG_S}s (TPU relay hang)",
        },
    )
    print(json.dumps(result), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
