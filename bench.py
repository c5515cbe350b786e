"""Benchmark: per-stage device timings for the full localization pipeline
on one chip, plus an MFU/roofline estimate for the extraction forward, an
on-device Pallas-kernel exactness self-check, and an honest end-to-end
`LocalizationEngine.localize` wall-clock measurement.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: frames/s/chip over the north-star pipeline
(BASELINE.md: "extraction + matching + BA") —
  per-frame time = extract + match(50 candidates) + PnP-RANSAC
                 + covisibility refinement PnP + amortised map BA/frame.

Wedge survivability (the sandbox TPU sits behind a relay that can hang
calls for 30+ minutes — see CLAUDE.md):
  * every stage writes its result into a shared dict the moment it is
    measured, and the watchdog emits whatever is there when the budget
    expires — a wedge mid-run reports the stages that DID run;
  * each stage is measured ONCE immediately after its own compile+warm
    (pass 0), so a wedge during a later stage's minutes-long compile
    still reports every stage built so far; passes 1-2 then cover ALL
    stages and refine the minima;
  * a persistent JAX compilation cache (.jax_cache/) makes retry runs
    skip the multi-minute remote compiles;
  * every attempt appends a timestamped record to BENCH_ATTEMPTS.jsonl
    (evidence trail distinguishing "relay wedged" from "never tried").

Timing method: each stage processes a BATCH of items per dispatch
(amortising the ~25-100 ms relay round-trip), is fenced by a small host
transfer, and the fixed per-window fence/RTT cost is cancelled by
paired-window differencing (inner vs 2×inner dispatches measured
back-to-back per pair, MIN across pairs and across BENCH_PASSES passes
(default 3) plus the pass-0 measurement — relay noise is strictly
additive; see _timed_per_item).

vs_baseline: the reference publishes no speed numbers, so the ledger is
round-over-round: baseline = the highest-round BENCH_r*.json with
value>0 (wedged 0.0 artifacts skipped); the chosen file is reported as
`vs_baseline_ref` and the round-1 ratio as `vs_r01`.

Env knobs: BENCH_BUDGET_S (default 2400), BENCH_PASSES (3),
BENCH_E2E / BENCH_EXACT (1), BENCH_QUICK=1 (small shapes, CPU-friendly).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import threading
import time
import traceback

import numpy as np

from sfd2_tpu.utils.benchtime import (
    enable_compile_cache,
    measure_rtt,
    timed_per_item as _timed_per_item,
)

_REPO = os.path.dirname(os.path.abspath(__file__))
_METRIC = "localization_pipeline_frames_per_s_per_chip"
_STAGES = ("extract", "match", "pnp", "refine", "ba")  # headline terms


def _append_attempt(record: dict) -> None:
    try:
        record = dict(record, ts=time.time(),
                      iso=time.strftime("%Y-%m-%dT%H:%M:%S"))
        with open(os.path.join(_REPO, "BENCH_ATTEMPTS.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
    except Exception:
        pass


def _prev_bench():
    """(ref_name, value) for the ledger baseline + the r01 value.

    Baseline = the highest-round BENCH_r*.json with value>0 (wedged 0.0
    rounds are skipped). A rerun after this round's artifact lands thus
    compares against that artifact — a real prior measurement — and the
    chosen file is always named in `vs_baseline_ref` so the comparison
    is never silent."""
    rounds = {}
    for p in glob.glob(os.path.join(_REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        if not m:
            continue
        try:
            data = json.loads(open(p).read())
            parsed = data.get("parsed", data)
            v = float(parsed.get("value", 0.0))
        except Exception:
            continue
        rounds[int(m.group(1))] = v
    if not rounds:
        return None, None, None
    prior = [(n, v) for n, v in rounds.items() if v > 0]
    r01 = rounds.get(1)
    if not prior:
        return None, None, r01
    n, v = max(prior)
    return f"BENCH_r{n:02d}", v, r01


def _compose(shared: dict) -> dict:
    """Build the emittable JSON from whatever has been measured so far."""
    times = shared.get("times", {})
    n_db = shared.get("n_db", 50)
    have = [s for s in _STAGES if s in times]
    stage_s = {
        "extract": times.get("extract"),
        "match": times.get("match", 0.0) * n_db if "match" in times else None,
        "pnp": times.get("pnp"),
        "refine": times.get("refine"),
        "ba": (times.get("ba", 0.0) / shared.get("ba_frames", n_db)
               if "ba" in times else None),
    }
    frame_time = sum(stage_s[s] for s in have)
    fps = 1.0 / frame_time if frame_time > 0 else 0.0
    complete = len(have) == len(_STAGES)
    if "ledger" not in shared:  # one disk read, not one per stage update
        shared["ledger"] = _prev_bench()
    ref, prev, r01 = shared["ledger"]

    unit = ("frames/s (1024px extract@4096kp + 50-pair mutual-NN + "
            "PnP-RANSAC + 5-iter LM refine + map-BA/50 frames; device "
            "time, fence/RTT cancelled by paired-window differencing)")
    if not complete:
        unit = (f"frames/s over PARTIAL stages [{'+'.join(have)}] "
                "(run ended early — see error/stage_errors; device time, "
                "fence/RTT cancelled)")
    if shared.get("quick"):
        unit = "QUICK MODE (256px/512kp smoke shapes, NOT the headline) " + unit

    out = {
        "metric": _METRIC,
        "value": round(fps, 3),
        "unit": unit,
        "vs_baseline": round(fps / prev, 3) if prev else 1.0,
        "platform": shared.get("platform", "?"),
        "passes_completed": shared.get("passes_completed", 0),
    }
    if not complete:
        out["partial"] = True
        out["stages_measured"] = have
    if shared.get("quick"):
        out["quick"] = True
    fatal = (shared.get("stage_errors") or {}).get("fatal")
    if fatal:
        out["error"] = fatal
    if ref:
        out["vs_baseline_ref"] = ref
        out["prev_round_fps"] = prev
    if r01:
        out["vs_r01"] = round(fps / r01, 3)
        out["r01_note"] = "r01 metric covered extract+match only"

    for s in have:
        key = {"match": "match50_ms"}.get(s, f"{s}_ms")
        val = stage_s[s] if s != "ba" else times["ba"]
        out[key] = round(val * 1e3, 2)
    if "ba" in have:
        out["ba_ms_per_frame"] = round(stage_s["ba"] * 1e3, 3)

    if "gemm" in times and shared.get("gemm_flops_total"):
        gemm_rate = shared["gemm_flops_total"] / times["gemm"]
        out["measured_gemm_tflops"] = round(gemm_rate / 1e12, 1)
        ex_flops = shared.get("extract_flops", 0.0)
        if ex_flops and "extract" in times:
            out["extract_gflops"] = round(
                ex_flops / shared["ex_batch"] / 1e9, 1)
            out["mfu"] = round(
                (ex_flops / shared["ex_batch"]) / times["extract"]
                / gemm_rate, 3)
        ex_bytes = shared.get("extract_bytes", 0.0)
        if ex_bytes and "extract" in times:
            gbs = ex_bytes / shared["ex_batch"] / times["extract"] / 1e9
            out["extract_hbm_gb_per_s"] = round(gbs, 1)
            # v5e HBM peak 819 GB/s: achieved fraction of the memory
            # roofline, next to mfu (compute roofline) — whichever is
            # higher names the binding resource.
            out["extract_membw_frac"] = round(gbs / 819.0, 3)
    if "rtt" in shared:
        out["relay_rtt_ms"] = round(shared["rtt"] * 1e3, 2)
    if "matcher" in shared:
        out["matcher"] = shared["matcher"]

    # Aachen production extraction config (1600px resize_max,
    # extract_localization.py:39): a second headline with the r1600
    # extract swapped in for the 1024px ECMU one (VERDICT r3 #2).
    if "extract1600" in times:
        out["extract1600_ms"] = round(times["extract1600"] * 1e3, 2)
        if complete:
            frame_1600 = frame_time - stage_s["extract"] + times["extract1600"]
            out["fps_1600"] = round(1.0 / frame_1600, 3)
            out["fps_1600_note"] = ("Aachen production config: 1600x1200 "
                                    "extract@4096kp + same match/pnp/"
                                    "refine/ba terms")

    # Map-build throughput (VERDICT r4 #4): the COLMAP matches_importer /
    # point_triangulator workloads, measured on device.
    if "verify" in times:
        out["verify_pair_ms"] = round(times["verify"] * 1e3, 3)
        out["verify_pairs_per_s"] = round(1.0 / times["verify"], 1)
    if "triang" in times:
        out["triang_pt_us"] = round(times["triang"] * 1e6, 3)
        out["triang_pts_per_s"] = round(1.0 / times["triang"], 1)

    # Run-variance discipline (VERDICT r3 weak #1): fps recomputed from
    # each COMPLETE measurement pass's own stage times, so docs can quote
    # a median + spread instead of a best-of-runs.
    by_pass = shared.get("times_by_pass") or []
    fps_passes = []
    for tp in by_pass:
        if all(s in tp for s in _STAGES):
            ft = (tp["extract"] + tp["match"] * n_db + tp["pnp"]
                  + tp["refine"] + tp["ba"] / shared.get("ba_frames", n_db))
            fps_passes.append(round(1.0 / ft, 3))
    if fps_passes:
        out["fps_per_pass"] = fps_passes
        out["fps_median_passes"] = round(float(np.median(fps_passes)), 3)
        if len(fps_passes) > 1 and max(fps_passes) > 0:
            out["fps_spread_pct"] = round(
                100.0 * (max(fps_passes) - min(fps_passes))
                / max(fps_passes), 1)

    for k in ("fused_stem", "kernels_exact", "kernel_deltas", "e2e_query_ms",
              "e2e_recall_025m_2deg", "e2e_recall_05m_5deg",
              "e2e_med_terr_m", "e2e_med_rerr_deg",
              "e2e_qps_sequential", "e2e_qps_pipelined", "e2e_qps_batched",
              "e2e_accept_batched", "e2e_recall_batched",
              "e2e_pipeline_speedup", "e2e_batched_breakdown",
              "e2e_note", "stage_errors"):
        if shared.get(k) is not None and shared.get(k) != {}:
            out[k] = shared[k]
    return out


def run_bench(shared: dict) -> dict:
    quick = os.environ.get("BENCH_QUICK") == "1"
    n_passes = int(os.environ.get("BENCH_PASSES", "3"))

    import jax

    enable_compile_cache(_REPO)

    import jax.numpy as jnp

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.matching import mutual_nn_match
    from sfd2_tpu.ops.pallas_match import mutual_nn_match_pallas

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    shared["platform"] = platform
    shared["quick"] = quick
    shared["phase"] = "setup"
    times = shared.setdefault("times", {})
    errors = shared.setdefault("stage_errors", {})

    h = w = 256 if quick else 1024
    k = 512 if quick else 4096
    c = 128
    n_db = 50  # candidate DB frames per query (test_aachen NetVLAD top-50)
    shared["n_db"] = n_db
    ex_batch = 16 if on_tpu else 1  # 16 beats 8 by ~4%/img (measured)
    match_chunk = n_db if on_tpu else 10

    key = jax.random.PRNGKey(0)

    # Relay RTT: every fenced dispatch pays a fixed host↔device round-trip.
    # Re-sampled before every stage measurement; the GLOBAL min across the
    # run is what gets subtracted (one estimate taken during a turbulence
    # phase poisoned every window — the r4 137.9/120.0 fps artifacts).
    rtt = measure_rtt()
    shared["rtt"] = rtt
    shared["result"] = _compose(shared)

    def rtt_min():
        nonlocal rtt
        rtt = min(rtt, measure_rtt(4))
        shared["rtt"] = rtt
        return rtt

    stages = []  # (name, fn, fence, items_per_call, inner)

    def add_stage(name, fn, fence, items, inner):
        """Register a stage and measure ONE window immediately: a relay
        wedge during a LATER stage's minutes-long compile still leaves
        this stage's number in the emitted JSON (pass 1/2 refine it)."""
        stages.append((name, fn, fence, items, inner))
        shared["phase"] = f"measure:{name}:pass0"
        try:
            t = _timed_per_item(fn, fence, items, iters=1, inner=inner,
                                rtt=rtt_min())
            times[name] = min(times.get(name, float("inf")), t)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"
        shared["result"] = _compose(shared)

    # --- measured large-GEMM rate (MFU denominator) ---------------------
    shared["phase"] = "compile:gemm"
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
    add_stage("gemm", lambda: gemm_loop(a, b),
              lambda o: np.asarray(o[0, :4]), 1, 8)
    shared["gemm_flops_total"] = reps * 2 * gemm_n**3

    # --- matching (50 candidate DB frames per query) --------------------
    # Set up BEFORE extraction: its compile is seconds, extraction's is
    # minutes — if the relay wedges during the extract compile the match
    # stage is already runnable.
    shared["phase"] = "compile:match"

    def unit(key, shape):
        d = jax.random.normal(key, shape, jnp.float32)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    qdj = unit(jax.random.fold_in(key, 4), (match_chunk, k, c))
    ddj = unit(jax.random.fold_in(key, 5), (match_chunk, k, c))

    if on_tpu:
        # ONE jitted program: called eagerly, the kernel + epilogue +
        # glue ops each dispatch as a separate relay RPC (~15 ops/call),
        # which measured as ~1 ms/frame of phantom match time — the
        # round-4 match50 2.31 ms vs the 1.24 ms kernel floor
        # (scripts/bench_match_attrib.py pins the attribution).
        mj = jax.jit(lambda a, b: mutual_nn_match_pallas(a, b, None, None))
        match = lambda: mj(qdj, ddj)[0]
        shared["matcher"] = "pallas"
    else:
        vm = jax.jit(jax.vmap(lambda a, b: mutual_nn_match(a, b, None, None)))
        match = lambda: vm(qdj, ddj)[0]
        shared["matcher"] = "xla"
    np.asarray(match()[:, :4])  # compile + warm
    add_stage("match", match, lambda o: np.asarray(o[:, :4]),
              match_chunk, 8)

    # --- extraction -----------------------------------------------------
    # bf16 trunk on TPU (the production Extractor default): f32 matmuls
    # already run at bf16 MXU precision on TPU, so bf16 cuts HBM traffic
    # only — heads stay f32 (see models/sfd2.py).
    shared["phase"] = "compile:extract"
    ex_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ResSegNetV2(require_stability=True, dtype=ex_dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    # Fused s2d stem on TPU — the production extraction path (pipeline/
    # extract.py stem_backend='pallas'): the HOST packs s2d plane rows
    # next to the upload (same bytes on the wire), the Pallas kernel
    # (ops/pallas_stem.py) computes conv1a+conv1b without the
    # full-resolution activation ever existing. Measured v5e @1024² b8:
    # 0.534 ms/img vs 1.337 layer-by-layer (VERDICT r3 #1).
    stem_w = None
    if on_tpu:
        from sfd2_tpu.ops.pallas_stem import fused_stem_pallas, StemWeights
        from sfd2_tpu.ops.stem import repack_stem_params

        stem_w = StemWeights(repack_stem_params(
            variables["params"], variables["batch_stats"]))
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )
    shared["fused_stem"] = "pallas" if stem_w is not None else "off"

    def make_extract():
        @jax.jit
        def extract_pallas(variables, x2_rows):
            out1c = fused_stem_pallas(
                x2_rows, stem_w.w1k, stem_w.w2k, stem_w.b1, stem_w.b2,
                out_dtype=ex_dtype)
            out = model.apply(variables, out1c,
                              method=model.forward_from_out1c)
            return extract_keypoints(
                out.score, out.descriptors, out.stability,
                max_keypoints=k, conf_threshold=0.001,
            )

        @jax.jit
        def extract_std(variables, images):
            out = model.apply(variables, images)
            return extract_keypoints(
                out.score, out.descriptors, out.stability,
                max_keypoints=k, conf_threshold=0.001,
            )

        return extract_pallas if stem_w is not None else extract_std

    extract = make_extract()

    if stem_w is not None:
        # Bench inputs are device-generated; production builds this
        # layout on the host for free (pipeline/extract.py::_pad_batch).
        imgs = jax.random.normal(
            jax.random.fold_in(key, 3),
            (ex_batch, h // 2 + 8, 16, w // 2), jnp.float32)
    else:
        imgs = jax.random.normal(
            jax.random.fold_in(key, 3), (ex_batch, h, w, 3), jnp.float32)
    # FLOPs + HBM bytes from XLA's own cost analysis of the compiled
    # program (roofline numerators).
    try:
        cost = extract.lower(variables, imgs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        shared["extract_flops"] = float(cost.get("flops", 0.0))
        shared["extract_bytes"] = float(cost.get("bytes accessed", 0.0))
    except Exception:
        shared["extract_flops"] = shared["extract_bytes"] = 0.0
    shared["ex_batch"] = ex_batch
    np.asarray(extract(variables, imgs).scores)  # compile + warm
    add_stage("extract", lambda: extract(variables, imgs),
              lambda o: np.asarray(o.scores[:, :8]), ex_batch, 8)

    # --- PnP-RANSAC + covisibility-refinement PnP -----------------------
    shared["phase"] = "compile:pnp"
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
    add_stage("pnp", lambda: pnp(xy, pts3d, valid, key_pnp),
              lambda o: np.asarray(o.qvec), 1, 24)

    # Refinement: 5 masked-LM iterations on the inlier set (iters knob of
    # test_aachenv_1_1) — jitted as ONE program.
    shared["phase"] = "compile:refine"

    @jax.jit
    def refine(qv, tv, xy, p3, w):
        for _ in range(5):
            qv, tv = refine_pose_lm(qv, tv, p3, xy, cam8, w, iterations=2)
        return qv, tv

    w_inl = res.inliers.astype(jnp.float32)
    rq, rt = refine(res.qvec, res.tvec, xy, pts3d, w_inl)
    np.asarray(rq)
    add_stage("refine",
              lambda: refine(res.qvec, res.tvec, xy, pts3d, w_inl),
              lambda o: np.asarray(o[0]), 1, 24)

    # --- map BA (amortised per frame) -----------------------------------
    shared["phase"] = "compile:ba"
    from sfd2_tpu.sfm.ba import BAProblem, bundle_adjust

    n_cams = n_db
    n_pts = 8192 if on_tpu else 1024
    obs_per_cam = 1024 if on_tpu else 128
    n_obs = n_cams * obs_per_cam
    shared["ba_frames"] = n_cams
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
    add_stage("ba", lambda: ba(problem),
              lambda o: np.asarray(o.final_cost), 1, 3)

    # --- extraction at the Aachen production config (VERDICT r3 #2) -----
    # resize_max 1600 (extract_localization.py:39); 1600x1200 = the
    # typical landscape Aachen bucket, 1.83x the ECMU 1024² pixels.
    # Registered LAST so a wedge during its fresh multi-minute compile
    # cannot cost any headline stage its pass-0 number.
    if on_tpu and not quick:
        shared["phase"] = "compile:extract1600"
        try:
            # Pallas stem bucket: W rounds to 256 (pipeline/extract.py
            # _pad_hw) — Aachen landscape 1600x1200 pads to 1600x1280.
            h16, w16 = (1600, 1280) if stem_w is not None else (1600, 1200)
            ex16_batch = 8 if on_tpu else 1

            @jax.jit
            def extract1600(variables, images):
                if stem_w is not None:
                    out1c = fused_stem_pallas(
                        images, stem_w.w1k, stem_w.w2k, stem_w.b1,
                        stem_w.b2, out_dtype=ex_dtype)
                    out = model.apply(variables, out1c,
                                      method=model.forward_from_out1c)
                else:
                    out = model.apply(variables, images)
                return extract_keypoints(
                    out.score, out.descriptors, out.stability,
                    max_keypoints=k, conf_threshold=0.001,
                )

            shape16 = ((ex16_batch, h16 // 2 + 8, 16, w16 // 2)
                       if stem_w is not None else (ex16_batch, h16, w16, 3))
            imgs16 = jax.random.normal(
                jax.random.fold_in(key, 16), shape16, jnp.float32)
            np.asarray(extract1600(variables, imgs16).scores)  # compile+warm
            add_stage("extract1600", lambda: extract1600(variables, imgs16),
                      lambda o: np.asarray(o.scores[:, :8]), ex16_batch, 4)
        except Exception as e:  # an EXTRA stage must never kill the run
            errors["extract1600"] = f"{type(e).__name__}: {e}"[:400]
            shared["result"] = _compose(shared)

    # --- map-build stages (VERDICT r4 #4): two-view geometric
    # verification + fixed-pose multi-view triangulation — the COLMAP
    # matches_importer / point_triangulator workloads
    # (hloc/triangulation.py:114-147), lanes-form solvers. Registered
    # after the headline stages so their compile cannot cost a
    # headline pass-0 number.
    try:
        shared["phase"] = "compile:verify"
        from sfd2_tpu.sfm.twoview import verify_fundamental_ransac

        n_m = 1024 if on_tpu else 128
        h_hyp = 2048 if on_tpu else 128
        vb = 16 if on_tpu else 2
        kv = jax.random.fold_in(key, 31)
        vpts = jnp.stack([
            jax.random.uniform(jax.random.fold_in(kv, 0), (vb, n_m), minval=-5, maxval=5),
            jax.random.uniform(jax.random.fold_in(kv, 1), (vb, n_m), minval=-4, maxval=4),
            jax.random.uniform(jax.random.fold_in(kv, 2), (vb, n_m), minval=8, maxval=16),
        ], axis=-1)
        q2 = jnp.tile(jnp.array([0.9995, 0.0, 0.0312, 0.0]), (vb, 1))
        t2b = jnp.tile(jnp.array([0.8, 0.05, 0.0]), (vb, 1))
        vxy1, _ = jax.vmap(lambda p: project_points(p, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), cam8))(vpts)
        vxy2, _ = jax.vmap(lambda p, q, t: project_points(p, q, t, cam8))(vpts, q2, t2b)
        vxy2 = vxy2 + jax.random.normal(jax.random.fold_in(kv, 3), vxy2.shape) * 0.6
        omask = jax.random.uniform(jax.random.fold_in(kv, 4), (vb, n_m)) < 0.3
        rxy = jnp.stack([
            jax.random.uniform(jax.random.fold_in(kv, 5), (vb, n_m), minval=0, maxval=2400),
            jax.random.uniform(jax.random.fold_in(kv, 6), (vb, n_m), minval=0, maxval=1600),
        ], axis=-1)
        vxy2 = jnp.where(omask[..., None], rxy, vxy2)
        vvalid = jax.random.uniform(jax.random.fold_in(kv, 7), (vb, n_m)) < 0.85
        vkeys = jax.random.split(jax.random.fold_in(key, 32), vb)
        verify = jax.jit(jax.vmap(
            lambda a, b2, v, kk2: verify_fundamental_ransac(
                a, b2, v, threshold=4.0, key=kk2, num_hypotheses=h_hyp)))
        np.asarray(verify(vxy1, vxy2, vvalid, vkeys).num_inliers)
        add_stage("verify", lambda: verify(vxy1, vxy2, vvalid, vkeys),
                  lambda o: np.asarray(o.num_inliers[:4]), vb, 4)

        shared["phase"] = "compile:triang"
        from sfd2_tpu.sfm.triangulation import triangulate_tracks

        p_tr = 8192 if on_tpu else 512
        t_tr = 8
        kt = jax.random.fold_in(key, 33)
        tpts = jnp.stack([
            jax.random.uniform(jax.random.fold_in(kt, 0), (p_tr,), minval=-8, maxval=8),
            jax.random.uniform(jax.random.fold_in(kt, 1), (p_tr,), minval=-6, maxval=6),
            jax.random.uniform(jax.random.fold_in(kt, 2), (p_tr,), minval=10, maxval=25),
        ], axis=1)
        tqv = jnp.tile(jnp.array([1.0, 0, 0, 0]), (p_tr, t_tr, 1))
        ttv = jnp.tile(jnp.stack([
            jnp.linspace(-4, 4, t_tr), jnp.zeros(t_tr), jnp.zeros(t_tr)
        ], 1)[None], (p_tr, 1, 1))
        tcams = jnp.tile(cam8[None, None], (p_tr, t_tr, 1))
        toxy = jax.vmap(
            lambda p, q, t, c: project_points(
                p[None].repeat(t_tr, 0)[:, None], q, t, c)[0][:, 0]
        )(tpts, tqv, ttv, tcams)
        toxy = toxy + jax.random.normal(jax.random.fold_in(kt, 3), toxy.shape) * 0.4
        tmask = jax.random.uniform(jax.random.fold_in(kt, 4), (p_tr, t_tr)) < 0.75
        tmask = tmask.at[:, :2].set(True)
        tri = jax.jit(lambda xy, m, q, t, c: triangulate_tracks(xy, m, q, t, c))
        np.asarray(tri(toxy, tmask, tqv, ttv, tcams).errors[:4])
        add_stage("triang", lambda: tri(toxy, tmask, tqv, ttv, tcams),
                  lambda o: np.asarray(o.errors[:4]), p_tr, 4)
        shared["triang_P"] = p_tr
    except Exception as e:  # extra stages must never kill the run
        errors["mapbuild"] = f"{type(e).__name__}: {e}"[:400]
        shared["result"] = _compose(shared)

    # --- measurement passes: per-stage minima, result updated live ------
    by_pass = shared.setdefault("times_by_pass", [])
    for p in range(n_passes):
        pass_times: dict = {}
        by_pass.append(pass_times)
        for name, fn, fence, items, inner in stages:
            shared["phase"] = f"measure:{name}:pass{p+1}"
            try:
                t = _timed_per_item(fn, fence, items, inner=inner,
                                    rtt=rtt_min())
                times[name] = min(times.get(name, float("inf")), t)
                pass_times[name] = t
            except Exception as e:
                errors[name] = f"{type(e).__name__}: {e}"
            shared["result"] = _compose(shared)
        shared["passes_completed"] = p + 1
        shared["result"] = _compose(shared)
        if p == 0:
            # Full headline exists now; run the exactness check between
            # passes (doubles as inter-pass spacing against turbulence).
            if os.environ.get("BENCH_EXACT", "1") == "1":
                shared["phase"] = "kernels_exact"
                try:
                    _kernel_exactness(shared, on_tpu)
                except Exception as e:
                    errors["kernels_exact"] = f"{type(e).__name__}: {e}"
                shared["result"] = _compose(shared)

    # --- honest end-to-end query benchmark (last: most wedge-prone) -----
    if os.environ.get("BENCH_E2E", "1") == "1":
        shared["phase"] = "e2e"
        try:
            _e2e_localize(shared, quick)
        except Exception as e:
            errors["e2e"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        shared["result"] = _compose(shared)

    shared["phase"] = "done"
    return shared["result"]


def _kernel_exactness(shared: dict, on_tpu: bool) -> None:
    """Seconds-long on-device self-check: production Pallas kernels vs
    their XLA references on the REAL backend (CI covers interpret-mode
    on CPU only; this catches Mosaic-lowering regressions). Bit-exact is
    the contract: the matcher kernels compute f32 similarities and the
    epilogue compares maxima bit-exactly; the gather moves rows
    untouched (it_loc/matcher.py:122-165 parity chain)."""
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.ops.matching import mutual_nn_match, mutual_nn_ratio_match
    from sfd2_tpu.ops.pallas_gather import gather_rows_pallas
    from sfd2_tpu.ops.pallas_match import (
        mutual_nn_match_pallas,
        mutual_nn_ratio_match_pallas,
    )

    key = jax.random.PRNGKey(7)
    b, k, c = 2, 512, 128

    def unit(key, shape):
        d = jax.random.normal(key, shape, jnp.float32)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    d0 = unit(jax.random.fold_in(key, 0), (b, k, c))
    d1 = unit(jax.random.fold_in(key, 1), (b, k, c))
    v0 = jax.random.uniform(jax.random.fold_in(key, 2), (b, k)) > 0.1
    v1 = jax.random.uniform(jax.random.fold_in(key, 3), (b, k)) > 0.1

    interp = not on_tpu  # CPU smoke runs use interpret mode
    deltas = {}
    m_p, s_p = mutual_nn_match_pallas(d0, d1, v0, v1, interpret=interp)
    vm = jax.jit(jax.vmap(mutual_nn_match))
    m_x, s_x = vm(d0, d1, v0, v1)
    deltas["nnm_idx"] = int(np.sum(np.asarray(m_p) != np.asarray(m_x)))
    deltas["nnm_score"] = float(np.max(np.abs(np.asarray(s_p) - np.asarray(s_x))))

    r_p, rs_p = mutual_nn_ratio_match_pallas(d0, d1, 0.95, v0, v1,
                                             interpret=interp)
    vr = jax.jit(jax.vmap(lambda a, b, va, vb: mutual_nn_ratio_match(a, b, 0.95, va, vb)))
    r_x, rs_x = vr(d0, d1, v0, v1)
    deltas["nnr_idx"] = int(np.sum(np.asarray(r_p) != np.asarray(r_x)))
    deltas["nnr_score"] = float(np.max(np.abs(np.asarray(rs_p) - np.asarray(rs_x))))

    table = jax.random.normal(jax.random.fold_in(key, 4), (1000, 3), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 5), (333,), 0, 1000)
    g_p = gather_rows_pallas(table, idx, interpret=interp)
    g_x = jnp.take(table, idx, axis=0)
    deltas["gather"] = float(np.max(np.abs(np.asarray(g_p) - np.asarray(g_x))))

    # Big-N sorted path (the BA map-scale regime: bounded chunk walk).
    big = jax.random.normal(jax.random.fold_in(key, 6), (100_000, 3), jnp.float32)
    bidx = jnp.sort(
        jax.random.randint(jax.random.fold_in(key, 7), (4096,), 0, 100_000))
    gb_p = gather_rows_pallas(big, bidx, interpret=interp)
    gb_x = jnp.take(big, bidx, axis=0)
    deltas["gather_big_sorted"] = float(
        np.max(np.abs(np.asarray(gb_p) - np.asarray(gb_x))))

    # Stem kernel vs the XLA s2d stem: tolerance-gated, not bit-exact —
    # the GEMM contraction order differs, and both run at bf16 MXU
    # precision on this chip; 1e-2 relative would still catch any
    # indexing/weight-repack regression outright.
    from sfd2_tpu.ops.pallas_stem import StemWeights, stem_pallas_apply
    from sfd2_tpu.ops.stem import PackedStem, fused_stem_apply

    ks = jax.random.fold_in(key, 8)
    packed = PackedStem(
        w1=jax.random.normal(jax.random.fold_in(ks, 0), (3, 3, 12, 256)) * 0.2,
        b1=jax.random.normal(jax.random.fold_in(ks, 1), (256,)) * 0.1,
        w2=jax.random.normal(jax.random.fold_in(ks, 2), (2, 2, 256, 64)) * 0.1,
        b2=jax.random.normal(jax.random.fold_in(ks, 3), (64,)) * 0.1,
    )
    xs = jax.random.normal(jax.random.fold_in(key, 9), (1, 64, 256, 3))
    s_ref = np.asarray(fused_stem_apply(xs, packed, jnp.float32))
    s_got = np.asarray(stem_pallas_apply(
        xs, StemWeights(packed), dtype=jnp.float32, interpret=interp)
        .astype(jnp.float32))
    deltas["stem_rel"] = float(
        np.abs(s_got - s_ref).max() / max(1e-6, np.abs(s_ref).max()))

    shared["kernel_deltas"] = deltas
    shared["kernels_exact"] = (
        deltas["nnm_idx"] == 0 and deltas["nnm_score"] == 0.0
        and deltas["nnr_idx"] == 0 and deltas["nnr_score"] == 0.0
        and deltas["gather"] == 0.0 and deltas["gather_big_sorted"] == 0.0
        and deltas["stem_rel"] < 1e-2
    )


def _e2e_localize(shared: dict, quick: bool) -> None:
    """Wall-clock `LocalizationEngine.localize` over a synthetic corridor
    map — host orchestration + transfers + device compute, nothing
    subtracted. The honest per-query number next to the stage-min
    composite (the reference's per-query loop, localize_cv2.py:652).

    Round-4 upgrades (VERDICT r3 #3/#4):
      * PRODUCTION shapes on TPU — 4096 kp/image, 50 candidate frames,
        C=128, Aachen LocalizerConfig defaults — so e2e_query_ms is
        comparable to the 4096-kp stage headline;
      * pose accuracy scored against the scene's ground truth: recall at
        the Aachen (0.25m,2°)/(0.5m,5°) bands + median errors
        (localizer.py:158-170 semantics) — an engine that accepts
        clusters but returns degraded poses now fails visibly;
      * a pipelined pass (localize_many, 4 workers) overlapping host
        phases with device compute → e2e_qps_pipelined vs sequential.
    """
    import tempfile

    from sfd2_tpu.geometry.np_pose import pose_error
    from sfd2_tpu.localization.engine import LocalizationEngine, LocalizerConfig
    from sfd2_tpu.utils.synth import build_corridor_scene

    production = shared.get("platform") == "tpu" and not quick
    if production:
        # Aachen production shapes: 4096 kp, top-50 retrieval, C=128
        # (extract_localization.py:39 + test_aachenv_1_1:14).
        n_img, n_q = 60, 8
        scene_kw = dict(n_points=14000, kp_per_image=4096,
                        kp_per_query=4096, desc_dim=128, retrieval_k=50)
        cfg = LocalizerConfig(max_keypoints=4096, pnp_pad_floor=4096)
    else:
        n_img, n_q = (20, 4) if quick else (60, 12)
        scene_kw = dict(n_points=2000, kp_per_image=700,
                        kp_per_query=500, retrieval_k=10)
        cfg = LocalizerConfig(
            ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
            covisibility_frame=10, iters=2, radius=12.0, obs_thresh=3,
            max_keypoints=1024, num_hypotheses=512,
            pnp_pad_floor=4096,  # one PnP/refine program for every query
        )
    with tempfile.TemporaryDirectory() as td:
        scene = build_corridor_scene(
            os.path.join(td, "f.h5"), n_images=n_img, n_queries=n_q,
            seed=7, **scene_kw,
        )
        from sfd2_tpu.io.feature_store import FeatureStore

        with FeatureStore(scene.feature_path, "r") as fs:
            eng = LocalizationEngine(scene.map_index, fs, cfg)
            per_q, errs = [], []
            n_acc = 0
            for i, (qname, q_gt, t_gt, near) in enumerate(scene.queries):
                t0 = time.perf_counter()
                res = eng.localize(qname, scene.qinfo, [[j] for j in near])
                dt = time.perf_counter() - t0
                if i > 0:  # first query pays all jit compiles
                    per_q.append(dt)
                n_acc += res.source == "accepted"
                errs.append(pose_error(res.qvec, res.tvec, q_gt, t_gt))
                if per_q:
                    shared["e2e_query_ms"] = round(
                        float(np.median(per_q)) * 1e3, 1)
                    shared["result"] = _compose(shared)
            q_err = np.array([e[0] for e in errs])
            t_err = np.array([e[1] for e in errs])
            shared["e2e_recall_025m_2deg"] = round(
                float(np.mean((t_err < 0.25) & (q_err < 2.0))), 3)
            shared["e2e_recall_05m_5deg"] = round(
                float(np.mean((t_err < 0.5) & (q_err < 5.0))), 3)
            shared["e2e_med_terr_m"] = round(float(np.median(t_err)), 4)
            shared["e2e_med_rerr_deg"] = round(float(np.median(q_err)), 3)
            shared["result"] = _compose(shared)

            # Pipelined pass: same queries, 4 worker threads — overlap
            # host assembly/fetch RTT with device compute (VERDICT r3 #4).
            jobs = [(qname, scene.qinfo, [[j] for j in near])
                    for qname, _, _, near in scene.queries]
            t0 = time.perf_counter()
            results_p = eng.localize_many(jobs, workers=4)
            wall_p = time.perf_counter() - t0
            seq_qps = 1.0 / float(np.median(per_q)) if per_q else 0.0
            pip_qps = len(jobs) / wall_p
            shared["e2e_qps_sequential"] = round(seq_qps, 2)
            shared["e2e_qps_pipelined"] = round(pip_qps, 2)
            shared["result"] = _compose(shared)
            # Batched throughput mode: every device stage one dispatch
            # for ALL queries (RTT amortised Q-fold). First call pays its
            # own jit compiles (batched PnP/refine programs at the full-Q
            # buckets), so warm with the full job list, then time.
            eng.localize_throughput(jobs)
            bstats: dict = {}
            t0 = time.perf_counter()
            results_b = eng.localize_throughput(jobs, stats=bstats)
            wall_b = time.perf_counter() - t0
            bat_qps = len(jobs) / wall_b
            shared["e2e_qps_batched"] = round(bat_qps, 2)
            # Host/RTT/device breakdown of the batched pass (VERDICT r4
            # #5): phase wall-clock in ms for the WHOLE batch, plus the
            # match-table fetch volume — the residual is python glue.
            acc = sum(v for k, v in bstats.items() if k.endswith("_s"))
            shared["e2e_batched_breakdown"] = {
                **{k[:-2] + "_ms": round(v * 1e3, 1)
                   for k, v in sorted(bstats.items()) if k.endswith("_s")},
                "match_fetch_mb": round(bstats.get("match_fetch_mb", 0.0), 2),
                "other_ms": round((wall_b - acc) * 1e3, 1),
            }
            shared["e2e_pipeline_speedup"] = round(
                max(pip_qps, bat_qps) / seq_qps, 2) if seq_qps else 0.0
            acc_p = sum(r.source == "accepted" for r in results_p)
            acc_b = sum(r.source == "accepted" for r in results_b)
            shared["e2e_accept_batched"] = f"{acc_b}/{len(jobs)}"
            errs_b = [pose_error(r.qvec, r.tvec, q_gt, t_gt)
                      for r, (_, q_gt, t_gt, _) in zip(results_b, scene.queries)]
            qe_b = np.array([e[0] for e in errs_b])
            te_b = np.array([e[1] for e in errs_b])
            shared["e2e_recall_batched"] = round(
                float(np.mean((te_b < 0.25) & (qe_b < 2.0))), 3)
        shared["e2e_note"] = (
            f"median wall-clock over {len(per_q)} queries ({n_img}-img map"
            f"{', PRODUCTION 4096kp/50-frame shapes' if production else ''}, "
            f"{n_acc}/{len(scene.queries)} accepted seq, {acc_p} pipelined; "
            "includes host orchestration + relay RTT per dispatch; "
            "first-query compile excluded)"
        )


def main():
    """Run the bench under a budgeted watchdog: the relay-backed TPU can
    hang inside device calls (no exception to catch), so the workload
    runs in a daemon thread that publishes per-stage results as they
    land; on budget expiry the watchdog emits whatever was measured."""
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    shared: dict = {}
    _append_attempt({"event": "start", "budget_s": budget,
                     "argv": sys.argv[1:]})

    done = threading.Event()

    def work():
        try:
            run_bench(shared)
        except Exception as e:  # never exit without the JSON line
            shared.setdefault("stage_errors", {})["fatal"] = (
                f"{type(e).__name__}: {e}")
            traceback.print_exc()
            try:  # recompose so the fatal reaches the emitted JSON
                shared["result"] = _compose(shared)
            except Exception:
                pass
        finally:
            done.set()

    t = threading.Thread(target=work, daemon=True)
    t0 = time.time()
    t.start()
    last_phase = None
    while time.time() - t0 < budget and not done.is_set():
        done.wait(5.0)
        phase = shared.get("phase")
        if phase != last_phase:
            print(f"[bench +{time.time()-t0:.0f}s] {phase}",
                  file=sys.stderr, flush=True)
            last_phase = phase

    result = shared.get("result")
    if result is None:
        result = {
            "metric": _METRIC, "value": 0.0,
            "unit": "frames/s (bench produced nothing)",
            "vs_baseline": 0.0,
            "error": f"no stage completed within {budget:.0f}s "
                     f"(TPU relay hang during {shared.get('phase')})",
        }
    elif not done.is_set():
        result = dict(result)
        result["error"] = (
            f"watchdog budget {budget:.0f}s expired during "
            f"{shared.get('phase')!r}; emitting stages measured so far")
    _append_attempt({"event": "end", "elapsed_s": round(time.time() - t0, 1),
                     "completed": done.is_set(),
                     "phase": shared.get("phase"),
                     "platform": shared.get("platform"),
                     "quick": bool(shared.get("quick")),
                     "value": result.get("value"),
                     "error": result.get("error")})
    print(json.dumps(result), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
