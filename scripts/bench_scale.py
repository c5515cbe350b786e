"""Aachen-scale synthetic dress rehearsal (VERDICT r4 #1).

Runs the REAL map-build + localization pipeline at reference scale —
the reference's headline benchmark is a ~6.7k-image Aachen DB with
top-50 retrieval lists per query (test_aachenv_1_1:24-80,
pairs/aachen_v1.1/pairs-query-netvlad50.txt) — on a synthetic corridor
scene with known ground truth:

  scene (≥5k DB images, ≥500k GT points, 4096 kp/img, C=128)
    → pairs_from_poses              (sfm/pairs.py)
    → fused match + two-view verify (ops/matching.py + sfm/twoview.py)
    → track building                (sfm/tracks.py, C++ union-find)
    → multi-view triangulation      (sfm/triangulation.py)
    → bundle adjustment             (sfm/ba.py)
    → MapIndex.from_arrays          (sfm/map_index.py)
    → localize_throughput           (localization/engine.py),
      50 queries × top-50 retrieval, recall scored against GT poses.

TPU-native data logistics (the part a torch/COLMAP port cannot do): the
relay moves ~100 MB/min (CLAUDE.md), so a 5 GB descriptor-bank upload is
impossible — instead every large tensor is BORN ON DEVICE. A chunked
jitted generator projects GT points, top-k's keypoints and writes bf16
descriptor banks + keypoint xy straight into device-resident buffers;
matching, verification, triangulation and BA all gather from those
buffers in-graph; the engine receives the banks through
`LocalizationEngine.inject_db_features` (extract→localize HBM handoff).
Only small index tables and the 50 query feature sets cross the relay.

Artifact: SCALE_r05.json at the repo root, written incrementally after
every stage (wedge-survivable, same policy as bench.py). A watchdog
emits whatever was measured if the relay wedges.

Usage:
  python scripts/bench_scale.py            # full scale, real TPU
  python scripts/bench_scale.py --tiny     # CPU smoke (seconds)
Env knobs: SCALE_N_DB, SCALE_N_PTS, SCALE_N_Q, SCALE_TOPQ, SCALE_PAIRS,
SCALE_BA=0/1, SCALE_BUDGET_S.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

TINY = "--tiny" in sys.argv

import jax  # noqa: E402

if TINY:  # sitecustomize forces the axon TPU; this must run pre-first-op
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

ART = ROOT / ("SCALE_tiny.json" if TINY else "SCALE_r05.json")

# --- scale knobs -----------------------------------------------------------
def _env(name, default):
    return int(os.environ.get(name, default))

if TINY:
    N_DB, N_PTS, N_Q, TOPQ, PAIRS = 60, 6000, 8, 10, 4
    KP, C, NM, HYP = 512, 64, 256, 256
    GEN_B, PB, TRI_P, T_CAP = 20, 4, 2048, 8
    W, H = 640, 480
else:
    N_DB = _env("SCALE_N_DB", 5000)
    N_PTS = _env("SCALE_N_PTS", 600_000)
    N_Q = _env("SCALE_N_Q", 50)
    TOPQ = _env("SCALE_TOPQ", 50)
    PAIRS = _env("SCALE_PAIRS", 10)
    KP, C = 4096, 128
    NM, HYP = 1024, 2048     # bench.py verify-stage shapes (jit-cache hits)
    GEN_B, PB = 50, 16
    TRI_P, T_CAP = 65536, 12
    W, H = 1024, 768

SPAN = max(4.0, N_DB * 0.2)
CAMP = [1200.0, 1200.0, W / 2.0, H / 2.0]
NOISE_PX = 0.4
DESC_NOISE = 0.05
BA_MAX_OBS = _env("SCALE_BA_MAX_OBS", 4_000_000)
RUN_BA = os.environ.get("SCALE_BA", "1") == "1"
BUDGET_S = float(os.environ.get("SCALE_BUDGET_S", "2400"))

shared: dict = {"stages_s": {}, "counts": {}, "phase": "init",
                "scale": {"n_db": N_DB, "n_gt_points": N_PTS, "n_queries": N_Q,
                          "retrieval_topk": TOPQ, "db_pairs_per_image": PAIRS,
                          "kp_per_image": KP, "desc_dim": C,
                          "image_wh": [W, H]}}
_t_start = time.time()


def _flush():
    out = dict(shared)
    out["elapsed_s"] = round(time.time() - _t_start, 1)
    ART.write_text(json.dumps(out, indent=1, default=str))


def _watchdog():
    while not shared.get("done"):
        time.sleep(20)
        if time.time() - _t_start > BUDGET_S:
            shared["error"] = f"budget {BUDGET_S}s expired in {shared['phase']}"
            _flush()
            os._exit(3)


def stage(name):
    class _S:
        def __enter__(self):
            shared["phase"] = name
            _flush()
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            if exc[0] is None:
                shared["stages_s"][name] = round(time.time() - self.t0, 2)
            _flush()
            return False
    return _S()


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    from sfd2_tpu.utils.benchtime import enable_compile_cache
    enable_compile_cache(str(ROOT))  # reruns after a wedge recompile fast
    dev = jax.devices()[0]
    shared["platform"] = dev.platform
    rng = np.random.default_rng(404)

    from sfd2_tpu.geometry.cameras import canonicalize_params, project_points
    from sfd2_tpu.geometry.np_pose import pose_error
    from sfd2_tpu.io.colmap_model import Image
    from sfd2_tpu.geometry.cameras import Camera

    cam8 = canonicalize_params("PINHOLE", CAMP)
    cam8_j = jnp.asarray(cam8, jnp.float32)

    # --- GT scene (host: poses only; device: everything heavy) ------------
    with stage("scene_gen"):
        pts = np.stack([
            rng.uniform(-2, SPAN + 2, N_PTS),
            rng.uniform(-2.5, 2.5, N_PTS),
            rng.uniform(8, 15, N_PTS),
        ], 1).astype(np.float32)

        def make_pose(x, jitter):
            from scipy.spatial.transform import Rotation
            r = Rotation.from_rotvec(rng.normal(size=3) * jitter)
            q = r.as_quat()[[3, 0, 1, 2]]
            t = -r.as_matrix() @ np.array([x, 0.0, 0.0])
            return q, t

        db_q = np.zeros((N_DB, 4)); db_t = np.zeros((N_DB, 3))
        for i in range(N_DB):
            db_q[i], db_t[i] = make_pose(i * SPAN / max(N_DB - 1, 1), 0.01)
        q_x = rng.uniform(0.05 * SPAN, 0.95 * SPAN, N_Q)
        q_q = np.zeros((N_Q, 4)); q_t = np.zeros((N_Q, 3))
        for i in range(N_Q):
            q_q[i], q_t[i] = make_pose(q_x[i], 0.008)

        pts_d = jnp.asarray(pts)
        base_d = jax.jit(
            lambda k: (lambda d: (d / jnp.linalg.norm(d, axis=1, keepdims=True)
                                  ).astype(jnp.bfloat16))(
                jax.random.normal(k, (N_PTS, C), jnp.float32))
        )(jax.random.PRNGKey(11))

        @jax.jit
        def gen_chunk(pts_d, base_d, qv, tv, key):
            """One camera chunk: project → in-frame top-K by a random
            detection score → noisy kp xy + bf16 descriptors."""
            def one(q, t):
                xy, depth = project_points(pts_d, q, t, cam8_j)
                inb = ((depth > 0.1) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8)
                       & (xy[:, 1] > 8) & (xy[:, 1] < H - 8))
                return xy, inb
            xy, inb = jax.vmap(one)(qv, tv)               # [B,N,2] [B,N]
            b = qv.shape[0]
            score = jax.random.uniform(key, (b, N_PTS))
            _, ids = jax.lax.top_k(jnp.where(inb, score, -1.0), KP)
            valid = jnp.take_along_axis(inb, ids, 1)
            kp = jnp.take_along_axis(xy, ids[..., None], 1)
            kp = kp + jax.random.normal(
                jax.random.fold_in(key, 1), kp.shape) * NOISE_PX
            de = base_d[ids.reshape(-1)].reshape(b, KP, C).astype(jnp.float32)
            de = de + jax.random.normal(
                jax.random.fold_in(key, 2), de.shape) * DESC_NOISE
            de = de / jnp.maximum(
                jnp.linalg.norm(de, axis=-1, keepdims=True), 1e-8)
            return (de.astype(jnp.bfloat16), kp.astype(jnp.float32),
                    valid, ids.astype(jnp.int32))

        key0 = jax.random.PRNGKey(17)
        bank_chunks, xy_chunks, valid_chunks = [], [], []
        for s0 in range(0, N_DB, GEN_B):
            b = min(GEN_B, N_DB - s0)
            if b != GEN_B:  # keep one jit shape: pad the last chunk
                padq = np.tile(db_q[-1], (GEN_B, 1)); padq[:b] = db_q[s0:s0+b]
                padt = np.tile(db_t[-1], (GEN_B, 1)); padt[:b] = db_t[s0:s0+b]
            else:
                padq, padt = db_q[s0:s0+GEN_B], db_t[s0:s0+GEN_B]
            de, kp, va, _ = gen_chunk(
                pts_d, base_d, jnp.asarray(padq, jnp.float32),
                jnp.asarray(padt, jnp.float32),
                jax.random.fold_in(key0, s0))
            bank_chunks.append(de[:b]); xy_chunks.append(kp[:b])
            valid_chunks.append(va[:b])
        bank = jnp.concatenate(bank_chunks)      # [N_DB, KP, C] bf16, HBM
        xybuf = jnp.concatenate(xy_chunks)       # [N_DB, KP, 2] f32, HBM
        validbuf = jnp.concatenate(valid_chunks)
        del bank_chunks, xy_chunks, valid_chunks
        bank.block_until_ready()
        db_valid = np.asarray(validbuf)          # [N_DB, KP] small (bools)
        shared["counts"]["db_kp_valid_frac"] = round(
            float(db_valid.mean()), 4)

        # queries: same generator, downloaded (only ~N_Q·KP·C·2 bytes)
        qmul = -(-N_Q // GEN_B)
        q_kp = np.zeros((qmul * GEN_B, KP, 2), np.float32)
        q_de = np.zeros((qmul * GEN_B, KP, C), np.float32)
        q_va = np.zeros((qmul * GEN_B, KP), bool)
        for s0 in range(0, qmul * GEN_B, GEN_B):
            idxs = np.clip(np.arange(s0, s0 + GEN_B), 0, N_Q - 1)
            de, kp, va, _ = gen_chunk(
                pts_d, base_d, jnp.asarray(q_q[idxs], jnp.float32),
                jnp.asarray(q_t[idxs], jnp.float32),
                jax.random.fold_in(key0, 10_000 + s0))
            q_de[s0:s0+GEN_B] = np.asarray(de.astype(jnp.float16), np.float32)
            q_kp[s0:s0+GEN_B] = np.asarray(kp)
            q_va[s0:s0+GEN_B] = np.asarray(va)
        q_kp, q_de, q_va = q_kp[:N_Q], q_de[:N_Q], q_va[:N_Q]

        try:
            shared["counts"]["hbm_peak_gb_after_gen"] = round(
                dev.memory_stats()["peak_bytes_in_use"] / 1e9, 2)
        except Exception:
            pass

    # --- pairs (sfm/pairs.py::pairs_from_poses) ---------------------------
    with stage("pairs"):
        images_gt = {
            i + 1: Image(i + 1, db_q[i], db_t[i], 1, f"db/{i+1:05d}.jpg",
                         np.zeros((0, 2)), np.zeros(0, np.int64))
            for i in range(N_DB)
        }
        from sfd2_tpu.sfm.pairs import pairs_from_poses
        name2row = {f"db/{i+1:05d}.jpg": i for i in range(N_DB)}
        prs = pairs_from_poses(images_gt, num_matched=PAIRS)
        pij = np.array([[name2row[a], name2row[b]] for a, b in prs])
        pij = np.unique(np.sort(pij, axis=1), axis=0)
        n_pairs = len(pij)
        shared["counts"]["n_pairs"] = n_pairs

    # --- fused match + two-view verification ------------------------------
    with stage("match_verify"):
        from sfd2_tpu.ops.matching import batch_matcher
        from sfd2_tpu.sfm.twoview import verify_fundamental_ransac
        matcher = batch_matcher("nnm")

        @jax.jit
        def match_verify(bank, validbuf, xybuf, ii, jj, key):
            d0 = jnp.take(bank, ii, 0)
            d1 = jnp.take(bank, jj, 0)
            v0 = jnp.take(validbuf, ii, 0)
            v1 = jnp.take(validbuf, jj, 0)
            m, _ = matcher(d0, d1, v0, v1)
            mv = m >= 0
            sel = jnp.where(mv, 2.0, 0.0) - jnp.arange(KP) * 1e-6
            _, idx = jax.lax.top_k(sel, NM)               # [PB, NM]
            selv = jnp.take_along_axis(mv, idx, 1)
            mj = jnp.take_along_axis(jnp.maximum(m, 0), idx, 1)
            xyflat = xybuf.reshape(-1, 2)
            xy1 = jnp.take(xyflat, ii[:, None] * KP + idx, 0)
            xy2 = jnp.take(xyflat, jj[:, None] * KP + mj, 0)
            keys = jax.random.split(key, ii.shape[0])
            res = jax.vmap(
                lambda a, b2, v, k2: verify_fundamental_ransac(
                    a, b2, v, 4.0, k2, num_hypotheses=HYP))(
                xy1, xy2, selv, keys)
            inl = res.inliers & selv & res.success[:, None]
            return (idx.astype(jnp.int16), mj.astype(jnp.int16), inl,
                    res.num_inliers, res.success)

        pad_pairs = -(-n_pairs // PB) * PB
        pij_pad = np.zeros((pad_pairs, 2), np.int32)
        pij_pad[:n_pairs] = pij
        kmv = jax.random.PRNGKey(23)
        futures = []
        edge_i, edge_j = [], []
        n_verified = 0
        inlier_counts = []
        WINDOW = 24

        def _drain(fut, lo):
            nonlocal n_verified
            idx, mj, inl, ninl, succ = [np.asarray(x) for x in fut]
            hi = min(lo + PB, n_pairs)
            nloc = hi - lo
            idx, mj, inl = idx[:nloc], mj[:nloc], inl[:nloc]
            succ = succ[:nloc].astype(bool)
            inl = inl & succ[:, None]
            n_verified += int(succ.sum())
            inlier_counts.append(ninl[:nloc][succ])
            pi = pij_pad[lo:hi, 0][:, None] * np.int64(KP)
            pj = pij_pad[lo:hi, 1][:, None] * np.int64(KP)
            edge_i.append((pi + idx)[inl])
            edge_j.append((pj + mj)[inl])

        lo_q = []
        for lo in range(0, pad_pairs, PB):
            fut = match_verify(
                bank, validbuf, xybuf,
                jnp.asarray(pij_pad[lo:lo+PB, 0]),
                jnp.asarray(pij_pad[lo:lo+PB, 1]),
                jax.random.fold_in(kmv, lo))
            futures.append(fut); lo_q.append(lo)
            if len(futures) > WINDOW:
                _drain(futures.pop(0), lo_q.pop(0))
        while futures:
            _drain(futures.pop(0), lo_q.pop(0))
        edges = np.stack([np.concatenate(edge_i), np.concatenate(edge_j)], 1)
        inlier_counts = (np.concatenate(inlier_counts)
                         if inlier_counts else np.zeros(0))
        shared["counts"]["n_pairs_verified"] = n_verified
        shared["counts"]["n_match_edges"] = int(len(edges))
        shared["counts"]["mean_inliers_per_pair"] = round(
            float(inlier_counts.mean()), 1) if len(inlier_counts) else 0.0
    shared["counts"]["match_verify_pairs_per_s"] = round(
        n_pairs / max(shared["stages_s"]["match_verify"], 1e-9), 1)
    _flush()

    # --- tracks (C++ union-find, vectorised assembly) ---------------------
    with stage("tracks"):
        from sfd2_tpu.sfm.tracks import build_tracks_arrays
        obs_img, obs_kp, obs_track, n_tracks = build_tracks_arrays(
            N_DB, KP, edges, min_track_length=2)
        shared["counts"]["n_tracks"] = int(n_tracks)
        shared["counts"]["n_obs"] = int(len(obs_img))
        shared["counts"]["mean_track_len"] = round(
            len(obs_img) / max(n_tracks, 1), 2)

    # --- multi-view triangulation (device, gathers from resident xy) ------
    with stage("triangulate"):
        from sfd2_tpu.sfm.triangulation import triangulate_tracks
        # ≤ T_CAP obs per track, stride-sampled (vectorised).
        lens = np.bincount(obs_track, minlength=n_tracks)
        starts = np.zeros(n_tracks + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        pos = np.arange(len(obs_track)) - starts[obs_track]
        slot = (pos * T_CAP) // np.maximum(lens[obs_track], 1)
        first_in_slot = np.ones(len(obs_track), bool)
        first_in_slot[1:] = ((obs_track[1:] != obs_track[:-1])
                             | (slot[1:] != slot[:-1]))
        sel = first_in_slot
        t_sel, i_sel, k_sel = obs_track[sel], obs_img[sel], obs_kp[sel]
        new_track_start = np.ones(len(t_sel), bool)
        new_track_start[1:] = t_sel[1:] != t_sel[:-1]
        run = np.arange(len(t_sel))
        pos_sel = run - np.maximum.accumulate(np.where(new_track_start, run, 0))
        cam_tab = np.zeros((n_tracks, T_CAP), np.int32)
        kp_tab = np.zeros((n_tracks, T_CAP), np.int32)
        mask_tab = np.zeros((n_tracks, T_CAP), bool)
        cam_tab[t_sel, pos_sel] = i_sel
        kp_tab[t_sel, pos_sel] = k_sel
        mask_tab[t_sel, pos_sel] = True

        qv_all = jnp.asarray(db_q, jnp.float32)
        tv_all = jnp.asarray(db_t, jnp.float32)

        @jax.jit
        def tri_chunk(xybuf, qv_all, tv_all, cam_idx, kp_idx, mask):
            xyflat = xybuf.reshape(-1, 2)
            oxy = jnp.take(xyflat,
                           cam_idx.astype(jnp.int32) * KP + kp_idx, 0)
            qv = jnp.take(qv_all, cam_idx, 0)
            tv = jnp.take(tv_all, cam_idx, 0)
            camt = jnp.broadcast_to(cam8_j, (*cam_idx.shape, 8))
            r = triangulate_tracks(oxy, mask, qv, tv, camt)
            return r.xyz, r.valid, r.errors, r.obs_inlier

        pad_tracks = -(-n_tracks // TRI_P) * TRI_P
        xyz = np.zeros((pad_tracks, 3), np.float32)
        tvalid = np.zeros(pad_tracks, bool)
        terr = np.zeros(pad_tracks, np.float32)
        obs_ok_tab = np.zeros((pad_tracks, T_CAP), bool)
        tri_t0 = time.time()
        for s0 in range(0, pad_tracks, TRI_P):
            ct = np.zeros((TRI_P, T_CAP), np.int32)
            kt = np.zeros((TRI_P, T_CAP), np.int32)
            mt = np.zeros((TRI_P, T_CAP), bool)
            n_here = min(TRI_P, n_tracks - s0) if s0 < n_tracks else 0
            if n_here > 0:
                ct[:n_here] = cam_tab[s0:s0+n_here]
                kt[:n_here] = kp_tab[s0:s0+n_here]
                mt[:n_here] = mask_tab[s0:s0+n_here]
            x, v, e, oo = tri_chunk(xybuf, qv_all, tv_all,
                                    jnp.asarray(ct), jnp.asarray(kt),
                                    jnp.asarray(mt))
            xyz[s0:s0+TRI_P] = np.asarray(x)
            tvalid[s0:s0+TRI_P] = np.asarray(v)
            terr[s0:s0+TRI_P] = np.asarray(e)
            obs_ok_tab[s0:s0+TRI_P] = np.asarray(oo)
        tri_s = time.time() - tri_t0
        xyz, tvalid, terr = xyz[:n_tracks], tvalid[:n_tracks], terr[:n_tracks]
        obs_ok_tab = obs_ok_tab[:n_tracks]
        shared["counts"]["n_points_triangulated"] = int(tvalid.sum())
        shared["counts"]["triang_mpts_per_s"] = round(
            n_tracks / max(tri_s, 1e-9) / 1e6, 2)
        shared["counts"]["mean_reproj_err_px"] = round(
            float(terr[tvalid].mean()), 3) if tvalid.any() else -1.0

    # --- final map arrays (valid tracks, inlier observations) -------------
    with stage("map_arrays"):
        final_row = np.cumsum(tvalid) - 1            # track → point row
        keep_obs = tvalid[t_sel] & obs_ok_tab[t_sel, pos_sel]
        f_img = i_sel[keep_obs]
        f_kp = k_sel[keep_obs]
        f_pt = final_row[t_sel[keep_obs]]
        n_points = int(tvalid.sum())
        point_xyz = xyz[tvalid]
        track_len = np.bincount(f_pt, minlength=n_points).astype(np.int32)
        shared["counts"]["n_points_final"] = n_points
        shared["counts"]["n_obs_final"] = int(len(f_img))

    # --- bundle adjustment (device) ---------------------------------------
    if RUN_BA:
        with stage("ba"):
            try:
                from sfd2_tpu.sfm.ba import BAProblem, bundle_adjust
                m_all = len(f_img)
                if m_all > BA_MAX_OBS:
                    sub = rng.choice(m_all, BA_MAX_OBS, replace=False)
                    sub.sort()
                else:
                    sub = np.arange(m_all)
                bi, bk, bp = f_img[sub], f_kp[sub], f_pt[sub]
                # The remote compile helper dies on the full 1.6M-point
                # graph (HTTP 500, same class as the lax.scan SIGABRT in
                # CLAUDE.md). Windowed BA is the standard fallback at
                # map scale: restrict to a camera window and the points
                # it observes, remapped dense.
                win = _env("SCALE_BA_CAMS", 1024)
                if len(np.unique(bp)) > _env("SCALE_BA_MAX_PTS", 400_000):
                    inwin = bi < win
                    bi, bk, bp = bi[inwin], bk[inwin], bp[inwin]
                    upts, bp = np.unique(bp, return_inverse=True)
                    shared["counts"]["ba_window_cams"] = win
                    shared["counts"]["ba_window_pts"] = int(len(upts))
                else:
                    upts = np.arange(n_points)

                @jax.jit
                def ba_obs_xy(xybuf, ci, ki):
                    return jnp.take(xybuf.reshape(-1, 2),
                                    ci.astype(jnp.int32) * KP + ki, 0)

                oxy = ba_obs_xy(xybuf, jnp.asarray(bi), jnp.asarray(bk))
                fixed = np.zeros(N_DB, bool)
                fixed[:2] = True
                problem = BAProblem(
                    obs_xy=oxy,
                    obs_cam=jnp.asarray(bi, jnp.int32),
                    obs_point=jnp.asarray(bp, jnp.int32),
                    obs_w=jnp.ones(len(bi), jnp.float32),
                    qvecs=qv_all, tvecs=tv_all,
                    cam_params=jnp.tile(cam8_j[None], (N_DB, 1)),
                    points=jnp.asarray(point_xyz[upts], jnp.float32),
                    fixed_cams=jnp.asarray(fixed),
                )
                ba_fn = jax.jit(lambda p: bundle_adjust(
                    p, lm_iters=2, cg_iters=8))
                t0 = time.time()
                res = ba_fn(problem)
                ic = float(res.initial_cost); fc = float(res.final_cost)
                shared["counts"]["ba_obs"] = int(len(bi))
                shared["counts"]["ba_initial_cost"] = round(ic, 4)
                shared["counts"]["ba_final_cost"] = round(fc, 4)
                point_xyz = point_xyz.astype(np.float64)
                point_xyz[upts] = np.asarray(res.points, np.float64)
                db_q_ba = np.asarray(res.qvecs, np.float64)
                db_t_ba = np.asarray(res.tvecs, np.float64)
                del problem, oxy, res  # free HBM before bank slicing
            except Exception as e:
                shared["counts"]["ba_error"] = f"{type(e).__name__}: {e}"[:300]
                db_q_ba, db_t_ba = db_q, db_t
    else:
        db_q_ba, db_t_ba = db_q, db_t

    # --- MapIndex (vectorised constructor) --------------------------------
    with stage("map_index"):
        from sfd2_tpu.sfm.map_index import MapIndex
        prow_all = np.full((N_DB, KP), -1, np.int64)
        prow_all[f_img, f_kp] = f_pt
        cameras = {1: Camera(1, "PINHOLE", W, H, np.array(CAMP))}
        images = {
            i + 1: Image(i + 1, db_q_ba[i], db_t_ba[i], 1,
                         f"db/{i+1:05d}.jpg", np.zeros((0, 2)),
                         None)
            for i in range(N_DB)
        }
        map_index = MapIndex.from_arrays(
            cameras, images, {i + 1: prow_all[i] for i in range(N_DB)},
            point_xyz, track_len)
        try:
            shared["counts"]["hbm_peak_gb"] = round(
                dev.memory_stats()["peak_bytes_in_use"] / 1e9, 2)
        except Exception:
            pass

    # --- engine: inject device-born banks, write query store --------------
    with stage("engine_setup"):
        import tempfile
        from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
        from sfd2_tpu.localization.engine import (LocalizationEngine,
                                                  LocalizerConfig)
        store_path = Path(tempfile.mkdtemp()) / "queries.h5"
        with FeatureStore(store_path, "w") as fs:
            for qi in range(N_Q):
                nv = int(q_va[qi].sum())
                fs.write(f"q/{qi:03d}.jpg", ImageFeatures(
                    q_kp[qi][:nv], q_de[qi][:nv],
                    np.linspace(1, 0.5, nv, dtype=np.float32), None))
        fs = FeatureStore(store_path, "r")
        cfg = LocalizerConfig(max_keypoints=KP,
                              db_cache_images=N_DB + 16)
        eng = LocalizationEngine(map_index, fs, cfg)
        # extract→localize HBM handoff: per-image bank views of the
        # resident buffer (sliced once; the big buffer is freed after).
        for i in range(N_DB):
            eng.inject_db_features(i + 1, np.zeros((KP, 2), np.float32),
                                   bank[i], db_valid[i])
        del bank, validbuf
        retr = np.argsort(
            np.abs(np.arange(N_DB) * SPAN / max(N_DB - 1, 1)
                   - q_x[:, None]), axis=1)[:, :TOPQ] + 1

    # --- localization at scale (batched throughput path) ------------------
    with stage("localize"):
        qinfo = ("PINHOLE", W, H, np.asarray(CAMP))
        jobs = [(f"q/{qi:03d}.jpg", qinfo, [[int(j)] for j in retr[qi]])
                for qi in range(N_Q)]
        stats: dict = {}

        def _live():  # localize is compile-heavy on a cold cache; show it
            while shared["phase"] == "localize":
                shared["localize_phase_s"] = {
                    k: round(v, 2) for k, v in dict(stats).items()}
                _flush()
                time.sleep(15)
        threading.Thread(target=_live, daemon=True).start()
        t0 = time.time()
        results = eng.localize_throughput(jobs, stats=stats)
        loc_s = time.time() - t0
        n_acc = sum(1 for r in results if r.source != "retrieval_fallback")
        errs = [pose_error(r.qvec, r.tvec, q_q[i], q_t[i])
                for i, r in enumerate(results)]
        q_errs = np.array([e[0] for e in errs])
        t_errs = np.array([e[1] for e in errs])
        shared["counts"]["queries_accepted"] = f"{n_acc}/{N_Q}"
        shared["qps_at_scale"] = round(N_Q / loc_s, 2)
        shared["query_ms_at_scale"] = round(loc_s / N_Q * 1e3, 1)
        shared["recall_025m_2deg"] = round(
            float(np.mean((t_errs < 0.25) & (q_errs < 2.0))), 3)
        shared["recall_05m_5deg"] = round(
            float(np.mean((t_errs < 0.5) & (q_errs < 5.0))), 3)
        shared["med_terr_m"] = round(float(np.median(t_errs)), 4)
        shared["med_rerr_deg"] = round(float(np.median(q_errs)), 3)
        shared["localize_phase_s"] = {
            k: round(v, 2) for k, v in stats.items()}

    shared["mapbuild_wall_s"] = round(sum(
        shared["stages_s"].get(k, 0.0)
        for k in ("pairs", "match_verify", "tracks", "triangulate",
                  "ba", "map_arrays", "map_index")), 1)
    shared["total_wall_s"] = round(time.time() - _t_start, 1)
    shared["done"] = True
    shared["phase"] = "done"
    _flush()
    print(json.dumps({
        "metric": "scale_rehearsal",
        "n_db": N_DB, "n_points": shared["counts"].get("n_points_final"),
        "mapbuild_wall_s": shared["mapbuild_wall_s"],
        "qps_at_scale": shared.get("qps_at_scale"),
        "recall_025m_2deg": shared.get("recall_025m_2deg"),
    }))


if __name__ == "__main__":
    main()
