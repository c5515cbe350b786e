"""Hierarchical localization engine (it_loc semantics, TPU-batched).

Capability parity: ``it_loc/localize_cv2.py`` —
``pose_from_cluster_with_matcher:652`` (per-cluster 2D-3D matching, PnP,
per-DB-image consensus gates, covisibility refinement, graded fallbacks)
and ``pose_refinement_covisibility:236`` (frame expansion, re-matching,
radius gate, iterative opt_th re-selection + pose refinement).

TPU-native redesign (SURVEY §7.1):
* the reference matches the query against each DB image in its own CUDA
  call (HOT LOOP #1/#2, §3.1); here all candidate DB descriptor banks are
  stacked [D, K, C] and matched in ONE batched GEMM program per cluster /
  refinement round, with D padded to a small set of bucket sizes so the
  jit cache stays warm;
* PnP-RANSAC and LM refinement run on device with padded correspondence
  arrays (`sfd2_tpu.localization.ransac`);
* irregular graph work (dedup, covisibility ranking) stays host-side on
  the CSR ``MapIndex``.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.geometry.np_pose import qvec_to_rotmat
from sfd2_tpu.io.feature_store import FeatureStore
from sfd2_tpu.localization.ransac import pnp_ransac
from sfd2_tpu.ops.matching import batch_matcher
from sfd2_tpu.sfm.map_index import MapIndex

_D_BUCKETS = (1, 4, 8, 16, 32, 64, 128)


def _bucket(d: int) -> int:
    for b in _D_BUCKETS:
        if d <= b:
            return b
    return ((d + 127) // 128) * 128


# ---------------------------------------------------------------------------
# Packed device programs: every result is concatenated into ONE f32 vector
# so the host fetches it with a single transfer. On the relay-backed TPU
# each blocking device→host fetch costs a full RPC round-trip (~25-100 ms,
# CLAUDE.md); the unpacked PnP result alone (qvec/tvec/inliers/num/success)
# was five of them per call. Counts and 0/1 flags are exact in f32.

@functools.lru_cache(maxsize=None)
def _packed_pnp(num_hypotheses: int):
    @jax.jit
    def f(kp, p3, cam8, va, thresh, key):
        res = pnp_ransac(kp, p3, cam8, va, threshold=thresh, key=key,
                         num_hypotheses=num_hypotheses)
        return jnp.concatenate([
            res.qvec.astype(jnp.float32),
            res.tvec.astype(jnp.float32),
            jnp.stack([res.num_inliers.astype(jnp.float32),
                       res.success.astype(jnp.float32)]),
            res.inliers.astype(jnp.float32),
        ])

    return f


@functools.lru_cache(maxsize=None)
def _packed_refine(iters: int):
    from sfd2_tpu.localization.pnp import refine_pose_iterative

    @jax.jit
    def f(qvec, tvec, p3, kp, cam8, ms, thresh):
        q_r, t_r, num_r, nums = refine_pose_iterative(
            qvec, tvec, p3, kp, cam8, ms, thresh, iters=iters)
        return jnp.concatenate([
            q_r.astype(jnp.float32),
            t_r.astype(jnp.float32),
            jnp.stack([num_r.astype(jnp.float32)]),
            nums.astype(jnp.float32),
        ])

    return f


@functools.lru_cache(maxsize=None)
def _packed_pnp_batch(num_hypotheses: int):
    """vmapped packed PnP: every still-active query's RANSAC in ONE
    dispatch (localize_throughput)."""

    @jax.jit
    def f(kp, p3, cam8, va, thresh, base_key):
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            base_key, jnp.arange(kp.shape[0]))

        def one(kp, p3, cam8, va, key):
            res = pnp_ransac(kp, p3, cam8, va, threshold=thresh, key=key,
                             num_hypotheses=num_hypotheses)
            return jnp.concatenate([
                res.qvec.astype(jnp.float32),
                res.tvec.astype(jnp.float32),
                jnp.stack([res.num_inliers.astype(jnp.float32),
                           res.success.astype(jnp.float32)]),
                res.inliers.astype(jnp.float32),
            ])

        return jax.vmap(one)(kp, p3, cam8, va, keys)

    return f


@functools.lru_cache(maxsize=None)
def _packed_refine_batch(iters: int):
    from sfd2_tpu.localization.pnp import refine_pose_iterative

    @jax.jit
    def f(qvec, tvec, p3, kp, cam8, ms, thresh):
        def one(qvec, tvec, p3, kp, cam8, ms):
            q_r, t_r, num_r, nums = refine_pose_iterative(
                qvec, tvec, p3, kp, cam8, ms, thresh, iters=iters)
            return jnp.concatenate([
                q_r.astype(jnp.float32),
                t_r.astype(jnp.float32),
                jnp.stack([num_r.astype(jnp.float32)]),
                nums.astype(jnp.float32),
            ])

        return jax.vmap(one)(qvec, tvec, p3, kp, cam8, ms)

    return f


@functools.lru_cache(maxsize=None)
def _device_prng(seed: int):
    """Device-resident PRNGKey per seed (a host-made key re-uploads ~1 ms
    through the relay on every call)."""
    return jax.device_put(jax.random.PRNGKey(seed))


def _np_project(points3d, qvec, tvec, cam8):
    rot = qvec_to_rotmat(np.asarray(qvec, float))
    pc = points3d @ rot.T + np.asarray(tvec, float)
    z = np.where(np.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    x, y = pc[:, 0] / z, pc[:, 1] / z
    k1, k2, p1, p2 = cam8[4:8]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([cam8[0] * xd + cam8[2], cam8[1] * yd + cam8[3]], axis=1), z


@dataclasses.dataclass
class LocalizerConfig:
    """Per-dataset knobs (defaults = Aachen, ``test_aachenv_1_1:54-80``)."""

    ransac_thresh: float = 15.0
    opt_thresh: float = 15.0
    inlier_thresh: int = 10
    covisibility_frame: int = 50
    iters: int = 5
    radius: float = 30.0
    obs_thresh: int = 3
    opt_type: str = "clurefobs"  # clu|ref|obs|pos flags, reference-style
    do_covisibility_opt: bool = True
    max_keypoints: int = 4096
    num_hypotheses: int = 1024
    matcher: str = "nnm"  # nnm | nnml (label-aware, it_loc/matcher.py:239)
    # Floor for the padded correspondence-array size fed to PnP/refine.
    # Per-query match counts vary, and every new power-of-2 bucket is a
    # fresh jit compile (minutes through the remote-TPU compile helper);
    # a floor ≥ the typical count pins everything to ONE program.
    pnp_pad_floor: int = 64
    # LRU capacity (images) of the host feature cache AND the HBM bank
    # cache. At Aachen scale (~6.7k DB images, ~1 MB/bank bf16) the whole
    # map fits in HBM — raise this so injected banks are never evicted.
    db_cache_images: int = 1024


@dataclasses.dataclass
class QueryResult:
    qvec: np.ndarray
    tvec: np.ndarray
    num_inliers: int
    log: str = ""
    source: str = ""  # accepted | best_fallback | retrieval_fallback


class LocalizationEngine:
    def __init__(
        self,
        map_index: MapIndex,
        feature_store: FeatureStore,
        config: LocalizerConfig = LocalizerConfig(),
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — the
        per-query candidate DB bank is sharded over it and matched with
        the shard_map program (SURVEY §7.1), one shard per device."""
        self.map = map_index
        self.features = feature_store
        self.cfg = config
        self.mesh = mesh
        # LRU-bounded cache: padded DB features are ~2 MB each (K=4096,
        # C=128), an unbounded dict would grow to tens of GB over a full
        # benchmark query set.
        from collections import OrderedDict

        self._db_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._db_cache_max = config.db_cache_images
        # Device-resident DB banks: each image's padded descriptors are
        # uploaded ONCE and stay in HBM (~2 MB each at K=4096); re-sending
        # the bank per query costs seconds through the relay (CLAUDE.md
        # "uploads are slow") and is wasted host→HBM traffic anywhere.
        self._db_dev_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._dev_zero_entry = None
        # dtype of the device descriptor banks: f32 when uploaded from the
        # host store, bf16 when injected device-born (inject_db_features)
        # — the Pallas matcher runs either at full MXU rate.
        self._bank_dtype = jnp.float32
        # localize() is thread-safe (see localize_many): the shared LRU
        # caches and the (non-thread-safe) HDF5 feature store are the only
        # cross-query mutable state, guarded by this lock. JAX dispatch
        # itself is thread-safe and the static-shape design means every
        # thread hits the same compiled programs.
        self._cache_lock = threading.RLock()
        # Fused Pallas matcher on TPU, XLA elsewhere; 'nnml' adds
        # semantic-label compatibility masking (it_loc/matcher.py:239).
        self._matcher = batch_matcher(self.cfg.matcher)
        self._label_aware = self.cfg.matcher == "nnml"

        # The query is broadcast against the bank IN-GRAPH: uploading a
        # host-materialised [D, K, C] broadcast copies the query D times
        # over the wire.
        # Matches are fetched as int16 when K fits (-1 sentinel and
        # indices < 32768): a [64, 4096] match table is 0.5 MB instead of
        # 2 MB per query through the relay — the largest device→host
        # transfer on the query path.
        fetch_dt = jnp.int16 if self.cfg.max_keypoints < 32768 else jnp.int32
        matcher = self._matcher
        if self._label_aware:
            def _mq(q, bank, qv, bv, ql, bl):
                d = bank.shape[0]
                q = q.astype(bank.dtype)  # bf16 banks → bf16 GEMM operands
                m, s = matcher(
                    jnp.broadcast_to(q[None], (d, *q.shape)), bank,
                    jnp.broadcast_to(qv[None], (d, qv.shape[0])), bv,
                    jnp.broadcast_to(ql[None], (d, ql.shape[0])), bl,
                )
                return m.astype(fetch_dt), s
        else:
            def _mq(q, bank, qv, bv):
                d = bank.shape[0]
                q = q.astype(bank.dtype)  # bf16 banks → bf16 GEMM operands
                m, s = matcher(
                    jnp.broadcast_to(q[None], (d, *q.shape)), bank,
                    jnp.broadcast_to(qv[None], (d, qv.shape[0])), bv,
                )
                return m.astype(fetch_dt), s
        self._matcher_q = jax.jit(_mq)

    # ------------------------------------------------------------------
    def _db_feats(self, image_id: int):
        """Padded (kp, desc, valid3d, p3d_rows, labels) for a DB image,
        LRU-cached."""
        name = self.map.images[image_id].name
        with self._cache_lock:
            if name in self._db_cache:
                self._db_cache.move_to_end(name)
                return self._db_cache[name]
            k = self.cfg.max_keypoints
            kp, desc, _, valid, labels = self.features.read_padded(
                name, k, with_labels=True
            )
            prow_full = self.map.p3d_rows_per_image[self.map.image_row[image_id]]
            prow = np.full(k, -1, np.int64)
            n = min(len(prow_full), k)
            prow[:n] = prow_full[:n]
            valid3d = valid & (prow >= 0)
            entry = (kp, desc, valid3d, prow, labels)
            self._db_cache[name] = entry
            if len(self._db_cache) > self._db_cache_max:
                self._db_cache.popitem(last=False)
            return entry

    def _db_feats_dev(self, image_id: int):
        """Device-resident (desc [K,C], valid3d [K], labels [K]) for a DB
        image — uploaded once, LRU-cached in HBM. The reference's ≤3-valid
        bail-out (it_loc/localize_cv2.py:530) is baked into the mask."""
        name = self.map.images[image_id].name
        with self._cache_lock:
            if name in self._db_dev_cache:
                self._db_dev_cache.move_to_end(name)
                return self._db_dev_cache[name]
            _, desc, valid3d, _, labels = self._db_feats(image_id)
            v = valid3d if valid3d.sum() > 3 else np.zeros_like(valid3d)
            entry = (
                jnp.asarray(desc), jnp.asarray(v),
                jnp.asarray(labels) if self._label_aware else None,
            )
            self._db_dev_cache[name] = entry
            if len(self._db_dev_cache) > self._db_cache_max:
                self._db_dev_cache.popitem(last=False)
            return entry

    def _dev_zero(self, c: int):
        """Padding entry for bank slots past len(db_ids) (bank dtype)."""
        with self._cache_lock:
            if self._dev_zero_entry is None or \
                    self._dev_zero_entry[0].shape[1] != c or \
                    self._dev_zero_entry[0].dtype != self._bank_dtype:
                k = self.cfg.max_keypoints
                self._dev_zero_entry = (
                    jnp.zeros((k, c), self._bank_dtype), jnp.zeros(k, bool),
                    jnp.zeros(k, jnp.int32) if self._label_aware else None,
                )
            return self._dev_zero_entry

    # ------------------------------------------------------------------
    def inject_db_features(self, image_id: int, kp: np.ndarray,
                           desc_dev, valid: np.ndarray, labels=None):
        """Device-resident extract→localize handoff: register a DB image
        whose descriptors were born ON DEVICE (`desc_dev` [K, C], any
        float dtype — bf16 recommended) and never crossed the relay.

        The reference pipeline round-trips features through an HDF5 store
        (extract_localization.py → localize_cv2.py); at map scale that
        costs a multi-GB host↔HBM transfer. Here extraction output stays
        in HBM and only the host-side metadata (kp xy + 3D-point rows,
        used by 2D-3D assembly) is registered. Set
        `LocalizerConfig.db_cache_images ≥ #DB images` so injected banks
        are never evicted (eviction would fall back to the store, which
        does not hold these descriptors)."""
        name = self.map.images[image_id].name
        k = self.cfg.max_keypoints
        prow_full = self.map.p3d_rows_per_image[self.map.image_row[image_id]]
        prow = np.full(k, -1, np.int64)
        n = min(len(prow_full), k)
        prow[:n] = prow_full[:n]
        valid3d = np.asarray(valid, bool) & (prow >= 0)
        # Reference bails out when ≤3 valid 3D rows (localize_cv2.py:530).
        v = valid3d if valid3d.sum() > 3 else np.zeros_like(valid3d)
        with self._cache_lock:
            self._bank_dtype = desc_dev.dtype
            self._db_cache[name] = (kp, None, valid3d, prow,
                                    np.zeros(k, np.int32))
            self._db_dev_cache[name] = (
                desc_dev, jnp.asarray(v),
                jnp.zeros(k, jnp.int32) if self._label_aware else None,
            )

    def _match_query_to_dbs(self, q_desc, q_valid, db_ids: Sequence[int],
                            q_labels=None):
        """One batched mutual-NN launch: query vs every candidate DB bank,
        DB rows restricted to keypoints with valid 3D points
        (``feature_matching`` restriction, ``it_loc/localize_cv2.py:530``).
        Returns matches [D, K] (−1 sentinel)."""
        d_pad = _bucket(len(db_ids))
        if self.mesh is not None:
            n_dev = self.mesh.shape["data"]
            d_pad = ((d_pad + n_dev - 1) // n_dev) * n_dev
        k = self.cfg.max_keypoints
        c = q_desc.shape[1]
        ql = q_labels if q_labels is not None else np.zeros(k, np.int32)
        if self.mesh is not None:
            from sfd2_tpu.ops.sharded_match import query_vs_sharded_bank

            db_desc = np.zeros((d_pad, k, c), np.float32)
            db_valid = np.zeros((d_pad, k), bool)
            db_labels = np.zeros((d_pad, k), np.int32)
            for i, iid in enumerate(db_ids):
                _, desc, valid3d, _, labels = self._db_feats(iid)
                db_desc[i] = desc
                db_labels[i] = labels
                # Reference bails out when ≤3 valid 3D rows.
                if valid3d.sum() > 3:
                    db_valid[i] = valid3d
            matches, _ = query_vs_sharded_bank(
                self.mesh,
                jnp.asarray(q_desc), jnp.asarray(db_desc),
                jnp.asarray(q_valid), jnp.asarray(db_valid),
                jnp.asarray(ql) if self._label_aware else None,
                jnp.asarray(db_labels) if self._label_aware else None,
            )
            return np.asarray(matches)[: len(db_ids)]
        # Single-chip path: stack HBM-cached per-image banks on device
        # (no descriptor re-upload), broadcast the query in-graph.
        entries = [self._db_feats_dev(iid) for iid in db_ids]
        entries += [self._dev_zero(c)] * (d_pad - len(db_ids))
        bank = jnp.stack([e[0] for e in entries])
        bval = jnp.stack([e[1] for e in entries])
        args = [jnp.asarray(q_desc), bank, jnp.asarray(q_valid), bval]
        if self._label_aware:
            args += [jnp.asarray(ql), jnp.stack([e[2] for e in entries])]
        matches, _ = self._matcher_q(*args)
        return np.asarray(matches)[: len(db_ids)].astype(np.int64)

    # ------------------------------------------------------------------
    def _assemble_2d3d(
        self,
        kpq: np.ndarray,
        matches: np.ndarray,
        db_ids: Sequence[int],
        obs_th: int,
        dedup: Dict[int, set],
        gate_pose: Optional[tuple] = None,
        cam8: Optional[np.ndarray] = None,
        radius: float = 0.0,
    ):
        """2D-3D correspondence assembly with (qid, p3d) dedup, track-length
        filtering and optional reprojection radius gating
        (``match_cluster_2D:563`` + the refinement gate ``:341-350``).

        Fully vectorised: per-DB filters are boolean masks, the cross-DB
        (qid, point) dedup is a first-occurrence ``np.unique`` over packed
        keys (stable in DB order — reference iterates DBs in order too),
        and the radius gate projects all candidates in one numpy pass.
        """
        all_q, all_p = [], []
        per_db: Dict[int, np.ndarray] = {}
        for di, iid in enumerate(db_ids):
            _, _, _, prow, _ = self._db_feats(iid)
            m = matches[di]
            qidx = np.nonzero(m >= 0)[0]
            rows = prow[m[qidx]]
            ok = rows >= 0
            qidx, rows = qidx[ok], rows[ok]
            ok = self.map.track_len[rows] >= obs_th
            qidx, rows = qidx[ok], rows[ok]
            per_db[iid] = np.stack([qidx, rows], 1) if len(qidx) else np.zeros((0, 2), np.int64)
            all_q.append(qidx)
            all_p.append(rows)

        if not all_q or sum(len(a) for a in all_q) == 0:
            return (
                np.zeros((0, 3)), np.zeros((0, 2)),
                np.zeros(0, np.int64), np.zeros(0, np.int64), per_db,
            )
        q_cat = np.concatenate(all_q).astype(np.int64)
        p_cat = np.concatenate(all_p).astype(np.int64)
        # First occurrence (in DB order) of each (qid, point) pair wins.
        keys = q_cat * (self.map.incidence.shape[1] + 1) + p_cat
        # Also honour an external dedup dict carried across calls.
        if dedup:
            prior = np.array(
                [pr in dedup.get(int(qi), ()) for qi, pr in zip(q_cat, p_cat)]
            )
        else:
            prior = np.zeros(len(q_cat), bool)
        _, first_idx = np.unique(keys, return_index=True)
        keep = np.zeros(len(keys), bool)
        keep[first_idx] = True
        keep &= ~prior
        q_ids = q_cat[keep]
        p3d_rows = p_cat[keep]
        for qi, pr in zip(q_ids, p3d_rows):
            dedup.setdefault(int(qi), set()).add(int(pr))

        mp3d = self.map.point_xyz[p3d_rows]
        mkpq = kpq[q_ids].astype(np.float64)
        if gate_pose is not None and radius > 0 and len(mp3d):
            proj, _ = _np_project(mp3d, gate_pose[0], gate_pose[1], cam8)
            ok = np.linalg.norm(mkpq - proj, axis=1) <= radius
            mp3d, mkpq = mp3d[ok], mkpq[ok]
            p3d_rows, q_ids = p3d_rows[ok], q_ids[ok]
        mkpq = mkpq + 0.5  # COLMAP origin
        return mp3d, mkpq, p3d_rows, q_ids, per_db

    # ------------------------------------------------------------------
    def _pad_bucket(self, n: int) -> int:
        """Power-of-2 pad size with the configured floor (one jit program
        per bucket; see LocalizerConfig.pnp_pad_floor)."""
        return max(self.cfg.pnp_pad_floor, 1 << (max(n, 1) - 1).bit_length())

    def _run_pnp(self, mkpq, mp3d, cam8, thresh, seed=0):
        n = len(mkpq)
        n_pad = self._pad_bucket(n)
        kp = np.zeros((n_pad, 2), np.float32)
        p3 = np.zeros((n_pad, 3), np.float32)
        va = np.zeros(n_pad, bool)
        kp[:n] = mkpq
        p3[:n] = mp3d
        va[:n] = True
        out = np.asarray(_packed_pnp(self.cfg.num_hypotheses)(
            jnp.asarray(kp), jnp.asarray(p3),
            jnp.asarray(cam8, jnp.float32).reshape(8),
            jnp.asarray(va), jnp.float32(thresh), _device_prng(seed),
        ))  # ONE device→host fetch: [qvec(4), tvec(3), num, success, inliers]
        return (
            out[:4].astype(np.float64),
            out[4:7].astype(np.float64),
            out[9:9 + n] > 0.5,
            int(out[7]),
            bool(out[8] > 0.5),
        )

    # ------------------------------------------------------------------
    def refine_covisibility(
        self,
        qname: str,
        cam8: np.ndarray,
        q_feats,
        seed_image_id: int,
        qvec: np.ndarray,
        tvec: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray, int, str]:
        """``pose_refinement_covisibility``: expand frames, re-match, gate by
        reprojection radius, PnP at opt_th, then iters× re-select + refine."""
        cfg = self.cfg
        log = ""
        if "obs" in cfg.opt_type:
            db_ids = self.map.covis_frames_obs(
                seed_image_id,
                covisibility_frame=cfg.covisibility_frame,
                obs_th=cfg.obs_thresh,
                pred_qvec=qvec,
                pred_tvec=tvec,
            )
        elif "pos" in cfg.opt_type:
            db_ids = self.map.covis_frames_pose(
                seed_image_id, qvec, tvec,
                covisibility_frame=cfg.covisibility_frame,
                q_th=10.0, t_th=10.0, obs_th=cfg.obs_thresh,
            )
        else:
            raise ValueError(f"opt_type {cfg.opt_type!r} needs 'obs' or 'pos'")

        kpq, q_desc, q_valid, q_labels = q_feats
        matches = self._match_query_to_dbs(q_desc, q_valid, db_ids, q_labels)
        mp3d, mkpq, p3d_rows, q_ids, _ = self._assemble_2d3d(
            kpq, matches, db_ids, cfg.obs_thresh, dedup={},
            gate_pose=(qvec, tvec), cam8=cam8, radius=cfg.radius,
        )
        log += f"covis refine: {len(db_ids)} frames, {len(mkpq)} matches\n"
        if len(mkpq) < 6:
            return qvec, tvec, 0, log + "too few matches, keep pose\n"

        q_new, t_new, inliers_rsac, num, success = self._run_pnp(
            mkpq, mp3d, cam8, cfg.opt_thresh, seed=1
        )
        if not success:
            return qvec, tvec, 0, log + "refinement RANSAC failed, keep pose\n"
        qvec, tvec = q_new, t_new

        if "ref" in cfg.opt_type and inliers_rsac.sum() >= 10:
            # Fused iterative re-select + LM (ONE jitted dispatch for all
            # cfg.iters rounds instead of a host↔device ping-pong per
            # round — each round-trip costs a full relay RTT), fetched as
            # ONE packed vector [qvec(4), tvec(3), num, nums(iters)].
            n = len(mkpq)
            n_pad = self._pad_bucket(n)
            p3 = np.zeros((n_pad, 3), np.float32)
            kp = np.zeros((n_pad, 2), np.float32)
            ms = np.zeros(n_pad, bool)
            p3[:n], kp[:n], ms[:n] = mp3d, mkpq, inliers_rsac
            out = np.asarray(_packed_refine(cfg.iters)(
                jnp.asarray(qvec, jnp.float32), jnp.asarray(tvec, jnp.float32),
                jnp.asarray(p3), jnp.asarray(kp),
                jnp.asarray(cam8, jnp.float32).reshape(8),
                jnp.asarray(ms), jnp.float32(cfg.opt_thresh),
            ))
            nums = out[8:]
            if int(out[7]) > 0:
                qvec = out[:4].astype(np.float64)
                tvec = out[4:7].astype(np.float64)
                num = int(out[7])
            for it, n_it in enumerate(nums):
                if n_it >= 0:
                    log += f"iter {it+1}: {int(n_it)} inliers\n"
        return qvec, tvec, num, log

    # ------------------------------------------------------------------
    def localize(
        self,
        qname: str,
        qinfo,
        clusters: Sequence[Sequence[int]],
    ) -> QueryResult:
        """``pose_from_cluster_with_matcher`` semantics over candidate
        clusters (each a list of DB image ids, e.g. singletons for
        init_type='sng')."""
        cfg = self.cfg
        model, width, height, params = qinfo
        cam8 = canonicalize_params(model, params)

        k = cfg.max_keypoints
        with self._cache_lock:  # h5py handles are not thread-safe
            kpq, q_desc, _, q_valid, q_labels = self.features.read_padded(
                qname, k, with_labels=True
            )
        # One query upload per localize() call — both match rounds (initial
        # clusters + covisibility re-match) reuse the same device arrays.
        q_desc = jnp.asarray(q_desc)
        q_valid = jnp.asarray(q_valid)
        if q_labels is not None and self._label_aware:
            q_labels = jnp.asarray(q_labels)
        q_feats = (kpq, q_desc, q_valid, q_labels)
        log = ""

        # Lazy-batched matching: the first cluster is matched alone (easy
        # queries accept it and stop — one small launch, like the
        # reference's early exit); on the first miss, ALL remaining
        # candidates are matched in ONE batched launch (the reference
        # re-launches per cluster, §3.1 HOT LOOP #1).
        match_of: Dict[int, np.ndarray] = {}

        def ensure_matched(ci: int):
            cluster = clusters[ci]
            if all(iid in match_of for iid in cluster):
                return
            todo = sorted(
                {iid for c in clusters[ci:] for iid in c if iid not in match_of}
            ) if ci > 0 else sorted(set(cluster))
            m = self._match_query_to_dbs(q_desc, q_valid, todo, q_labels)
            for i, iid in enumerate(todo):
                match_of[iid] = m[i]

        best = {"num_inliers": 0, "qvec": None, "tvec": None, "db_id": None}
        for ci, cluster in enumerate(clusters):
            if not cluster:
                continue
            ensure_matched(ci)
            matches = np.stack([match_of[iid] for iid in cluster])
            mp3d, mkpq, p3d_rows, q_ids, per_db = self._assemble_2d3d(
                kpq, matches, cluster, obs_th=3, dedup={}
            )
            if len(mp3d) < 8:
                log += f"cluster {ci}: only {len(mp3d)} matches, skip\n"
                continue
            qv, tv, inliers, num, success = self._run_pnp(
                mkpq, mp3d, cam8, cfg.ransac_thresh, seed=ci
            )
            if not success:
                log += f"cluster {ci}: PnP failed\n"
                continue

            # Best-single-image consensus (``:745-760``): per DB image,
            # count its (qid → p3d) matches that are PnP inliers.
            assign = np.full(cfg.max_keypoints, -2, np.int64)
            inl_idx = np.nonzero(inliers)[0]
            assign[q_ids[inl_idx]] = p3d_rows[inl_idx]
            best_single, best_db = -1, cluster[0]
            for iid, recs in per_db.items():
                n = int(np.sum(assign[recs[:, 0]] == recs[:, 1])) if len(recs) else 0
                if n > best_single:
                    best_single, best_db = n, iid

            if best_single >= 8 and num > best["num_inliers"]:
                best.update(num_inliers=num, qvec=qv, tvec=tv, db_id=best_db)
            if num < cfg.inlier_thresh or best_single < 10:
                log += f"cluster {ci}: weak ({best_single}/{num} inliers)\n"
                continue

            log += f"cluster {ci}: accepted ({best_single}/{num} inliers)\n"
            if cfg.do_covisibility_opt and "clu" in cfg.opt_type:
                qv, tv, num, rlog = self.refine_covisibility(
                    qname, cam8, q_feats, best_db, qv, tv
                )
                log += rlog
            return QueryResult(qv, tv, num, log, source="accepted")

        if best["num_inliers"] >= 10:
            qv, tv = best["qvec"], best["tvec"]
            if cfg.do_covisibility_opt and "clu" in cfg.opt_type:
                qv, tv, _, rlog = self.refine_covisibility(
                    qname, cam8, q_feats, best["db_id"], qv, tv
                )
                log += rlog
            return QueryResult(qv, tv, 0, log, source="best_fallback")

        # Final fallback: pose of the top retrieved frame (``:1266-1272``).
        top = self.map.images[clusters[0][0]]
        log += f"failed; using pose of {top.name}\n"
        return QueryResult(
            np.array(top.qvec), np.array(top.tvec), -1, log, source="retrieval_fallback"
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _tick(stats, phase: str, t0: float) -> float:
        """Accumulate wall-clock into stats[phase]; returns a new t0."""
        now = time.perf_counter()
        if stats is not None:
            stats[phase] = stats.get(phase, 0.0) + (now - t0)
        return now

    def _batched_match(self, q_feats_dev: List[tuple],
                       banks_per_q: List[List[int]],
                       stats: Optional[Dict[str, float]] = None) -> np.ndarray:
        """One matcher dispatch for several queries: query i vs its
        padded bank group. Returns matches [Q, D, K] (np, −1 sentinel).
        The flattened (query, bank) axis is bucketed like everything
        else so the jit cache stays bounded."""
        k = self.cfg.max_keypoints
        q0 = q_feats_dev[0][0]
        c = q0.shape[1]
        d = max(1, max(len(b) for b in banks_per_q))
        n_total = len(banks_per_q) * d
        # The full-width-stripe matcher kernel register-spills past
        # ~128 stacked pairs (measured: B=512 at K=4096 wants 240 MB of
        # spill slots) — chunk the flattened axis. ALL chunks are
        # dispatched before any is fetched (JAX dispatch is async), so
        # the device pipeline stays full and only one fetch round-trip
        # is exposed per chunk tail.
        t0 = time.perf_counter()
        if n_total > 128:
            per_chunk = max(1, 128 // d)
            devs = [
                self._batched_match_dev(
                    q_feats_dev[s0:s0 + per_chunk],
                    banks_per_q[s0:s0 + per_chunk], d)
                for s0 in range(0, len(banks_per_q), per_chunk)
            ]
            t0 = self._tick(stats, "match_dispatch_s", t0)
            out = np.full((len(banks_per_q), d, k), -1, np.int64)
            s0 = 0
            nbytes = 0
            for dev, nq in devs:
                sub = np.asarray(dev)
                nbytes += sub.nbytes
                out[s0:s0 + nq] = sub[: nq * d].reshape(nq, d, k)
                s0 += nq
            self._tick(stats, "match_fetch_s", t0)
            if stats is not None:
                stats["match_fetch_mb"] = (
                    stats.get("match_fetch_mb", 0.0) + nbytes / 1e6)
            return out
        dev, nq = self._batched_match_dev(q_feats_dev, banks_per_q, d)
        t0 = self._tick(stats, "match_dispatch_s", t0)
        sub = np.asarray(dev)
        self._tick(stats, "match_fetch_s", t0)
        if stats is not None:
            stats["match_fetch_mb"] = (
                stats.get("match_fetch_mb", 0.0) + sub.nbytes / 1e6)
        return sub[: nq * d].reshape(nq, d, k).astype(np.int64)

    def _batched_match_dev(self, q_feats_dev, banks_per_q, d):
        """Dispatch one flattened matcher chunk; returns (device matches
        [n_flat, K] in the fetch dtype, n_queries) WITHOUT blocking."""
        k = self.cfg.max_keypoints
        c = q_feats_dev[0][0].shape[1]
        n_flat = _bucket(len(banks_per_q) * d)
        zero = self._dev_zero(c)
        descs, vals, labs = [], [], []
        for banks in banks_per_q:
            entries = [self._db_feats_dev(i) for i in banks]
            entries += [zero] * (d - len(banks))
            descs += [e[0] for e in entries]
            vals += [e[1] for e in entries]
            labs += [e[2] for e in entries]
        pad = n_flat - len(descs)
        descs += [zero[0]] * pad
        vals += [zero[1]] * pad
        bank = jnp.stack(descs)
        bval = jnp.stack(vals)
        qs = jnp.repeat(jnp.stack([qf[0] for qf in q_feats_dev]), d, axis=0)
        if bank.dtype != qs.dtype:
            qs = qs.astype(bank.dtype)
        qv = jnp.repeat(jnp.stack([qf[1] for qf in q_feats_dev]), d, axis=0)
        qpad = n_flat - qs.shape[0]
        if qpad:
            qs = jnp.concatenate([qs, jnp.zeros((qpad, k, c), qs.dtype)])
            qv = jnp.concatenate([qv, jnp.zeros((qpad, k), bool)])
        args = [qs, bank, qv, bval]
        if self._label_aware:
            labs += [zero[2]] * pad
            ql = jnp.repeat(
                jnp.stack([qf[2] for qf in q_feats_dev]), d, axis=0)
            if qpad:
                ql = jnp.concatenate(
                    [ql, jnp.zeros((qpad, k), jnp.int32)])
            args += [ql, jnp.stack(labs)]
        m, _ = self._matcher(*args)
        fetch_dt = jnp.int16 if k < 32768 else jnp.int32
        return m.astype(fetch_dt), len(banks_per_q)

    def _batched_pnp(self, items: List[tuple], thresh: float,
                     seed_base: int,
                     stats: Optional[Dict[str, float]] = None):
        """items: [(mkpq, mp3d, cam8)] → ONE vmapped PnP dispatch.
        Returns [(qvec, tvec, inliers, num, success)] per item."""
        t0 = time.perf_counter()
        n_pad = self._pad_bucket(max(len(it[0]) for it in items))
        qp = _bucket(len(items))
        kp = np.zeros((qp, n_pad, 2), np.float32)
        p3 = np.zeros((qp, n_pad, 3), np.float32)
        va = np.zeros((qp, n_pad), bool)
        cams = np.zeros((qp, 8), np.float32)
        for i, (mkpq, mp3d, cam8) in enumerate(items):
            n = len(mkpq)
            kp[i, :n], p3[i, :n], va[i, :n] = mkpq, mp3d, True
            cams[i] = np.asarray(cam8, np.float32).reshape(8)
        dev = _packed_pnp_batch(self.cfg.num_hypotheses)(
            jnp.asarray(kp), jnp.asarray(p3), jnp.asarray(cams),
            jnp.asarray(va), jnp.float32(thresh), _device_prng(seed_base),
        )
        t0 = self._tick(stats, "pnp_dispatch_s", t0)
        out = np.asarray(dev)  # [qp, 9 + n_pad]
        self._tick(stats, "pnp_fetch_s", t0)
        res = []
        for i, (mkpq, _, _) in enumerate(items):
            n = len(mkpq)
            res.append((
                out[i, :4].astype(np.float64),
                out[i, 4:7].astype(np.float64),
                out[i, 9:9 + n] > 0.5,
                int(out[i, 7]),
                bool(out[i, 8] > 0.5),
            ))
        return res

    def localize_throughput(
        self,
        jobs: Sequence[Tuple[str, tuple, Sequence[Sequence[int]]]],
        stats: Optional[Dict[str, float]] = None,
    ) -> List[QueryResult]:
        """Batched-across-queries localization: identical per-query
        gates/fallbacks to `localize`, but every device stage (matching,
        PnP-RANSAC, LM refinement) runs ONE dispatch for ALL still-active
        queries, so the per-dispatch relay RTT and launch overhead are
        amortised Q-fold instead of paid per query. Cluster rounds
        proceed in lockstep: round ci matches every remaining query's
        ci-th cluster; queries accept/drop out independently. The
        covisibility refinement pool is likewise matched/refined in one
        dispatch per stage. This is the serving-throughput path the
        reference cannot express (its per-query loop is inherently
        sequential, localize_cv2.py:652)."""
        cfg = self.cfg
        n = len(jobs)
        t0 = time.perf_counter()
        state = []
        for qi, (qname, qinfo, clusters) in enumerate(jobs):
            model, width, height, params = qinfo
            cam8 = canonicalize_params(model, params)
            k = cfg.max_keypoints
            with self._cache_lock:
                kpq, q_desc, _, q_valid, q_labels = self.features.read_padded(
                    qname, k, with_labels=True)
            q_dev = (jnp.asarray(q_desc), jnp.asarray(q_valid),
                     jnp.asarray(q_labels) if self._label_aware and
                     q_labels is not None else None)
            state.append({
                "qname": qname, "cam8": cam8, "kpq": kpq, "q_dev": q_dev,
                "clusters": [c for c in clusters if c], "log": "",
                "best": {"num_inliers": 0, "qvec": None, "tvec": None,
                         "db_id": None},
                "result": None, "refine": None,
            })
        t0 = self._tick(stats, "setup_s", t0)

        max_rounds = max((len(s["clusters"]) for s in state), default=0)
        for ci in range(max_rounds):
            active = [s for s in state
                      if s["result"] is None and s["refine"] is None
                      and ci < len(s["clusters"])]
            if not active:
                break
            matches = self._batched_match(
                [s["q_dev"] for s in active],
                [s["clusters"][ci] for s in active], stats=stats)
            t0 = time.perf_counter()
            pnp_items, pnp_ctx = [], []
            for s, m in zip(active, matches):
                cluster = s["clusters"][ci]
                mp3d, mkpq, p3d_rows, q_ids, per_db = self._assemble_2d3d(
                    s["kpq"], m[: len(cluster)], cluster, obs_th=3, dedup={})
                if len(mp3d) < 8:
                    s["log"] += f"cluster {ci}: only {len(mp3d)} matches, skip\n"
                    continue
                pnp_items.append((mkpq, mp3d, s["cam8"]))
                pnp_ctx.append((s, per_db, p3d_rows, q_ids, cluster))
            t0 = self._tick(stats, "assemble_s", t0)
            if not pnp_items:
                continue
            results = self._batched_pnp(pnp_items, cfg.ransac_thresh,
                                        seed_base=1000 + ci, stats=stats)
            for (s, per_db, p3d_rows, q_ids, cluster), \
                    (qv, tv, inliers, num, success) in zip(pnp_ctx, results):
                if not success:
                    s["log"] += f"cluster {ci}: PnP failed\n"
                    continue
                assign = np.full(cfg.max_keypoints, -2, np.int64)
                inl_idx = np.nonzero(inliers)[0]
                assign[q_ids[inl_idx]] = p3d_rows[inl_idx]
                best_single, best_db = -1, cluster[0]
                for iid, recs in per_db.items():
                    nh = int(np.sum(assign[recs[:, 0]] == recs[:, 1])) \
                        if len(recs) else 0
                    if nh > best_single:
                        best_single, best_db = nh, iid
                b = s["best"]
                if best_single >= 8 and num > b["num_inliers"]:
                    b.update(num_inliers=num, qvec=qv, tvec=tv, db_id=best_db)
                if num < cfg.inlier_thresh or best_single < 10:
                    s["log"] += f"cluster {ci}: weak ({best_single}/{num} inliers)\n"
                    continue
                s["log"] += f"cluster {ci}: accepted ({best_single}/{num} inliers)\n"
                s["refine"] = (best_db, qv, tv, "accepted")

        # Exhausted queries: best-single-image fallback joins the refine
        # pool; the rest take the retrieval fallback (localize():556-569).
        for s in state:
            if s["result"] is not None or s["refine"] is not None:
                continue
            b = s["best"]
            if b["num_inliers"] >= 10:
                s["refine"] = (b["db_id"], b["qvec"], b["tvec"],
                               "best_fallback")
            else:
                top = self.map.images[s["clusters"][0][0]]
                s["log"] += f"failed; using pose of {top.name}\n"
                s["result"] = QueryResult(
                    np.array(top.qvec), np.array(top.tvec), -1, s["log"],
                    source="retrieval_fallback")

        # --- batched covisibility refinement ----------------------------
        pool = [s for s in state if s["refine"] is not None]
        if cfg.do_covisibility_opt and "clu" in cfg.opt_type and pool:
            self._refine_pool(pool, stats=stats)
        for s in pool:
            if s["result"] is None:  # refinement opted out / kept pose
                _, qv, tv, src = s["refine"]
                s["result"] = QueryResult(qv, tv, s["best"]["num_inliers"],
                                          s["log"], source=src)
        return [s["result"] for s in state]

    def _refine_pool(self, pool: List[dict],
                     stats: Optional[Dict[str, float]] = None) -> None:
        """pose_refinement_covisibility for a pool of accepted queries,
        each stage one dispatch (matcher → PnP → iterative LM)."""
        cfg = self.cfg
        t0 = time.perf_counter()
        banks = []
        for s in pool:
            seed_db, qv, tv, _ = s["refine"]
            if "obs" in cfg.opt_type:
                ids = self.map.covis_frames_obs(
                    seed_db, covisibility_frame=cfg.covisibility_frame,
                    obs_th=cfg.obs_thresh, pred_qvec=qv, pred_tvec=tv)
            else:
                ids = self.map.covis_frames_pose(
                    seed_db, qv, tv,
                    covisibility_frame=cfg.covisibility_frame,
                    q_th=10.0, t_th=10.0, obs_th=cfg.obs_thresh)
            banks.append(list(ids))
        t0 = self._tick(stats, "covis_s", t0)
        matches = self._batched_match([s["q_dev"] for s in pool], banks,
                                      stats=stats)

        t0 = time.perf_counter()
        pnp_items, ctx = [], []
        for s, m, ids in zip(pool, matches, banks):
            _, qv, tv, src = s["refine"]
            mp3d, mkpq, _, _, _ = self._assemble_2d3d(
                s["kpq"], m[: len(ids)], ids, cfg.obs_thresh, dedup={},
                gate_pose=(qv, tv), cam8=s["cam8"], radius=cfg.radius)
            s["log"] += f"covis refine: {len(ids)} frames, {len(mkpq)} matches\n"
            if len(mkpq) < 6:
                s["result"] = QueryResult(
                    qv, tv, s["best"]["num_inliers"],
                    s["log"] + "too few matches, keep pose\n", source=src)
                continue
            pnp_items.append((mkpq, mp3d, s["cam8"]))
            ctx.append((s, mkpq, mp3d, src))
        t0 = self._tick(stats, "assemble_s", t0)
        if not pnp_items:
            return
        results = self._batched_pnp(pnp_items, cfg.opt_thresh, seed_base=77,
                                    stats=stats)

        lm_items, lm_ctx = [], []
        for (s, mkpq, mp3d, src), (qv, tv, inl, num, success) in zip(ctx, results):
            _, qv0, tv0, _ = s["refine"]
            if not success:
                s["result"] = QueryResult(
                    qv0, tv0, s["best"]["num_inliers"],
                    s["log"] + "refinement RANSAC failed, keep pose\n",
                    source=src)
                continue
            if "ref" in cfg.opt_type and inl.sum() >= 10:
                lm_items.append((qv, tv, mkpq, mp3d, inl, s["cam8"]))
                lm_ctx.append((s, num, src))
            else:
                s["result"] = QueryResult(qv, tv, num, s["log"], source=src)
        if not lm_items:
            return
        n_pad = self._pad_bucket(max(len(it[2]) for it in lm_items))
        qp = _bucket(len(lm_items))
        qv_a = np.zeros((qp, 4), np.float32)
        tv_a = np.zeros((qp, 3), np.float32)
        qv_a[:, 0] = 1.0
        p3 = np.zeros((qp, n_pad, 3), np.float32)
        kp = np.zeros((qp, n_pad, 2), np.float32)
        ms = np.zeros((qp, n_pad), bool)
        cams = np.zeros((qp, 8), np.float32)
        cams[:, :2] = 1.0  # benign padding camera (fx=fy=1)
        for i, (qv, tv, mkpq, mp3d, inl, cam8) in enumerate(lm_items):
            nmatch = len(mkpq)
            qv_a[i], tv_a[i] = qv, tv
            p3[i, :nmatch], kp[i, :nmatch], ms[i, :nmatch] = mp3d, mkpq, inl
            cams[i] = np.asarray(cam8, np.float32).reshape(8)
        t0 = time.perf_counter()
        out = np.asarray(_packed_refine_batch(cfg.iters)(
            jnp.asarray(qv_a), jnp.asarray(tv_a), jnp.asarray(p3),
            jnp.asarray(kp), jnp.asarray(cams), jnp.asarray(ms),
            jnp.float32(cfg.opt_thresh),
        ))
        t0 = self._tick(stats, "lm_s", t0)
        for i, (s, num, src) in enumerate(lm_ctx):
            qv, tv = lm_items[i][0], lm_items[i][1]
            if int(out[i, 7]) > 0:
                qv = out[i, :4].astype(np.float64)
                tv = out[i, 4:7].astype(np.float64)
                num = int(out[i, 7])
            for it, n_it in enumerate(out[i, 8:8 + cfg.iters]):
                if n_it >= 0:
                    s["log"] += f"iter {it+1}: {int(n_it)} inliers\n"
            s["result"] = QueryResult(qv, tv, num, s["log"], source=src)

    # ------------------------------------------------------------------
    def localize_many(
        self,
        queries: Sequence[Tuple[str, tuple, Sequence[Sequence[int]]]],
        workers: int = 4,
    ) -> List[QueryResult]:
        """Pipelined batch localization: `queries` is a list of
        ``(qname, qinfo, clusters)`` triples; returns results in order.

        The per-query sequence (match → host assemble → PnP → covis
        refine) serialises device dispatches behind host work and — on
        the relay-backed TPU — behind a full RPC round-trip per fetch.
        Running `workers` queries on concurrent threads overlaps query
        N's host assembly and fetch latency with query N+1's device
        compute: JAX dispatch is thread-safe, the static-shape design
        means every thread reuses the same compiled programs, and the
        shared caches are lock-guarded. The reference pays this
        serialisation per query (``it_loc/localize_cv2.py:652`` loop);
        overlapping it is the TPU-native win (VERDICT r3 #4)."""
        from concurrent.futures import ThreadPoolExecutor

        if workers <= 1 or len(queries) <= 1:
            return [self.localize(*q) for q in queries]
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(lambda q: self.localize(*q), queries))
