"""Pair-list matching pipeline (features → HDF5 match store).

Capability parity: ``hloc/match_features.py`` — match every pair in a
list (or exhaustively), skip already-present and reverse-duplicate pairs
(``:94-97``), write ``matches0``/``matching_scores0`` groups. Matcher
presets mirror ``it_loc/matcher.py:24`` (NNM mutual-NN — the benchmark
conf, NNR ratio 0.9, ONN one-way) plus the hloc distance-threshold NN.

TPU-native: pairs are matched in fixed-size device batches over padded
[K] descriptor banks — one batched GEMM launch per `batch_size` pairs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.io.feature_store import FeatureStore, MatchStore

MATCHER_CONFS: Dict[str, dict] = {
    "NNM": {"mode": "nnm"},
    "NNR": {"mode": "nnr", "ratio": 0.9},
    "ONN": {"mode": "onn"},
    # Label-aware mutual NN (``it_loc/matcher.py:24,239``): features carry
    # semantic ids from mask-aware extraction; a labeled feature never
    # matches a differently-labeled one.
    "NNML": {"mode": "nnml"},
}


@dataclasses.dataclass
class MatchConfig:
    matcher: str = "NNM"
    max_keypoints: int = 4096
    batch_size: int = 16


def _matcher_fn(conf: dict):
    from sfd2_tpu.ops.matching import batch_matcher

    return batch_matcher(conf["mode"], conf.get("ratio", 0.9))


def match_pairs(
    features: FeatureStore,
    pairs: Sequence[Tuple[str, str]],
    store: MatchStore,
    cfg: MatchConfig = MatchConfig(),
    mesh=None,
) -> int:
    """Match all pairs into `store`; resumable; returns #matched.

    `mesh`: optional jax.sharding.Mesh with a 'data' axis — the pair
    batch is sharded over it (SURVEY §7.1 DB-DB matching across chips);
    batches are padded to a multiple of the axis size."""
    conf = MATCHER_CONFS[cfg.matcher]
    if mesh is not None:
        from sfd2_tpu.ops.sharded_match import make_sharded_pair_matcher

        fn = make_sharded_pair_matcher(
            mesh, conf["mode"], conf.get("ratio", 0.9)
        )
        n_dev = mesh.shape["data"]
    else:
        fn = _matcher_fn(conf)
        n_dev = 1
    k = cfg.max_keypoints

    todo = []
    seen = set()
    for n0, n1 in pairs:
        if (n0, n1) in seen or (n1, n0) in seen:
            continue
        seen.add((n0, n1))
        if store.has_pair(n0, n1):
            continue
        todo.append((n0, n1))

    with_labels = conf["mode"] == "nnml"
    cache: Dict[str, tuple] = {}

    def feats(name):
        if name not in cache:
            kp, de, sc, va, lb = features.read_padded(name, k, with_labels=True)
            cache[name] = (de, va, int(va.sum()), lb)
        return cache[name]

    # Single-chip path: each image's padded bank is uploaded ONCE and kept
    # device-resident (LRU-bounded); batches are stacked on device and the
    # (matches, scores) result is fetched as ONE packed buffer — in a
    # covis-20 pair list every image otherwise re-uploads its ~2 MB bank
    # dozens of times, and each extra blocking fetch costs a relay RTT.
    from collections import OrderedDict

    dev_cache: "OrderedDict[str, tuple]" = OrderedDict()
    dev_zero = [None]

    def feats_dev(name, c):
        if name in dev_cache:
            dev_cache.move_to_end(name)
        else:
            de, va, _, lb = feats(name)
            dev_cache[name] = (
                jnp.asarray(de), jnp.asarray(va),
                jnp.asarray(lb) if with_labels else None,
            )
            if len(dev_cache) > 1024:
                dev_cache.popitem(last=False)
        return dev_cache[name]

    if mesh is None:
        @jax.jit
        def packed_fn(*args):
            m, s = fn(*args)
            # indices are < 2^24 (exact in f32); −1 sentinel survives
            return jnp.stack([m.astype(jnp.float32), s], axis=-1)

    count = 0
    for i in range(0, len(todo), cfg.batch_size):
        chunk = todo[i : i + cfg.batch_size]
        c = feats(chunk[0][0])[0].shape[1]
        # Pad the batch so the pair axis shards evenly over the mesh.
        bsz = ((len(chunk) + n_dev - 1) // n_dev) * n_dev
        if mesh is None:
            if dev_zero[0] is None or dev_zero[0][0].shape[1] != c:
                dev_zero[0] = (
                    jnp.zeros((k, c), jnp.float32), jnp.zeros(k, bool),
                    jnp.zeros(k, jnp.int32) if with_labels else None,
                )
            e0 = [feats_dev(n0, c) for n0, _ in chunk]
            e1 = [feats_dev(n1, c) for _, n1 in chunk]
            e0 += [dev_zero[0]] * (bsz - len(chunk))
            e1 += [dev_zero[0]] * (bsz - len(chunk))
            args = [
                jnp.stack([e[0] for e in e0]), jnp.stack([e[0] for e in e1]),
                jnp.stack([e[1] for e in e0]), jnp.stack([e[1] for e in e1]),
            ]
            if with_labels:
                args += [jnp.stack([e[2] for e in e0]),
                         jnp.stack([e[2] for e in e1])]
            ms = np.asarray(packed_fn(*args))  # ONE fetch per batch
            m = ms[..., 0].astype(np.int32)
            s = ms[..., 1]
        else:
            d0 = np.zeros((bsz, k, c), np.float32)
            d1 = np.zeros((bsz, k, c), np.float32)
            v0 = np.zeros((bsz, k), bool)
            v1 = np.zeros((bsz, k), bool)
            l0 = np.zeros((bsz, k), np.int32)
            l1 = np.zeros((bsz, k), np.int32)
            for bi, (n0, n1) in enumerate(chunk):
                de0, va0, _, lb0 = feats(n0)
                de1, va1, _, lb1 = feats(n1)
                d0[bi], v0[bi], l0[bi] = de0, va0, lb0
                d1[bi], v1[bi], l1[bi] = de1, va1, lb1
            args = [jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(v0), jnp.asarray(v1)]
            if with_labels:
                args += [jnp.asarray(l0), jnp.asarray(l1)]
            m, s = fn(*args)
            m = np.asarray(m)
            s = np.asarray(s)
        for bi, (n0, n1) in enumerate(chunk):
            n_real = feats(n0)[2]
            store.write(n0, n1, m[bi][:n_real], s[bi][:n_real])
            count += 1
    return count
