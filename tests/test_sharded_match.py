"""Sharded DB-bank matching (SURVEY §7.1): mesh programs must equal the
single-device matchers exactly, and the pipeline/engine wiring must
produce identical artifacts with and without a mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfd2_tpu.ops.matching import mutual_nn_match, mutual_nn_match_with_labels
from sfd2_tpu.ops.sharded_match import (
    make_sharded_pair_matcher,
    query_vs_sharded_bank,
)
from sfd2_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, ("data",))


def _bank(rng, d=16, k=64, c=32):
    q = rng.normal(size=(k, c)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    bank = rng.normal(size=(d, k, c)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    qv = rng.random(k) > 0.1
    bv = rng.random((d, k)) > 0.1
    return q, bank, qv, bv


def test_query_vs_sharded_bank_equals_single_device(rng, mesh):
    q, bank, qv, bv = _bank(rng)
    m_sh, s_sh = query_vs_sharded_bank(
        mesh, jnp.asarray(q), jnp.asarray(bank), jnp.asarray(qv), jnp.asarray(bv)
    )
    # Single-device oracle: per-frame mutual NN.
    for i in range(bank.shape[0]):
        m_ref, s_ref = mutual_nn_match(
            jnp.asarray(q), jnp.asarray(bank[i]), jnp.asarray(qv), jnp.asarray(bv[i])
        )
        np.testing.assert_array_equal(np.asarray(m_sh[i]), np.asarray(m_ref))
        np.testing.assert_allclose(np.asarray(s_sh[i]), np.asarray(s_ref), atol=1e-6)


def test_query_vs_sharded_bank_labels(rng, mesh):
    q, bank, qv, bv = _bank(rng, d=8)
    ql = rng.integers(0, 3, size=q.shape[0]).astype(np.int32)
    bl = rng.integers(0, 3, size=bank.shape[:2]).astype(np.int32)
    m_sh, _ = query_vs_sharded_bank(
        mesh, jnp.asarray(q), jnp.asarray(bank), jnp.asarray(qv), jnp.asarray(bv),
        jnp.asarray(ql), jnp.asarray(bl),
    )
    for i in range(bank.shape[0]):
        m_ref, _ = mutual_nn_match_with_labels(
            jnp.asarray(q), jnp.asarray(bank[i]), jnp.asarray(ql),
            jnp.asarray(bl[i]), jnp.asarray(qv), jnp.asarray(bv[i]),
        )
        np.testing.assert_array_equal(np.asarray(m_sh[i]), np.asarray(m_ref))


def test_query_vs_sharded_bank_rejects_ragged(rng, mesh):
    q, bank, qv, bv = _bank(rng, d=10)  # 10 % 8 != 0
    with pytest.raises(ValueError):
        query_vs_sharded_bank(
            mesh, jnp.asarray(q), jnp.asarray(bank), jnp.asarray(qv),
            jnp.asarray(bv),
        )


def test_sharded_pair_matcher_equals_plain(rng, mesh):
    d = 16
    q, bank, qv, bv = _bank(rng, d=d)
    d0 = np.broadcast_to(q, bank.shape).copy()
    v0 = np.broadcast_to(qv, bv.shape).copy()
    fn = make_sharded_pair_matcher(mesh, "nnm")
    m_sh, s_sh = fn(d0, bank, v0, bv)
    m_ref, _ = jax.vmap(mutual_nn_match)(
        jnp.asarray(d0), jnp.asarray(bank), jnp.asarray(v0), jnp.asarray(bv)
    )
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))


def test_match_pairs_with_mesh_identical_store(rng, mesh, tmp_path):
    """pipeline.match_pairs over the mesh writes the same matches."""
    from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures, MatchStore
    from sfd2_tpu.pipeline.match import MatchConfig, match_pairs

    k, c = 48, 16
    names = [f"im{i}.jpg" for i in range(6)]
    with FeatureStore(tmp_path / "f.h5", "w") as fs:
        for n in names:
            de = rng.normal(size=(k, c)).astype(np.float32)
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            fs.write(n, ImageFeatures(
                rng.random((k, 2)).astype(np.float32) * 100, de,
                rng.random(k).astype(np.float32), None,
            ))
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    cfg = MatchConfig(max_keypoints=k, batch_size=8)
    with FeatureStore(tmp_path / "f.h5") as fs, \
            MatchStore(tmp_path / "m_plain.h5", "a") as ms:
        match_pairs(fs, pairs, ms, cfg)
    with FeatureStore(tmp_path / "f.h5") as fs, \
            MatchStore(tmp_path / "m_mesh.h5", "a") as ms:
        match_pairs(fs, pairs, ms, cfg, mesh=mesh)

    with MatchStore(tmp_path / "m_plain.h5") as mp, \
            MatchStore(tmp_path / "m_mesh.h5") as mm:
        for a, b in pairs:
            m0, _ = mp.read(a, b)
            m1, _ = mm.read(a, b)
            np.testing.assert_array_equal(m0, m1)


def test_engine_with_mesh_matches_plain(rng, mesh, tmp_path):
    """LocalizationEngine._match_query_to_dbs over the mesh == plain."""
    from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
    from sfd2_tpu.localization.engine import LocalizationEngine, LocalizerConfig

    k, c = 48, 16

    class _FakeImage:
        def __init__(self, name):
            self.name = name

    class _FakeMap:
        def __init__(self, names):
            self.images = {i: _FakeImage(n) for i, n in enumerate(names)}
            self.image_row = {i: i for i in range(len(names))}
            self.p3d_rows_per_image = [
                np.arange(k, dtype=np.int64) for _ in names
            ]

    names = [f"db{i}.jpg" for i in range(5)]
    with FeatureStore(tmp_path / "f.h5", "w") as fs:
        for n in names + ["q.jpg"]:
            de = rng.normal(size=(k, c)).astype(np.float32)
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            fs.write(n, ImageFeatures(
                rng.random((k, 2)).astype(np.float32) * 100, de,
                rng.random(k).astype(np.float32), None,
            ))

    cfg = LocalizerConfig(max_keypoints=k)
    with FeatureStore(tmp_path / "f.h5") as fs:
        fmap = _FakeMap(names)
        eng_plain = LocalizationEngine(fmap, fs, cfg)
        eng_mesh = LocalizationEngine(fmap, fs, cfg, mesh=mesh)
        kpq, q_desc, _, q_valid, q_labels = fs.read_padded(
            "q.jpg", k, with_labels=True
        )
        ids = list(range(5))
        m0 = eng_plain._match_query_to_dbs(q_desc, q_valid, ids, q_labels)
        m1 = eng_mesh._match_query_to_dbs(q_desc, q_valid, ids, q_labels)
        np.testing.assert_array_equal(m0, m1)
