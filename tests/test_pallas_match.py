"""Pallas fused matcher vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfd2_tpu.ops.matching import mutual_nn_match_batch
from sfd2_tpu.ops.pallas_match import mutual_nn_match_pallas, nn_argmax_pallas

INTERPRET = jax.default_backend() != "tpu"


def unit(rng, *shape):
    d = rng.normal(size=shape).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


@pytest.mark.parametrize("b,n1,n2", [(1, 128, 128), (2, 128, 256)])
def test_pallas_matches_xla(rng, b, n1, n2):
    d0 = unit(rng, b, n1, 32)
    d1 = unit(rng, b, n2, 32)
    v0 = np.ones((b, n1), bool)
    v1 = np.ones((b, n2), bool)
    m_ref, s_ref = mutual_nn_match_batch(
        jnp.array(d0), jnp.array(d1), jnp.array(v0), jnp.array(v1)
    )
    m_pal, s_pal = mutual_nn_match_pallas(
        jnp.array(d0), jnp.array(d1), jnp.array(v0), jnp.array(v1),
        block_m=64, block_n=64, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.array(m_pal), np.array(m_ref))
    np.testing.assert_allclose(np.array(s_pal), np.array(s_ref), atol=1e-5)


def test_pallas_respects_validity(rng):
    b, n = 1, 128
    d0 = unit(rng, b, n, 16)
    v0 = np.ones((b, n), bool)
    v0[:, 100:] = False
    v1 = np.ones((b, n), bool)
    v1[:, 64:] = False
    m_ref, _ = mutual_nn_match_batch(
        jnp.array(d0), jnp.array(d0), jnp.array(v0), jnp.array(v1)
    )
    m_pal, _ = mutual_nn_match_pallas(
        jnp.array(d0), jnp.array(d0), jnp.array(v0), jnp.array(v1),
        block_m=64, block_n=64, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.array(m_pal), np.array(m_ref))
    assert np.all(np.array(m_pal)[:, 100:] == -1)
    valid_matches = np.array(m_pal)[np.array(m_pal) >= 0]
    assert np.all(valid_matches < 64)


def test_pallas_argmax_multiblock(rng):
    """Accumulators must survive across multiple I and J tiles."""
    b, n1, n2, c = 1, 256, 256, 16
    d0 = unit(rng, b, n1, c)
    d1 = unit(rng, b, n2, c)
    v = np.ones((b, n1), bool)
    rmax, nn12, cmax, nn21 = nn_argmax_pallas(
        jnp.array(d0), jnp.array(d1), jnp.array(v), jnp.array(v),
        block_m=64, block_n=64, interpret=INTERPRET,
    )
    sim = np.einsum("bnc,bmc->bnm", d0, d1)
    np.testing.assert_array_equal(np.array(nn12), sim.argmax(2))
    np.testing.assert_array_equal(np.array(nn21), sim.argmax(1))
    np.testing.assert_allclose(np.array(rmax), sim.max(2), atol=1e-5)
    np.testing.assert_allclose(np.array(cmax), sim.max(1), atol=1e-5)


@pytest.mark.parametrize("b,n1,n2", [(1, 128, 128), (2, 128, 256)])
def test_pallas_ratio_matches_xla(rng, b, n1, n2):
    from sfd2_tpu.ops.matching import mutual_nn_ratio_match
    from sfd2_tpu.ops.pallas_match import mutual_nn_ratio_match_pallas

    d0 = unit(rng, b, n1, 32)
    d1 = unit(rng, b, n2, 32)
    v0 = np.ones((b, n1), bool)
    v1 = np.ones((b, n2), bool)
    ref = jax.vmap(lambda a, c, x, y: mutual_nn_ratio_match(a, c, 0.97, x, y))(
        jnp.array(d0), jnp.array(d1), jnp.array(v0), jnp.array(v1)
    )
    pal = mutual_nn_ratio_match_pallas(
        jnp.array(d0), jnp.array(d1), 0.97, jnp.array(v0), jnp.array(v1),
        block_m=64, block_n=64, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.array(pal[0]), np.array(ref[0]))


def test_pallas_top2_multiblock(rng):
    from sfd2_tpu.ops.pallas_match import nn_top2_pallas

    b, n, c = 1, 256, 16
    d0 = unit(rng, b, n, c)
    d1 = unit(rng, b, n, c)
    v = np.ones((b, n), bool)
    m1, nn12, m2, c1, nn21, c2 = nn_top2_pallas(
        jnp.array(d0), jnp.array(d1), jnp.array(v), jnp.array(v),
        block_m=64, block_n=64, interpret=INTERPRET,
    )
    sim = np.einsum("bnc,bmc->bnm", d0, d1)
    srt = np.sort(sim, axis=2)
    np.testing.assert_allclose(np.array(m1), srt[:, :, -1], atol=1e-5)
    np.testing.assert_allclose(np.array(m2), srt[:, :, -2], atol=1e-5)
    srt0 = np.sort(sim, axis=1)
    np.testing.assert_allclose(np.array(c1), srt0[:, -1, :], atol=1e-5)
    np.testing.assert_allclose(np.array(c2), srt0[:, -2, :], atol=1e-5)


def test_pallas_mutual_tie_semantics(rng):
    """The full-width mutual kernel checks mutuality by max-equality
    (rmax[i] == cmax[nn12[i]]): on EXACT score ties between rows it
    grants the match to every tying row, where the XLA back-pointer
    check keeps only the first. Duplicated descriptors make this
    observable; both behaviours are valid mutual-NN semantics."""
    b, n, c = 1, 128, 16
    d0 = unit(rng, b, n, c)
    d0[:, 64] = d0[:, 0]  # rows 0 and 64 identical
    d1 = unit(rng, b, n, c)
    d1[:, 5] = d0[:, 0]  # column 5 is their common best match
    m_pal, _ = mutual_nn_match_pallas(
        jnp.array(d0), jnp.array(d1), None, None,
        block_m=64, interpret=INTERPRET,
    )
    m_pal = np.array(m_pal)
    assert m_pal[0, 0] == 5 and m_pal[0, 64] == 5  # both tying rows match
    from sfd2_tpu.ops.matching import mutual_nn_match_batch
    m_ref, _ = mutual_nn_match_batch(
        jnp.array(d0), jnp.array(d1),
        jnp.ones((b, n), bool), jnp.ones((b, n), bool),
    )
    m_ref = np.array(m_ref)
    assert m_ref[0, 0] == 5 and m_ref[0, 64] == -1  # XLA keeps first only
    # Everywhere untied the two agree.
    untied = np.ones(n, bool)
    untied[[0, 64]] = False
    np.testing.assert_array_equal(m_pal[0, untied], m_ref[0, untied])


def test_pallas_fullwidth_fallback_tiled(rng, monkeypatch):
    """When the full-width stripe would not fit VMEM, the mutual matcher
    must fall back to the tiled kernel and still match the XLA path."""
    import sfd2_tpu.ops.pallas_match as pm

    monkeypatch.setattr(pm, "_FULLWIDTH_VMEM_BYTES", 1)  # force fallback
    b, n, c = 2, 128, 16
    d0 = unit(rng, b, n, c)
    d1 = unit(rng, b, n, c)
    v = jnp.ones((b, n), bool)
    assert pm._fullwidth_block_m(n, n, c, 64) is None
    m_pal, _ = pm.mutual_nn_match_pallas.__wrapped__(
        jnp.array(d0), jnp.array(d1), v, v, block_m=64, block_n=128,
        interpret=INTERPRET,
    )
    from sfd2_tpu.ops.matching import mutual_nn_match_batch
    m_ref, _ = mutual_nn_match_batch(jnp.array(d0), jnp.array(d1), v, v)
    np.testing.assert_array_equal(np.array(m_pal), np.array(m_ref))


def test_pallas_non_128_divisible_uses_fallback(rng):
    """Shapes the 128-lane epilogue can't handle (n % 128 != 0) must
    take the tiled fallback and agree with the XLA path (regression:
    n2=320 once silently dropped matches beyond column 256)."""
    import sfd2_tpu.ops.pallas_match as pm

    b, n1, n2, c = 2, 256, 320, 16
    assert pm._fullwidth_block_m(n1, n2, c, 256) is None
    d0 = unit(rng, b, n1, c)
    d1 = unit(rng, b, n2, c)
    v0 = jnp.ones((b, n1), bool)
    v1 = jnp.ones((b, n2), bool)
    m_pal, _ = pm.mutual_nn_match_pallas(
        jnp.array(d0), jnp.array(d1), v0, v1, block_m=64, block_n=64,
        interpret=INTERPRET,
    )
    from sfd2_tpu.ops.matching import mutual_nn_match_batch
    m_ref, _ = mutual_nn_match_batch(jnp.array(d0), jnp.array(d1), v0, v1)
    np.testing.assert_array_equal(np.array(m_pal), np.array(m_ref))
