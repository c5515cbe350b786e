"""Pallas fused stem kernel vs the XLA s2d stem reference (interpret
mode on CPU; the real-TPU exactness check lives in bench.py's
kernels_exact pass). Same contract as nets/sfd2.py:268-272."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfd2_tpu.ops.pallas_stem import (
    StemWeights,
    pack_s2d_plane_rows,
    stem_pallas_apply,
)
from sfd2_tpu.ops.stem import PackedStem, fused_stem_apply


def _random_packed(key) -> PackedStem:
    """Random already-folded stem weights in the packed s2d form."""
    from sfd2_tpu.ops.stem import repack_stem_params

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    params = {
        "conv1a": {"conv": {
            "kernel": jax.random.normal(k1, (3, 3, 3, 64)) * 0.2,
            "bias": jax.random.normal(k2, (64,)) * 0.1,
        }},
        "conv1b": {"conv": {
            "kernel": jax.random.normal(k3, (3, 3, 64, 64)) * 0.1,
            "bias": jax.random.normal(k4, (64,)) * 0.1,
        }},
    }
    stats = {
        "conv1a": {"bn": {
            "mean": jax.random.normal(k5, (64,)) * 0.2,
            "var": jnp.exp(jax.random.normal(k6, (64,)) * 0.3),
        }},
        "bn1b": {"bn": {
            "mean": jax.random.normal(k5, (64,)) * 0.1,
            "var": jnp.exp(jax.random.normal(k6, (64,)) * 0.2),
        }},
    }
    return repack_stem_params(params, stats)


def test_pack_s2d_plane_rows_layout():
    x = jnp.arange(1 * 8 * 8 * 3, dtype=jnp.float32).reshape(1, 8, 8, 3)
    rows = pack_s2d_plane_rows(x)
    assert rows.shape == (1, 4 + 2 + 6, 16, 4)
    np.testing.assert_array_equal(rows[:, :, 12:], 0)  # plane pad
    np.testing.assert_array_equal(rows[:, :2], 0)  # top halo
    np.testing.assert_array_equal(rows[:, 6:], 0)  # bottom halo
    for p in range(2):
        for q in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    rows[0, 2:6, (p * 2 + q) * 3 + c, :], x[0, p::2, q::2, c])


@pytest.mark.parametrize("shape", [(1, 64, 256, 3), (2, 96, 256, 3)])
def test_pallas_stem_matches_xla_s2d_stem(shape):
    key = jax.random.PRNGKey(0)
    packed = _random_packed(jax.random.fold_in(key, 1))
    x = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.float32)

    ref = fused_stem_apply(x, packed, dtype=jnp.float32)
    got = stem_pallas_apply(x, StemWeights(packed, dtype=jnp.float32),
                            dtype=jnp.float32, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_pallas_stem_width_crop():
    """W not a multiple of 256: wrapper pads and crops; result must match
    the unpadded reference (padding never leaks through the convs'
    zero-pad boundary... it does touch the last output column's taps,
    which see zeros either way)."""
    key = jax.random.PRNGKey(5)
    packed = _random_packed(key)
    x = jax.random.normal(jax.random.fold_in(key, 2), (1, 64, 192, 3))
    ref = fused_stem_apply(x, packed, dtype=jnp.float32)
    got = stem_pallas_apply(x, StemWeights(packed, dtype=jnp.float32),
                            dtype=jnp.float32, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
