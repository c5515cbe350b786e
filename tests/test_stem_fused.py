"""Fused s2d stem (ops/stem.py) vs the layer-by-layer stem: exact
capability parity for the encoder entry of nets/sfd2.py:268-272 —
the repack only reorders summations (extra taps are exact zeros)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfd2_tpu.models.sfd2 import ResSegNet, ResSegNetV2
from sfd2_tpu.ops.stem import fused_stem_apply, repack_stem_params, space_to_depth


def _nonzero_stats(variables):
    """Random running stats (zeros would hide BN-folding bugs)."""
    key = jax.random.PRNGKey(3)

    def rnd(path, a):
        k = jax.random.fold_in(key, hash(tuple(str(p) for p in path)) % (2**31))
        if path[-1].key == "mean":
            return jax.random.normal(k, a.shape) * 0.3
        return jnp.exp(jax.random.normal(k, a.shape) * 0.3)  # var > 0

    return jax.tree_util.tree_map_with_path(rnd, variables)


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    x2 = space_to_depth(x)
    assert x2.shape == (2, 2, 3, 12)
    for p in range(2):
        for q in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    x2[:, :, :, (p * 2 + q) * 3 + c], x[:, p::2, q::2, c])


@pytest.mark.parametrize("cls", [ResSegNetV2, ResSegNet])
def test_fused_stem_matches_standard_forward(cls):
    model = cls(require_stability=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, 48, 3))
    variables = model.init(key, x)
    variables = {
        "params": variables["params"],
        "batch_stats": _nonzero_stats(variables["batch_stats"]),
    }

    ref = model.apply(variables, x)
    packed = repack_stem_params(variables["params"], variables["batch_stats"])
    out1c = fused_stem_apply(x, packed)
    fused = model.apply(variables, out1c, method=model.forward_from_out1c)

    assert out1c.shape == (2, 32, 24, 64)
    np.testing.assert_allclose(fused.score, ref.score, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        fused.descriptors, ref.descriptors, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        fused.stability, ref.stability, atol=2e-5, rtol=1e-4)


def test_fused_stem_out1c_exact_vs_manual():
    """out1c itself to tight f32 tolerance, including both BN folds and
    the boundary (zero-pad) rows/cols."""
    import flax.linen as nn

    from sfd2_tpu.models.layers import BNRelu, ConvUnit

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            out1a = ConvUnit(64, name="conv1a")(x, False)
            out1b = ConvUnit(64, stride=2, use_bn=False, relu=False,
                             name="conv1b")(out1a, False)
            return BNRelu(name="bn1b")(out1b, False)

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3))
    stem = Stem()
    variables = stem.init(key, x)
    variables = {
        "params": variables["params"],
        "batch_stats": _nonzero_stats(variables["batch_stats"]),
    }
    ref = stem.apply(variables, x)
    packed = repack_stem_params(variables["params"], variables["batch_stats"])
    got = fused_stem_apply(x, packed)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
