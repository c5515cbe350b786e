import numpy as np
import jax.numpy as jnp

from sfd2_tpu.training.extra_losses import cosim_loss, peaky_loss, triplet_loss_d2net


def identity_flow(b, h, w):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([xs, ys], -1).astype(np.float32)[None].repeat(b, 0)


def test_cosim_identity_flow_is_zero(rng):
    s = rng.random((2, 64, 64)).astype(np.float32)
    aflow = identity_flow(2, 64, 64)
    loss = float(cosim_loss(jnp.array(s), jnp.array(s), jnp.array(aflow), n=16))
    assert loss < 0.05, loss
    # Unrelated maps → higher loss.
    s2 = rng.random((2, 64, 64)).astype(np.float32)
    loss2 = float(cosim_loss(jnp.array(s), jnp.array(s2), jnp.array(aflow), n=16))
    assert loss2 > loss


def test_peaky_loss_prefers_peaky_maps(rng):
    flat = np.full((1, 64, 64), 0.5, np.float32)
    peaky = np.zeros((1, 64, 64), np.float32)
    peaky[0, ::8, ::8] = 1.0
    l_flat = float(peaky_loss(jnp.array(flat)))
    l_peaky = float(peaky_loss(jnp.array(peaky)))
    assert l_peaky < l_flat


def test_triplet_d2net_identity(rng):
    b, h, w, d = 1, 16, 16, 16
    desc = rng.normal(size=(b, h, w, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    score = np.full((b, h * 4, w * 4), 0.5, np.float32)
    aflow = identity_flow(b, h * 4, w * 4)
    # Identity: positives are perfect matches → loss ≈ relu(margin − d_neg).
    good = float(
        triplet_loss_d2net(
            jnp.array(desc), jnp.array(desc), jnp.array(score), jnp.array(score),
            jnp.array(aflow), margin=0.5,
        )
    )
    desc2 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    desc2 /= np.linalg.norm(desc2, axis=-1, keepdims=True)
    bad = float(
        triplet_loss_d2net(
            jnp.array(desc), jnp.array(desc2), jnp.array(score), jnp.array(score),
            jnp.array(aflow), margin=0.5,
        )
    )
    assert good < bad
    assert np.isfinite(good) and np.isfinite(bad)
