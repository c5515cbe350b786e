"""Differentiable average-precision loss via fixed quantisation (JAX).

Capability parity: ``nets/ap_loss.py:11`` (APLoss) — the R2D2 AP loss
whose quantiser the reference implements as a frozen Conv1d with
analytically-set weights. Here the quantiser is written directly as the
triangular-kernel soft histogram it encodes: nq bins spanning [min, max],
bin k activating linearly within ±1/a of its centre, with the two edge
bins half-open. Pure function, vmappable, no module state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nq",))
def quantize(x: jax.Array, nq: int = 20, vmin: float = 0.0, vmax: float = 1.0):
    """Soft-assign values [..., M] to nq bins → [..., nq, M].

    Matches the reference Conv1d construction (``nets/ap_loss.py:32-42``):
    q = min(-a·x + a·min + (nq−k), a·x + (2−nq+k) − a·min), clamped ≥ 0,
    with bin 0 of the descending side and bin nq−1 of the ascending side
    replaced by the constant 1 (half-open edges).
    """
    a = (nq - 1) / (vmax - vmin)
    k = jnp.arange(nq, dtype=x.dtype)
    xb = x[..., None, :]  # [..., 1, M]
    down = -a * xb + (a * vmin + (nq - k))[..., :, None]
    up = a * xb + ((2 - nq + k) - a * vmin)[..., :, None]
    down = down.at[..., 0, :].set(1.0)
    up = up.at[..., nq - 1, :].set(1.0)
    return jnp.clip(jnp.minimum(down, up), 0.0, None)


@functools.partial(jax.jit, static_argnames=("nq", "euc"))
def compute_ap(
    scores: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
    nq: int = 20,
    euc: bool = False,
):
    """Per-row quantised AP. `scores`/`labels` are [..., M] in [0, 1]/{0,1}.

    `weights` (optional [..., M]) masks padded columns — an extension the
    reference doesn't need because it runs with ragged host-side sets.
    """
    if euc:
        scores = 1 - jnp.sqrt(jnp.maximum(2.001 - 2 * scores, 0.0))
    q = quantize(scores, nq)  # [..., Q, M]
    lab = labels[..., None, :].astype(scores.dtype)
    if weights is not None:
        q = q * weights[..., None, :]
    nbs = jnp.sum(q, axis=-1)  # [..., Q]
    rec = jnp.sum(q * lab, axis=-1)
    prec = jnp.cumsum(rec, axis=-1) / (1e-16 + jnp.cumsum(nbs, axis=-1))
    rec_norm = rec / jnp.maximum(jnp.sum(rec, axis=-1, keepdims=True), 1e-16)
    return jnp.sum(prec * rec_norm, axis=-1)


def ap_loss(scores, labels, weights=None, nq: int = 20):
    """1 − AP, per row."""
    return 1.0 - compute_ap(scores, labels, weights, nq)
