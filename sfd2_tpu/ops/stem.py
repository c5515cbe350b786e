"""Fused space-to-depth stem for ResSegNet extraction (inference).

Capability parity: the encoder stem ``conv1a → conv1b(s2) → bn1b`` of
``nets/sfd2.py:268-272`` (via models/sfd2.py). Mathematically identical
output, radically different TPU mapping.

Why: conv1a is a 3-channel 3×3 conv at full resolution — its MXU
contraction is kh·kw·C_in = 27 of 128 lanes (~20% occupancy at best),
and XLA additionally round-trips the [B,1024,1024,64] out1a activation
through HBM before conv1b decimates it. Measured round 3: the stem is
1.58 ms of the 5.92 ms extract @1024² (CLAUDE.md attribution), bound by
neither roofline.

The redesign works on the stride-2 output grid from the start:

* the input is space-to-depth packed once: [B,H,W,3] → [B,H/2,W/2,12]
  (2×2 pixel block → channels);
* conv1a's four output phase planes (p,q ∈ {0,1}²) become 4·64 = 256
  channels of a single 3×3 conv over the 12 packed channels
  (contraction 108 — every input pixel/tap of the original conv lands
  in exactly one slot; the remaining slots hold exact zeros);
* conv1b (stride 2) becomes a 2×2 conv over those 256 channels
  (contraction 1024, full MXU) with asymmetric (1,0) padding;
* both BNs (affine-free, running stats) and biases fold into the
  repacked weights; ReLUs stay elementwise.

Everything runs at H/2 × W/2: no full-resolution activation ever exists,
so the out1a HBM round-trip disappears and both GEMMs are MXU-shaped.
Equivalence to the layer-by-layer stem is sum-reordering only (extra
terms are exact zeros) — golden-tested in tests/test_stem_fused.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfd2_tpu.models.layers import BN_EPS


class PackedStem(NamedTuple):
    """Repacked stem parameters (see repack_stem_params)."""

    w1: jax.Array  # [3, 3, 12, 256]  conv1a as s2d conv, bn1a folded
    b1: jax.Array  # [256]
    w2: jax.Array  # [2, 2, 256, 64]  conv1b as s2d conv
    b2: jax.Array  # [64]             conv1b bias + bn1b fold


def space_to_depth(x: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B, H/2, W/2, 4C]; channel (p·2+q)·C + c holds
    input pixel (2y+p, 2x+q, c). H, W must be even."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def repack_stem_params(params, batch_stats) -> PackedStem:
    """Build the s2d stem weights from the standard parameter tree
    (params/batch_stats subtrees for conv1a, conv1b, bn1b).

    All folds are computed in f32 regardless of stored dtype; cast at
    apply time. Index mapping (input row I = 2y'+p+dy−1 = 2(y'+Δ)+p''):
    Δ = floor((p+dy−1)/2), p'' = (p+dy−1) mod 2, and for the stride-2
    conv1b: dy−1 ∈ {−1,0,1} → (Δ,p) ∈ {(−1,1),(0,0),(0,1)}.
    """
    w1 = jnp.asarray(params["conv1a"]["conv"]["kernel"], jnp.float32)  # [3,3,3,64]
    b1 = jnp.asarray(params["conv1a"]["conv"]["bias"], jnp.float32)  # [64]
    w2 = jnp.asarray(params["conv1b"]["conv"]["kernel"], jnp.float32)  # [3,3,64,64]
    b2 = jnp.asarray(params["conv1b"]["conv"]["bias"], jnp.float32)  # [64]

    # Fold conv1a's affine-free BN (running stats) into w1/b1.
    bn1 = batch_stats["conv1a"]["bn"]
    inv1 = 1.0 / jnp.sqrt(jnp.asarray(bn1["var"], jnp.float32) + BN_EPS)
    sh1 = -jnp.asarray(bn1["mean"], jnp.float32) * inv1
    w1f = w1 * inv1  # broadcast over co
    b1f = b1 * inv1 + sh1

    # Fold conv1b bias + bn1b into b2 (+ per-channel scale into w2).
    bnb = batch_stats["bn1b"]["bn"]
    inv2 = 1.0 / jnp.sqrt(jnp.asarray(bnb["var"], jnp.float32) + BN_EPS)
    sh2 = -jnp.asarray(bnb["mean"], jnp.float32) * inv2
    w2f = w2 * inv2
    b2f = b2 * inv2 + sh2

    ci1, co1 = 3, 64
    w1p = jnp.zeros((3, 3, 4 * ci1, 4 * co1), jnp.float32)
    for p in range(2):
        for dy in range(3):
            s = p + dy - 1
            dY, pp = (s >> 1) + 1, s & 1
            for q in range(2):
                for dx in range(3):
                    t = q + dx - 1
                    dX, qq = (t >> 1) + 1, t & 1
                    w1p = w1p.at[
                        dY, dX,
                        (pp * 2 + qq) * ci1:(pp * 2 + qq + 1) * ci1,
                        (p * 2 + q) * co1:(p * 2 + q + 1) * co1,
                    ].set(w1f[dy, dx])
    b1p = jnp.tile(b1f, 4)  # bias per (p,q,co)

    # conv1b: out[y'] = Σ_dy w2[dy] · out1a[2y'+dy−1]; map rows to the
    # stage-A phase planes: dy=0→(Δ=−1,p=1), 1→(0,0), 2→(0,1).
    row_map = {0: (0, 1), 1: (1, 0), 2: (1, 1)}  # dy → (dyB, phase)
    w2p = jnp.zeros((2, 2, 4 * co1, co1), jnp.float32)
    for dy in range(3):
        dyB, p = row_map[dy]
        for dx in range(3):
            dxB, q = row_map[dx]
            w2p = w2p.at[
                dyB, dxB, (p * 2 + q) * co1:(p * 2 + q + 1) * co1, :
            ].set(w2f[dy, dx])
    return PackedStem(w1=w1p, b1=b1p, w2=w2p, b2=b2f)


def fused_stem_apply(
    x: jax.Array, packed: PackedStem, dtype=jnp.float32
) -> jax.Array:
    """[B, H, W, 3] → out1c [B, H/2, W/2, 64] ≡ bn1b(conv1b(relu(
    bn1a(conv1a(x))))) with relu. `dtype` is the GEMM dtype (bf16 on
    TPU, matching the trunk); accumulation is f32 either way."""
    x2 = space_to_depth(x).astype(dtype)
    a = jax.lax.conv_general_dilated(
        x2, packed.w1.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    a = jax.nn.relu(a + packed.b1)
    out = jax.lax.conv_general_dilated(
        a.astype(dtype), packed.w2.astype(dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(out + packed.b2).astype(dtype)
