"""ResSegNet / ResSegNetV2 — the SFD2 detector/descriptor network in Flax.

Capability parity: ``nets/sfd2.py:98`` (ResSegNet, V1: sigmoid stability
head) and ``nets/sfd2.py:259`` (ResSegNetV2, V2: 3-class semantic-stability
head with the {0.1, 0.5, 1.0} class→value map). Architecture (shared):

  encoder   conv1a→conv1b(s2)→bn1b | conv2a→conv2b(s2)→bn2b |
            conv3a→conv3b→bn3b     | 3× grouped ResBlock      → out4 @1/4 res
  detector  convPa (s2 → 1/8 res) → convPb → 65-ch "semi" →
            exp-normalise (+1e-5) → drop dustbin → 8×8 pixel-shuffle →
            full-res score map
  descriptor convDa → convDb → L2-normalised [*, h/4, w/4, outdim]
  stability ConvSta on out4 → bilinear upsample → (V2) argmax class →
            {0.1, 0.5, 1.0}; (V1) sigmoid

TPU-native redesign: NHWC layout throughout, one fused jitted ``det``
program per input shape, stability folding and exp-normalisation written
so XLA fuses them into the conv epilogues; `dtype` lets the whole forward
run in bfloat16 with float32 heads.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sfd2_tpu.models.layers import BNRelu, ConvBNReluConv, ConvUnit, ResBlock


class DetectionOutput(NamedTuple):
    score: jax.Array  # [B, H, W] full-res detection heatmap
    stability: Optional[jax.Array]  # [B, H, W] {0.1,0.5,1.0} (V2) / sigmoid (V1)
    descriptors: jax.Array  # [B, h/4, w/4, outdim], L2-normalised
    semi: Optional[jax.Array] = None  # [B, h/8, w/8, 65] normalised (training)
    stability_logits: Optional[jax.Array] = None  # [B, H, W, 3] softmax (training)
    features: tuple = ()  # intermediate encoder features (training)


def _pixel_shuffle_score(semi_norm: jax.Array) -> jax.Array:
    """[B, Hc, Wc, 65] normalised semi → [B, Hc*8, Wc*8] score map.

    Drops the dustbin channel and inverts the 8×8 space-to-depth packing
    (channel c ↦ in-cell offset (c // 8, c % 8)), identical to the
    reference's permute/view chain (``nets/sfd2.py:332-337``).
    """
    b, hc, wc, _ = semi_norm.shape
    score = semi_norm[..., :64]
    score = score.reshape(b, hc, wc, 8, 8)
    score = jnp.transpose(score, (0, 1, 3, 2, 4))
    return score.reshape(b, hc * 8, wc * 8)


class _ResSegBase(nn.Module):
    """Shared encoder + heads; V1/V2 differ only in the stability head."""

    outdim: int = 128
    require_feature: bool = False
    require_stability: bool = True
    dtype: jnp.dtype = jnp.float32

    # --- stability-head hooks (overridden per version) ------------------
    _fold_stability_into_score = False  # V2 det_train multiplies score

    def _sta_channels(self) -> int:
        raise NotImplementedError

    def _sta_maps(
        self, sta_coarse: jax.Array, size: tuple[int, int], need_soft: bool
    ):
        """(stability value map [B,H,W], softmaxed logits or None).

        `need_soft` gates the full-res softmax — it is only consumed by
        the training losses, and at 1024² it is pure HBM traffic."""
        raise NotImplementedError

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        training_outputs: bool = False,
        from_out1c: bool = False,
    ) -> DetectionOutput:
        """Forward pass. `x` is [B, H, W, 3] (ImageNet-normalised), or —
        with `from_out1c=True` — the [B, H/2, W/2, 64] post-stem
        activation produced by the fused s2d stem (ops/stem.py).

        `training_outputs=True` additionally returns the normalised semi
        map, the softmaxed stability logits and intermediate encoder
        features — the ``det_train`` contract (``nets/sfd2.py:356-402``),
        including score ×= stability-value folding.
        """
        dt = self.dtype
        if from_out1c:
            # Fused-stem entry (forward_from_out1c): `x` is already the
            # post-stem out1c activation at 1/2 res; the stem submodules
            # are simply not touched (their params stay unused).
            out1c = x
            full_size = (x.shape[1] * 2, x.shape[2] * 2)
        else:
            out1a = ConvUnit(64, dtype=dt, name="conv1a")(x, train)
            out1b = ConvUnit(
                64, stride=2, use_bn=False, relu=False, dtype=dt, name="conv1b"
            )(out1a, train)
            out1c = BNRelu(dtype=dt, name="bn1b")(out1b, train)
            full_size = (x.shape[1], x.shape[2])

        out2a = ConvUnit(128, dtype=dt, name="conv2a")(out1c, train)
        out2b = ConvUnit(128, stride=2, use_bn=False, relu=False, dtype=dt, name="conv2b")(
            out2a, train
        )
        out2c = BNRelu(dtype=dt, name="bn2b")(out2b, train)

        out3a = ConvUnit(256, dtype=dt, name="conv3a")(out2c, train)
        out3b = ConvUnit(256, use_bn=False, relu=False, dtype=dt, name="conv3b")(
            out3a, train
        )
        out3c = BNRelu(dtype=dt, name="bn3b")(out3b, train)

        out4 = out3c
        for i in range(3):
            out4 = ResBlock(256, dtype=dt, name=f"res{i+1}")(out4, train)

        # Detector head (1/8 res, 65 channels).
        c_pa = ConvBNReluConv(256, first_stride=2, dtype=dt, name="convPa")(out4, train)
        semi = nn.Conv(65, (1, 1), use_bias=True, dtype=dt, name="convPb")(c_pa)
        semi = jnp.exp(semi.astype(jnp.float32))
        semi_norm = semi / (jnp.sum(semi, axis=-1, keepdims=True) + 1e-5)
        score = _pixel_shuffle_score(semi_norm)

        # Descriptor head (1/4 res).
        c_da = ConvBNReluConv(256, first_stride=1, dtype=dt, name="convDa")(out4, train)
        desc = nn.Conv(self.outdim, (1, 1), use_bias=True, dtype=dt, name="convDb")(c_da)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

        stability = None
        sta_soft = None
        if self.require_stability:
            sta = nn.Conv(
                self._sta_channels(), (1, 1), use_bias=True, dtype=dt, name="convSta"
            )(out4)
            sta = sta.astype(jnp.float32)
            stability, sta_soft = self._sta_maps(
                sta, full_size, training_outputs
            )
            if training_outputs and self._fold_stability_into_score:
                score = score * stability

        feats = ()
        if training_outputs and self.require_feature:
            feats = (out2c, out3c)

        return DetectionOutput(
            score=score,
            stability=stability,
            descriptors=desc,
            semi=semi_norm if training_outputs else None,
            stability_logits=sta_soft,
            features=feats,
        )

    def det(self, params, x, train: bool = False):
        """Inference entry: (score, stability, desc) — ``nets/sfd2.py:313``."""
        out = self.apply(params, x, train=train)
        return out.score, out.stability, out.descriptors

    def forward_from_out1c(
        self, out1c: jax.Array, training_outputs: bool = False
    ) -> DetectionOutput:
        """Inference forward starting from the post-stem activation —
        pair with ops/stem.py::fused_stem_apply:
        ``model.apply(vars, fused_stem_apply(x, packed, dt),
        method=model.forward_from_out1c)``."""
        return self(out1c, train=False, training_outputs=training_outputs,
                    from_out1c=True)


class ResSegNetV2(_ResSegBase):
    """V2: 3-class semantic-stability classifier head
    (``nets/sfd2.py:259``)."""

    _fold_stability_into_score = True  # det_train: score *= cls_to_value

    def _sta_channels(self) -> int:
        return 3

    def _sta_maps(self, sta_coarse, size, need_soft):
        # Reference order: upsample logits, then cls_to_value
        # (nets/sfd2.py:345-347): argmax class → {0.1, 0.5, 1.0}.
        #
        # TPU layout note: a [B, H, W, 3] full-res tensor uses 3 of the
        # 128 vector lanes on every op — measured ~9 ms/img for this head
        # alone. Upsampling each class PLANE ([B, H, W], lane dim = W)
        # and replacing argmax+table-gather with a select chain is
        # bit-identical and ~an order of magnitude cheaper.
        b = sta_coarse.shape[0]
        h, w = size
        s0, s1, s2 = (
            jax.image.resize(sta_coarse[..., c], (b, h, w), method="bilinear")
            for c in range(3)
        )
        # jnp.argmax first-max tie-breaking, expressed as selects.
        is0 = (s0 >= s1) & (s0 >= s2)
        is1 = (~is0) & (s1 >= s2)
        values = jnp.where(is0, 0.1, jnp.where(is1, 0.5, 1.0)).astype(jnp.float32)
        soft = None
        if need_soft:
            soft = jax.nn.softmax(jnp.stack([s0, s1, s2], axis=-1), axis=-1)
        return values, soft


class ResSegNet(_ResSegBase):
    """V1: single-channel sigmoid stability head (``nets/sfd2.py:98``)."""

    _fold_stability_into_score = False  # V1 det_train leaves score unscaled

    def _sta_channels(self) -> int:
        return 1

    def _sta_maps(self, sta_coarse, size, need_soft):
        # Reference order: sigmoid, then upsample (nets/sfd2.py:179-180).
        # Planar upsample for the same lane-utilisation reason as V2.
        sig = jax.nn.sigmoid(sta_coarse[..., 0])
        return (
            jax.image.resize(sig, (sig.shape[0],) + tuple(size), method="bilinear"),
            None,
        )
