"""UPerNet-ConvNeXt semantic segmentor — the in-repo training teacher.

Capability parity: ``nets/semseg/segnet.py:28-33`` — the reference wraps
mmseg's ``init_segmentor``/``inference_segmentor`` with config
``upernet_convnext_base_fp16_512x512_160k_ade20k.py`` to label training
images with ADE20k-150 classes (consumed at ``trainer.py:287`` via
``SegNet.evaluate``; labels are then shifted +1 at ``trainer.py:290``).
This module reimplements that segmentor natively: the repo's Flax
ConvNeXt backbone (``models/convnext.py``) + the mmseg UPerHead decode
head (pool scales (1,2,3,6), 512 channels, 150 classes, BN+ReLU conv
modules, align_corners=False — ``nets/semseg/configs/_base_/models/
upernet_convnext.py``) + the auxiliary FCNHead (in_index 2, 256
channels; train-time-only in mmseg, provided for checkpoint
completeness).

TPU-first design notes:
- NHWC throughout; every conv is a dense MXU-shaped channel contraction
  (512-wide), BN folds into the conv epilogue under XLA fusion.
- The segmentor is a frozen teacher: BatchNorm always uses running
  statistics (mmseg inference mode), so the whole forward is a pure
  jitted function.
- Slide inference (the shipped test_cfg: 512² crops, stride 341) runs
  ALL crops as one batched device call — a static crop grid for a given
  padded image size, so one compile per size bucket and full MXU
  occupancy, instead of mmseg's per-crop python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.models.convnext import ConvNeXt
from sfd2_tpu.ops.resize import resize_bilinear

# mmseg ADE20k normalization (configs/_base_/datasets/ade20k.py).
ADE20K_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
ADE20K_STD = np.array([58.395, 57.12, 57.375], np.float32)


class ConvModule(nn.Module):
    """mmseg ConvModule: conv(no bias) → BN(running stats) → ReLU."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


def adaptive_avg_pool(x: jax.Array, out: int) -> jax.Array:
    """torch AdaptiveAvgPool2d((out, out)) on NHWC, exact bin semantics.

    Bins are static python slices (out ≤ 6 in UPerHead), so this unrolls
    into a handful of XLA reduce ops — no dynamic shapes."""
    b, h, w, c = x.shape
    rows = []
    for i in range(out):
        h0, h1 = (i * h) // out, -((-(i + 1) * h) // out)  # floor, ceil
        cols = []
        for j in range(out):
            w0, w1 = (j * w) // out, -((-(j + 1) * w) // out)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, out, out, C]


class UPerHead(nn.Module):
    """mmseg UPerHead: PSP on the deepest stage + top-down FPN fuse."""

    channels: int = 512
    num_classes: int = 150
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> jax.Array:
        x3 = feats[-1]
        hw3 = x3.shape[1:3]
        # PSP module over the deepest feature.
        psp_outs = [x3]
        for i, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool(x3, s)
            p = ConvModule(self.channels, 1, self.dtype, name=f"psp{i}")(p)
            psp_outs.append(resize_bilinear(p, hw3))
        psp = ConvModule(self.channels, 3, self.dtype, name="psp_bottleneck")(
            jnp.concatenate(psp_outs, axis=-1)
        )
        # Laterals + top-down pathway (in-place adds in mmseg).
        laterals = [
            ConvModule(self.channels, 1, self.dtype, name=f"lateral{i}")(feats[i])
            for i in range(len(feats) - 1)
        ] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        fpn_outs = [
            ConvModule(self.channels, 3, self.dtype, name=f"fpn{i}")(laterals[i])
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        hw0 = fpn_outs[0].shape[1:3]
        fpn_outs = [fpn_outs[0]] + [
            resize_bilinear(f, hw0) for f in fpn_outs[1:]
        ]
        out = ConvModule(self.channels, 3, self.dtype, name="fpn_bottleneck")(
            jnp.concatenate(fpn_outs, axis=-1)
        )
        # Dropout(0.1) is identity at inference (frozen teacher).
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="conv_seg"
        )(out).astype(jnp.float32)


class FCNHead(nn.Module):
    """mmseg FCNHead auxiliary head (num_convs=1, concat_input=False)."""

    channels: int = 256
    num_classes: int = 150
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ConvModule(self.channels, 3, self.dtype, name="conv0")(x)
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="conv_seg"
        )(x).astype(jnp.float32)


class ConvNeXtUPerNet(nn.Module):
    """EncoderDecoder(ConvNeXt-Base, UPerHead, FCNHead) — logits at 1/4
    input resolution (mmseg resizes to input size before argmax)."""

    arch: str = "base"
    num_classes: int = 150
    head_channels: int = 512
    aux_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, with_aux: bool = False
    ) -> jax.Array | Tuple[jax.Array, jax.Array]:
        feats = ConvNeXt(
            arch=self.arch, out_indices=(0, 1, 2, 3), dtype=self.dtype,
            name="backbone",
        )(x)
        logits = UPerHead(
            channels=self.head_channels, num_classes=self.num_classes,
            dtype=self.dtype, name="decode_head",
        )(feats)
        if with_aux:
            aux = FCNHead(
                channels=self.aux_channels, num_classes=self.num_classes,
                dtype=self.dtype, name="auxiliary_head",
            )(feats[2])
            return logits, aux
        return logits


@dataclasses.dataclass
class SegmentorConfig:
    crop: int = 512       # slide window (test_cfg crop_size)
    stride: int = 341     # slide stride (test_cfg stride)
    mode: str = "slide"   # 'slide' (shipped test_cfg) or 'whole'
    pad_multiple: int = 32
    bf16: bool | None = None  # None = bf16 trunk on TPU (frozen teacher;
    #                           argmax over 150 logits is robust to it)


class Segmentor:
    """Host-side wrapper with the reference ``SegNet.evaluate`` contract:
    image (HWC uint8/float RGB) → ADE20k label map [H, W] int32, 0-based
    (callers add +1 for the 1..150 convention, ``trainer.py:290``)."""

    def __init__(self, variables=None, config: SegmentorConfig | None = None,
                 model: ConvNeXtUPerNet | None = None):
        self.config = config or SegmentorConfig()
        bf16 = self.config.bf16
        if bf16 is None:
            bf16 = jax.default_backend() == "tpu"
        dt = jnp.bfloat16 if bf16 else jnp.float32
        self.model = model or ConvNeXtUPerNet(dtype=dt)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
        if bf16:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                variables,
            )
        self.variables = variables
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x))

    def _pad(self, img: np.ndarray, size: int | None = None):
        h, w = img.shape[:2]
        m = self.config.pad_multiple
        ph = max(size or 0, -((-h) // m) * m)
        pw = max(size or 0, -((-w) // m) * m)
        out = np.zeros((ph, pw, 3), np.float32)
        out[:h, :w] = (img.astype(np.float32) - ADE20K_MEAN) / ADE20K_STD
        return out, (h, w)

    def logits_whole(self, img: np.ndarray) -> np.ndarray:
        """Whole-image logits at input resolution, [H, W, 150] f32."""
        x, (h, w) = self._pad(img)
        logits = self._fwd(self.variables, jnp.asarray(x[None]))
        logits = resize_bilinear(logits, x.shape[:2])[0, :h, :w]
        return np.asarray(logits, np.float32)

    def logits_slide(self, img: np.ndarray) -> np.ndarray:
        """Slide-window logits: all crops in ONE batched device call,
        logit accumulation + count normalisation as in mmseg
        EncoderDecoder.slide_inference."""
        c, s = self.config.crop, self.config.stride
        x, (h, w) = self._pad(img, size=c)
        ph, pw = x.shape[:2]
        ys = list(range(0, max(ph - c, 0) + 1, s))
        xs = list(range(0, max(pw - c, 0) + 1, s))
        if ys[-1] + c < ph:
            ys.append(ph - c)
        if xs[-1] + c < pw:
            xs.append(pw - c)
        crops = np.stack([x[y:y + c, xx:xx + c] for y in ys for xx in xs])
        logits = self._fwd(self.variables, jnp.asarray(crops))
        logits = np.asarray(resize_bilinear(logits, (c, c)), np.float32)
        acc = np.zeros((ph, pw, logits.shape[-1]), np.float32)
        cnt = np.zeros((ph, pw, 1), np.float32)
        k = 0
        for y in ys:
            for xx in xs:
                acc[y:y + c, xx:xx + c] += logits[k]
                cnt[y:y + c, xx:xx + c] += 1.0
                k += 1
        return (acc / cnt)[:h, :w]

    def evaluate(self, img: np.ndarray) -> np.ndarray:
        """Reference ``SegNet.evaluate`` contract: 0-based label map."""
        if self.config.mode == "slide":
            logits = self.logits_slide(img)
        else:
            logits = self.logits_whole(img)
        return np.argmax(logits, axis=-1).astype(np.int32)


def convert_upernet(state: Mapping[str, Any], arch: str = "base") -> Dict[str, Any]:
    """mmseg ``upernet_convnext_*`` torch checkpoint → Flax variables
    ({'params': …, 'batch_stats': …}) for ConvNeXtUPerNet.

    mmseg key layout: ``backbone.*`` (mmcls ConvNeXt — delegated to
    ``convert_convnext``), ``decode_head.{psp_modules.N.1, bottleneck,
    lateral_convs.N, fpn_convs.N, fpn_bottleneck}.{conv,bn}.*`` +
    ``decode_head.conv_seg.*``, ``auxiliary_head.{convs.0,conv_seg}.*``.
    """
    from sfd2_tpu.models.convnext import convert_convnext

    sd = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k.split(".", 1)[1]
        sd[k] = np.asarray(v)

    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    bb = convert_convnext(backbone_sd, arch=arch)["params"]

    def conv_k(w):
        return jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)

    def conv_module(prefix):
        params = {
            "conv": {"kernel": conv_k(sd[f"{prefix}.conv.weight"])},
            "bn": {
                "scale": jnp.asarray(sd[f"{prefix}.bn.weight"], jnp.float32),
                "bias": jnp.asarray(sd[f"{prefix}.bn.bias"], jnp.float32),
            },
        }
        stats = {
            "bn": {
                "mean": jnp.asarray(sd[f"{prefix}.bn.running_mean"], jnp.float32),
                "var": jnp.asarray(sd[f"{prefix}.bn.running_var"], jnp.float32),
            }
        }
        return params, stats

    def cls_conv(prefix):
        return {
            "kernel": conv_k(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    dh_p: Dict[str, Any] = {}
    dh_s: Dict[str, Any] = {}
    for i in range(4):  # pool_scales
        dh_p[f"psp{i}"], dh_s[f"psp{i}"] = conv_module(
            f"decode_head.psp_modules.{i}.1"
        )
    dh_p["psp_bottleneck"], dh_s["psp_bottleneck"] = conv_module(
        "decode_head.bottleneck"
    )
    for i in range(3):
        dh_p[f"lateral{i}"], dh_s[f"lateral{i}"] = conv_module(
            f"decode_head.lateral_convs.{i}"
        )
        dh_p[f"fpn{i}"], dh_s[f"fpn{i}"] = conv_module(
            f"decode_head.fpn_convs.{i}"
        )
    dh_p["fpn_bottleneck"], dh_s["fpn_bottleneck"] = conv_module(
        "decode_head.fpn_bottleneck"
    )
    dh_p["conv_seg"] = cls_conv("decode_head.conv_seg")

    variables: Dict[str, Any] = {
        "params": {"backbone": bb, "decode_head": dh_p},
        "batch_stats": {"decode_head": dh_s},
    }
    if "auxiliary_head.conv_seg.weight" in sd:
        ah_p: Dict[str, Any] = {}
        ah_s: Dict[str, Any] = {}
        ah_p["conv0"], ah_s["conv0"] = conv_module("auxiliary_head.convs.0")
        ah_p["conv_seg"] = cls_conv("auxiliary_head.conv_seg")
        variables["params"]["auxiliary_head"] = ah_p
        variables["batch_stats"]["auxiliary_head"] = ah_s
    return variables
