"""Baseline local-feature extractor registry.

Capability parity: ``hloc/extractors/`` + ``hloc/utils/base_model.py``
(BaseModel + dynamic_load plug-ins) and the ``hloc/extract_features.py``
conf registry. Implemented plug-ins:

  sfd2        — the flagship ResSegNetV2 pipeline (sfd2_tpu.pipeline.extract)
  superpoint  — SuperPoint detector/descriptor (``hloc/extractors/superpoint.py``)
  r2d2        — Quad_L2Net_ConfCFS reliability×repeatability scoring
                (``hloc/extractors/r2d2.py``)
  sift        — OpenCV SIFT (``hloc/extractors/sift.py``)
  d2net       — VGG16-conv4_3 dense features + hard detection
                (``hloc/extractors/d2net.py``; models/baselines.py)
  caps        — SIFT keypoints + ResUNet coarse‖fine descriptors
                (``hloc/extractors/caps.py``)
  sgd2        — L2SegNetNB full-res score/desc (``hloc/extractors/sgd2.py``)

  dir         — ResNet-101 AP-GeM global retrieval descriptors
                (``hloc/extractors/dir.py``; models/retrieval.py) — a
                GLOBAL extractor: returns one [D] vector per image for
                pairs_from_retrieval, not keypoints.

Checkpoints for the external baselines are not vendored (weights load via
the converters in models/convert_baselines.py / models/retrieval.py when
provided).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.io.feature_store import ImageFeatures
from sfd2_tpu.ops.extract import extract_keypoints
from sfd2_tpu.ops.nms import simple_nms

_UNSUPPORTED: Dict[str, str] = {}


@dataclasses.dataclass
class BaselineConfig:
    max_keypoints: int = 2048
    conf_threshold: float = 0.005
    nms_radius: int = 4


def _topk_from_maps(score_map, desc_map, cfg: BaselineConfig, desc_full_res: bool):
    """Shared NMS→top-K→descriptor-lookup for map-producing baselines."""
    kp = extract_keypoints(
        score_map,
        desc_map,
        None,
        max_keypoints=cfg.max_keypoints,
        conf_threshold=cfg.conf_threshold,
        nms_radius=cfg.nms_radius,
    )
    xy = np.asarray(kp.xy[0])
    sc = np.asarray(kp.scores[0])
    de = np.asarray(kp.descriptors[0])
    va = np.asarray(kp.valid[0])
    return ImageFeatures(xy[va], de[va], sc[va], None)


def make_superpoint(cfg: BaselineConfig = BaselineConfig(), variables=None):
    from sfd2_tpu.models.superpoint import SuperPoint

    model = SuperPoint()
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))

    def extract(image: np.ndarray) -> ImageFeatures:
        gray = image @ np.array([0.299, 0.587, 0.114], np.float32)
        h, w = gray.shape
        hp, wp = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        buf = np.zeros((1, hp, wp, 1), np.float32)
        buf[0, :h, :w, 0] = gray
        out = model.apply(variables, jnp.asarray(buf))
        return _topk_from_maps(out["scores"], out["descs"], cfg, False)

    return extract


def make_r2d2(cfg: BaselineConfig = BaselineConfig(), variables=None):
    from sfd2_tpu.models.r2d2 import QuadL2NetConfCFS

    model = QuadL2NetConfCFS()
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def extract(image: np.ndarray) -> ImageFeatures:
        out = model.apply(variables, jnp.asarray(image[None]))
        score = out["reliability"] * out["repeatability"]
        return _topk_from_maps(score, out["descriptors"], cfg, True)

    return extract


def make_sift(cfg: BaselineConfig = BaselineConfig()):
    import cv2

    sift = cv2.SIFT_create(nfeatures=cfg.max_keypoints)

    def extract(image: np.ndarray) -> ImageFeatures:
        gray = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        if gray.ndim == 3:
            gray = cv2.cvtColor(gray, cv2.COLOR_RGB2GRAY)
        kps, desc = sift.detectAndCompute(gray, None)
        if not kps:
            return ImageFeatures(
                np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32),
                np.zeros(0, np.float32), None,
            )
        xy = np.array([k.pt for k in kps], np.float32)
        sc = np.array([k.response for k in kps], np.float32)
        desc = desc.astype(np.float32)
        desc /= np.maximum(np.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-sc)[: cfg.max_keypoints]
        return ImageFeatures(xy[order], desc[order], sc[order], None)

    return extract


def make_d2net(cfg: BaselineConfig = BaselineConfig(), variables=None):
    """D2-Net (``hloc/extractors/d2net.py``): caffe-normalised BGR input,
    VGG16-conv4_3 dense features (stride 4), hard detection (channel max
    ∧ spatial local max ∧ edge filter), descriptors = L2-normalised
    feature vectors at fired cells."""
    from sfd2_tpu.models.baselines import D2NetDense, d2net_hard_detect

    model = D2NetDense(use_relu=True)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # Caffe mean, BGR order (``d2net.py:43-45``).
    mean_bgr = np.array([103.939, 116.779, 123.68], np.float32)

    def extract(image: np.ndarray) -> ImageFeatures:
        bgr = image[..., ::-1] * 255.0 - mean_bgr
        feats = model.apply(variables, jnp.asarray(bgr[None]))
        fired, score = d2net_hard_detect(feats)
        fired_np = np.asarray(fired[0])
        score_np = np.asarray(score[0])
        f_np = np.asarray(feats[0])
        ys, xs = np.nonzero(fired_np)
        sc = score_np[ys, xs]
        order = np.argsort(-sc)[: cfg.max_keypoints]
        ys, xs, sc = ys[order], xs[order], sc[order]
        de = f_np[ys, xs]
        de /= np.maximum(np.linalg.norm(de, axis=1, keepdims=True), 1e-12)
        # fmap stride 4; upscale_positions ×2 twice: p·4 + 1.5.
        xy = np.stack([xs * 4.0 + 1.5, ys * 4.0 + 1.5], -1).astype(np.float32)
        return ImageFeatures(xy, de, sc.astype(np.float32), None)

    return extract


def make_caps(cfg: BaselineConfig = BaselineConfig(), variables=None):
    """CAPS (``hloc/extractors/caps.py:380-443``): OpenCV SIFT detection
    (nOctaveLayers 5, contrast 0.03, edge 8) + ResUNet coarse‖fine
    descriptors sampled at the keypoints."""
    import cv2

    from sfd2_tpu.models.baselines import CapsResUNet, caps_sample_descriptors

    model = CapsResUNet()
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sift = cv2.SIFT_create(nOctaveLayers=5, contrastThreshold=0.03,
                           edgeThreshold=8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def extract(image: np.ndarray) -> ImageFeatures:
        gray = cv2.cvtColor(
            (np.clip(image, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
        )
        kps = sift.detect(gray, None)
        if not kps:
            return ImageFeatures(
                np.zeros((0, 2), np.float32), np.zeros((0, 256), np.float32),
                np.zeros(0, np.float32), None,
            )
        xy = np.array([k.pt for k in kps], np.float32)
        sc = np.array([k.response for k in kps], np.float32)
        order = np.argsort(-sc)[: cfg.max_keypoints]
        xy, sc = xy[order], sc[order]
        norm = (image - mean) / std
        coarse, fine = model.apply(variables, jnp.asarray(norm[None]))
        de = np.asarray(
            caps_sample_descriptors(
                coarse[0], fine[0], jnp.asarray(xy), image.shape[:2]
            )
        )
        return ImageFeatures(xy, de, sc, None)

    return extract


def make_sgd2(cfg: BaselineConfig = BaselineConfig(), variables=None):
    """SGD2 (``hloc/extractors/sgd2.py:850``): L2SegNetNB full-resolution
    sigmoid score + 128-D descriptors, ImageNet normalisation."""
    from sfd2_tpu.models.baselines import L2SegNetNB

    model = L2SegNetNB(outdim=128)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def extract(image: np.ndarray) -> ImageFeatures:
        norm = (image - mean) / std
        score, desc = model.apply(variables, jnp.asarray(norm[None]))
        return _topk_from_maps(score, desc, cfg, True)

    return extract


def make_dir(cfg: BaselineConfig = BaselineConfig(), variables=None,
             whiten_pca=None, whiten_params=None, depths=(3, 4, 23, 3)):
    """DIR (``hloc/extractors/dir.py``): ResNet-101 AP-GeM GLOBAL
    descriptor. Returns a callable image → [D] float32 vector (consumed
    by pairs_from_retrieval / the .npz retrieval files, not the keypoint
    store). `whiten_pca`: optional (mean, components, variances) applying
    dirtorch's PCA power-whitening (``dir.py:69-73``)."""
    from sfd2_tpu.models.retrieval import (
        DIR_MEAN, DIR_STD, ResNetGeM, pca_whiten,
    )

    model = ResNetGeM(depths=tuple(depths))
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fwd = jax.jit(model.apply)

    def extract(image: np.ndarray) -> np.ndarray:
        norm = (image - DIR_MEAN) / DIR_STD
        desc = np.asarray(fwd(variables, jnp.asarray(norm[None])))
        if whiten_pca is not None:
            desc = pca_whiten(desc, *whiten_pca, **(whiten_params or {}))
        return desc[0].astype(np.float32)

    return extract


def make_sfd2(cfg: BaselineConfig = BaselineConfig(), variables=None):
    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.pipeline.extract import ExtractionConfig, Extractor

    model = ResSegNetV2(require_stability=True)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ex = Extractor(
        variables,
        ExtractionConfig(
            max_keypoints=cfg.max_keypoints, conf_threshold=cfg.conf_threshold
        ),
        model=model,
    )

    def extract(image: np.ndarray) -> ImageFeatures:
        return ex.extract_batch([image])[0]

    return extract


EXTRACTOR_REGISTRY: Dict[str, Callable] = {
    "sfd2": make_sfd2,
    "superpoint": make_superpoint,
    "r2d2": make_r2d2,
    "sift": make_sift,
    "d2net": make_d2net,
    "caps": make_caps,
    "sgd2": make_sgd2,
}

# Global (whole-image retrieval) extractors — separate registry because
# the output contract differs (one vector per image, no keypoints).
GLOBAL_EXTRACTOR_REGISTRY: Dict[str, Callable] = {
    "dir": make_dir,
}


def dynamic_load(name: str, cfg: Optional[BaselineConfig] = None, **kw):
    """hloc-style loader: name → extract callable."""
    if name in _UNSUPPORTED:
        raise NotImplementedError(f"extractor {name!r}: {_UNSUPPORTED[name]}")
    if name in EXTRACTOR_REGISTRY:
        return EXTRACTOR_REGISTRY[name](cfg or BaselineConfig(), **kw)
    if name in GLOBAL_EXTRACTOR_REGISTRY:
        return GLOBAL_EXTRACTOR_REGISTRY[name](cfg or BaselineConfig(), **kw)
    raise KeyError(
        f"unknown extractor {name!r}; have "
        f"{sorted(EXTRACTOR_REGISTRY) + sorted(GLOBAL_EXTRACTOR_REGISTRY)}"
    )
