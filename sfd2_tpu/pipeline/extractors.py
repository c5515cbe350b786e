"""Baseline local-feature extractor registry.

Capability parity: ``hloc/extractors/`` + ``hloc/utils/base_model.py``
(BaseModel + dynamic_load plug-ins) and the ``hloc/extract_features.py``
conf registry. Implemented plug-ins:

  sfd2        — the flagship ResSegNetV2 pipeline (sfd2_tpu.pipeline.extract)
  superpoint  — SuperPoint detector/descriptor (``hloc/extractors/superpoint.py``)
  r2d2        — Quad_L2Net_ConfCFS reliability×repeatability scoring
                (``hloc/extractors/r2d2.py``)
  sift        — OpenCV SIFT (``hloc/extractors/sift.py``)

The reference's remaining baselines (d2net, caps, dir global descriptors,
the sgd2 prototypes) pull external third-party checkpoints/repos and are
intentionally not vendored; the registry raises a descriptive error for
them.
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

_UNSUPPORTED = {
    "d2net": "external D2-Net weights not vendored",
    "caps": "external CAPS weights not vendored",
    "dir": "global-descriptor DIR model not vendored",
    "sgd2": "SGD2 prototype superseded by sfd2",
}


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
}


def dynamic_load(name: str, cfg: Optional[BaselineConfig] = None, **kw):
    """hloc-style loader: name → extract callable."""
    if name in _UNSUPPORTED:
        raise NotImplementedError(f"extractor {name!r}: {_UNSUPPORTED[name]}")
    if name not in EXTRACTOR_REGISTRY:
        raise KeyError(f"unknown extractor {name!r}; have {sorted(EXTRACTOR_REGISTRY)}")
    return EXTRACTOR_REGISTRY[name](cfg or BaselineConfig(), **kw)
