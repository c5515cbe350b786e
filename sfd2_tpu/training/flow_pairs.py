"""Precomputed-flow pair datasets and the 16-bit flow-PNG codec.

Capability parity: ``datasets/pair_dataset.py`` — the ``_flow2png`` /
``_png2flow`` fixed-point codec (flow × 16 rounded into int16 stored as a
2-channel uint8-view PNG), ``StillPairDataset`` (trivial identity pairs,
e.g. the day↔style-transferred-night stills of
``AachenPairs_StyleTransferDayNight``) and the optical-flow pair layout of
``AachenPairs_OpticalFlow`` (``datasets/aachen.py:77-142``: per-pair
flow.png + mask.png files).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np


# The on-disk format is fixed-point: flow values in 1/16-px units stored
# as little-endian int16 pairs reinterpreted as a 4-channel uint8 PNG.
_FLOW_SCALE = 16.0
_I16_MIN, _I16_MAX = np.iinfo(np.int16).min, np.iinfo(np.int16).max


def flow_to_png(flow: np.ndarray, path) -> np.ndarray:
    """Encode [H, W, 2] float flow in the fixed-point PNG format.
    Returns the quantised flow actually stored (1/16-px resolution)."""
    from PIL import Image

    fixed = np.rint(np.asarray(flow) * _FLOW_SCALE)
    fixed = np.clip(fixed, _I16_MIN, _I16_MAX).astype(np.int16)
    Image.fromarray(fixed.view(np.uint8)).save(path)
    return fixed.astype(np.float32) / _FLOW_SCALE


def png_to_flow(path) -> np.ndarray:
    """Decode a fixed-point flow PNG back to float32 [H, W, 2]."""
    from PIL import Image

    packed = np.asarray(Image.open(path), dtype=np.uint8)
    return packed.view(np.int16).astype(np.float32) / _FLOW_SCALE


class StillPairDataset:
    """Identity pairs over a base image dataset: img1 == img2, aflow is
    the (scaled) identity grid — used for style-transferred stills where
    the two renderings are pixel-aligned."""

    def __init__(self, base, pairs: Optional[Sequence[Tuple[int, int]]] = None):
        self.base = base
        self.pairs = list(pairs) if pairs is not None else [
            (i, i) for i in range(len(base))
        ]

    def __len__(self):
        return len(self.pairs)

    def get_pair(self, idx: int):
        i, j = self.pairs[idx]
        img1 = self.base.get_image(i)
        img2 = self.base.get_image(j)
        h, w = img1.shape[:2]
        sy = img2.shape[0] / h
        sx = img2.shape[1] / w
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        aflow = np.stack([xs * sx, ys * sy], axis=-1)
        mask = np.ones((h, w), bool)
        return img1, img2, aflow, mask


class FlowPairDataset:
    """Image pairs with precomputed flow/mask PNGs.

    Layout: a pair list of (name1, name2, flow_png, mask_png); masks are
    uint8 PNGs where nonzero = valid. Invalid flow becomes NaN, matching
    the PairLoader contract."""

    def __init__(self, image_root, entries: Sequence[Tuple[str, str, str, str]]):
        self.root = Path(image_root)
        self.entries = list(entries)

    def __len__(self):
        return len(self.entries)

    def _load_image(self, name):
        import cv2

        bgr = cv2.imread(str(self.root / name))
        if bgr is None:
            raise FileNotFoundError(self.root / name)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

    def get_pair(self, idx: int):
        from PIL import Image

        name1, name2, flow_png, mask_png = self.entries[idx]
        img1 = self._load_image(name1)
        img2 = self._load_image(name2)
        flow = png_to_flow(self.root / flow_png)
        mask = np.asarray(Image.open(self.root / mask_png))
        if mask.ndim == 3:  # RGB(A)-saved masks: any nonzero channel = valid
            mask = mask.max(axis=-1)
        mask = mask > 0
        h, w = img1.shape[:2]
        if flow.shape[:2] != (h, w) or mask.shape != (h, w):
            raise ValueError(
                f"flow/mask shape {flow.shape[:2]}/{mask.shape} does not "
                f"match image {name1} shape {(h, w)}"
            )
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        aflow = flow + np.stack([xs, ys], axis=-1)
        aflow[~mask] = np.nan
        return img1, img2, aflow, mask
