"""Online semantic-label teacher for training batches.

Capability parity: ``trainer.py:281-316`` — the reference runs the mmseg
SegNet over each raw training image in a per-sample python loop
(``seg_result = self.seg.evaluate(img_numpy)``, CPU↔GPU ping-pong,
SURVEY §3.2 flags it as a train-time hot spot) and shifts labels +1.

TPU-native redesign: the whole ``raw1`` batch [B, R, R, 3] is labeled in
ONE jitted device call — normalisation, UPerNet forward, bilinear logit
upsample and argmax all fused on device. At the shipped R=512 the crop
equals the segmentor's slide window, so whole-image inference is exactly
the mmseg slide result for that size. The offline-precomputed label-map
path (SURVEY §7.2(7)) stays available via ``cli/segment_images.py`` +
``LabelDirTeacher``; this class removes the need for it when the teacher
checkpoint is on hand.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.models.upernet import (
    ADE20K_MEAN,
    ADE20K_STD,
    ConvNeXtUPerNet,
    convert_upernet,
)
from sfd2_tpu.ops.resize import resize_bilinear


class SegTeacher:
    """Batch labeler: raw RGB batch in [0, 1] → 1-based ADE20k labels."""

    def __init__(self, variables=None, model: Optional[ConvNeXtUPerNet] = None):
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
        mean = jnp.asarray(ADE20K_MEAN)
        std = jnp.asarray(ADE20K_STD)

        def label(variables, raw):
            x = (raw * 255.0 - mean) / std
            logits = self.model.apply(variables, x)
            logits = resize_bilinear(logits, raw.shape[1:3])
            # +1: mmseg 0-based argmax → the 1..150 convention
            # (``trainer.py:290``; 0 stays "unlabeled" in semantics.py).
            return jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1

        self._label = jax.jit(label)

    @classmethod
    def from_torch_checkpoint(cls, path: str | Path) -> "SegTeacher":
        import torch

        state = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        return cls(variables=convert_upernet(state))

    def label_batch(self, raw1: np.ndarray) -> np.ndarray:
        """[B, R, R, 3] float RGB in [0, 1] → [B, R, R] int32 (1..150)."""
        return np.asarray(self._label(self.variables, jnp.asarray(raw1)))


class LabelDirTeacher:
    """Offline-label fallback: per-image PNG label maps precomputed by
    ``cli/segment_images.py`` are cropped alongside the pair — kept for
    datasets where the teacher ran ahead of time. Looks up by the image's
    RELATIVE path mirrored under label_dir (bare stems collide across
    subdirectories), falling back to the legacy flat stem layout;
    missing maps yield zeros (= unlabeled, seg losses mask them)."""

    def __init__(self, label_dir: str | Path):
        self.label_dir = Path(label_dir)

    def label_image(self, name: str, hw: tuple[int, int]) -> np.ndarray:
        import cv2

        p = self.label_dir / Path(name).with_suffix(".png")
        if not p.exists():  # legacy flat layout
            p = self.label_dir / (Path(name).stem + ".png")
        if not p.exists():
            return np.zeros(hw, np.int32)
        lab = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
        if lab is None:
            return np.zeros(hw, np.int32)
        if lab.shape[:2] != hw:
            lab = cv2.resize(lab, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)
        return lab.astype(np.int32)


class SegTeacherLoader:
    """PairLoader wrapper that adds ``seg1`` to every batch via a
    SegTeacher (one device call per batch)."""

    def __init__(self, loader, teacher: SegTeacher):
        self.loader = loader
        self.teacher = teacher

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def epoch(self, epoch: int) -> Iterator[dict]:
        for batch in self.loader.epoch(epoch):
            batch = dict(batch)
            batch["seg1"] = self.teacher.label_batch(batch["raw1"])
            yield batch
