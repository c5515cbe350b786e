"""Online/offline semantic teacher chain: SegTeacher batch labeling,
loader wrapper, segment_images CLI, train-step consumption."""

import numpy as np
import pytest

import sfd2_tpu.models.convnext as cn
from sfd2_tpu.models.upernet import ConvNeXtUPerNet

cn.ARCH_SETTINGS["_testseg"] = {
    "depths": (1, 1, 1, 1), "channels": (8, 16, 32, 64),
}


def _tiny_model(classes=9):
    return ConvNeXtUPerNet(
        arch="_testseg", num_classes=classes, head_channels=16,
        aux_channels=12,
    )


def test_seg_teacher_label_batch():
    from sfd2_tpu.training.seg_teacher import SegTeacher

    teacher = SegTeacher(model=_tiny_model())
    raw = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    labels = teacher.label_batch(raw)
    assert labels.shape == (2, 64, 64)
    assert labels.dtype == np.int32
    # 1-based convention (mmseg argmax + 1, trainer.py:290).
    assert labels.min() >= 1 and labels.max() <= 9


def test_seg_teacher_loader_adds_seg1():
    from sfd2_tpu.training.data import PairLoader, SyntheticPairBuilder
    from sfd2_tpu.training.seg_teacher import SegTeacher, SegTeacherLoader

    class OneImage:
        def __len__(self):
            return 2

        def get_image(self, i):
            return np.random.RandomState(i).rand(96, 96, 3).astype(np.float32)

    loader = PairLoader(
        OneImage(), SyntheticPairBuilder(crop=64), batch_size=2, workers=1
    )
    wrapped = SegTeacherLoader(loader, SegTeacher(model=_tiny_model()))
    batch = next(iter(wrapped.epoch(0)))
    assert "seg1" in batch
    assert batch["seg1"].shape == batch["mask"].shape
    assert batch["seg1"].min() >= 1
    # passthrough of the wrapped loader's attributes
    assert wrapped.batch_size == 2


def test_label_dir_teacher_roundtrip(tmp_path):
    import cv2

    from sfd2_tpu.training.seg_teacher import LabelDirTeacher

    lab = np.random.RandomState(3).randint(0, 151, (40, 50)).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "img_a.png"), lab)
    t = LabelDirTeacher(tmp_path)
    got = t.label_image("img_a.jpg", (40, 50))
    np.testing.assert_array_equal(got, lab.astype(np.int32))
    # missing file → zeros (unlabeled; seg losses mask them)
    assert t.label_image("nope.jpg", (8, 8)).sum() == 0
    # size mismatch → nearest resize
    assert t.label_image("img_a.jpg", (20, 25)).shape == (20, 25)


def test_segment_images_cli(tmp_path, monkeypatch):
    import cv2

    from sfd2_tpu.cli import segment_images
    from sfd2_tpu.models import upernet

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for name in ("a.jpg", "b.png"):
        cv2.imwrite(str(img_dir / name), (rng.rand(50, 60, 3) * 255).astype(np.uint8))

    # Shrink the model for the CLI smoke run.
    orig = upernet.Segmentor.__init__

    def tiny_init(self, variables=None, config=None, model=None):
        orig(self, variables=variables, config=config, model=_tiny_model())

    monkeypatch.setattr(upernet.Segmentor, "__init__", tiny_init)
    out_dir = tmp_path / "labels"
    segment_images.main([
        "--image_dir", str(img_dir), "--out_dir", str(out_dir),
        "--mode", "whole",
    ])
    for stem in ("a", "b"):
        lab = cv2.imread(str(out_dir / f"{stem}.png"), cv2.IMREAD_UNCHANGED)
        assert lab is not None and lab.shape == (50, 60)
        assert lab.min() >= 1  # 1-based on disk


def test_train_step_consumes_teacher_labels():
    """End-to-end: teacher labels → TrainBatch.seg1 → seg losses finite."""
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.training.seg_teacher import SegTeacher

    teacher = SegTeacher(model=_tiny_model(classes=150))
    raw = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    seg1 = teacher.label_batch(raw)
    from sfd2_tpu.training.semantics import semantic_to_confidence

    conf = np.unique(np.asarray(semantic_to_confidence(jnp.asarray(seg1))))
    allowed = np.array([0.1, 0.5, 1.0], np.float32)
    assert np.all(np.min(np.abs(conf[:, None] - allowed[None, :]), axis=1) < 1e-6)
