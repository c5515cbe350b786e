"""Data pipeline + trainer loop: synthetic pairs drive a tiny train run
with checkpointing and resume."""

import numpy as np
import pytest

from sfd2_tpu.training.data import (
    CatDataset,
    ImageFolderDataset,
    PairLoader,
    SyntheticPairBuilder,
)
from sfd2_tpu.training.losses import SegLossConfig
from sfd2_tpu.training.sampler import NghSampler2DS
from sfd2_tpu.training.train_step import TrainConfig
from sfd2_tpu.training.trainer import Trainer, TrainerConfig
from sfd2_tpu.training.transforms import (
    homography_from_points,
    persp_apply,
    sample_homography,
)


def test_homography_from_points(rng):
    src = np.array([[0, 0], [100, 0], [100, 80], [0, 80]], float)
    dst = src + rng.uniform(-10, 10, src.shape)
    h = homography_from_points(src, dst)
    np.testing.assert_allclose(persp_apply(h, src), dst, atol=1e-6)


def test_sample_homography_invertible(rng):
    h = sample_homography(rng, 320, 240)
    assert abs(np.linalg.det(h)) > 1e-6


def test_synthetic_pair_flow_consistency(rng):
    """aflow must map img1 pixels onto the same content in img2."""
    img = rng.random((400, 400, 3)).astype(np.float32)
    # Make content smooth so interpolation comparisons are meaningful.
    import cv2

    img = cv2.GaussianBlur(img, (0, 0), 6)
    builder = SyntheticPairBuilder(crop=128, noise=0.0, jitter=False)
    s = builder.build(rng, img)
    assert s.img1.shape == (128, 128, 3)
    assert s.aflow.shape == (128, 128, 2)
    valid = s.mask
    assert valid.mean() > 0.3
    # Check photometric consistency at a sample of valid pixels.
    ys, xs = np.nonzero(valid)
    sel = rng.choice(len(ys), 200, replace=False)
    raw2 = s.gray2[..., 0]
    raw1 = s.gray1[..., 0]
    errs = []
    for i in sel:
        y, x = ys[i], xs[i]
        tx, ty = s.aflow[y, x]
        txi, tyi = int(round(tx)), int(round(ty))
        if 0 <= txi < 128 and 0 <= tyi < 128:
            errs.append(abs(raw1[y, x] - raw2[tyi, txi]))
    assert np.median(errs) < 0.05, np.median(errs)


def test_cat_dataset(tmp_path, rng):
    import cv2

    for d in ["a", "b"]:
        (tmp_path / d).mkdir()
        for i in range(3):
            cv2.imwrite(
                str(tmp_path / d / f"{i}.png"),
                (rng.random((64, 64, 3)) * 255).astype(np.uint8),
            )
    ds = CatDataset([ImageFolderDataset(tmp_path / "a"), ImageFolderDataset(tmp_path / "b")])
    assert len(ds) == 6
    assert ds.get_image(0).shape == (64, 64, 3)
    assert ds.get_image(5).shape == (64, 64, 3)


@pytest.mark.slow
def test_trainer_runs_and_resumes(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        cv2.imwrite(
            str(img_dir / f"{i}.png"),
            (rng.random((160, 160, 3)) * 255).astype(np.uint8),
        )
    ds = ImageFolderDataset(img_dir)
    builder = SyntheticPairBuilder(crop=64, n_crop_tries=2)
    loader = PairLoader(ds, builder, batch_size=2, workers=2)
    cfg = TrainerConfig(
        epochs=2,
        iters_per_epoch=2,
        batch_size=2,
        log_every=1,
        save_dir=str(tmp_path / "runs"),
        run_name="t",
        train=TrainConfig(
            loss=SegLossConfig(topk_per_half=16, seg_desc=False, seg_det=False),
            sampler=NghSampler2DS(ngh=3, subq=-4, pos_d=1, neg_d=2, border=3, subd_neg=-4),
        ),
    )
    trainer = Trainer(loader, cfg)
    trainer.train()
    run_dir = cfg.run_dir()
    assert (run_dir / "last.ckpt").exists()
    assert (run_dir / "best.ckpt").exists()
    assert (run_dir / "log.txt").exists()
    step_before = int(trainer.state.step)
    assert step_before == 4  # 2 epochs × 2 iters

    # Resume continues from epoch 2.
    trainer2 = Trainer(loader, cfg)
    assert trainer2.resume()
    assert trainer2.start_epoch == 2
    assert int(trainer2.state.step) == 4
