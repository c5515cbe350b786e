"""TransformedPairs-style pair jitter + tensorboard scalar export.

Parity targets: ``datasets/pair_dataset.py:182-229`` (TransformedPairs:
re-warp img_b of an existing pair and compose the ground-truth flow
through the new homography) and ``trainer.py:96,218-230`` (tensorboardX
scalar events every N iterations).
"""

import struct

import numpy as np

from sfd2_tpu.training.data import (
    PairLoader,
    TransformedPairBuilder,
    PrecomputedPairBuilder,
)
from sfd2_tpu.utils.tb_writer import ScalarEventWriter, _crc32c


class _TinyPairDataset:
    """One precomputed identity pair: img2 == img1, aflow == identity."""

    def __init__(self, rng, n=3, hw=(96, 128)):
        self.h, self.w = hw
        self.imgs = [
            (rng.random((self.h, self.w, 3)) * 255).astype(np.uint8)
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.imgs)

    def get_pair(self, i):
        ys, xs = np.mgrid[0 : self.h, 0 : self.w].astype(np.float32)
        aflow = np.stack([xs, ys], axis=-1)
        return self.imgs[i], self.imgs[i].copy(), aflow, np.ones((self.h, self.w), bool)


def test_transformed_pair_flow_consistency(rng):
    """For an identity input pair, the builder's output flow must map
    img1 pixels onto the warped img2's content (flow == H applied to
    identity), verified by sampling img2 at flow targets."""
    ds = _TinyPairDataset(rng)
    b = TransformedPairBuilder(crop=64, noise=0.0, jitter=False)
    s = b.build_from_pair(rng, *ds.get_pair(0))
    assert s.img1.shape == (64, 64, 3) and s.img2.shape == (64, 64, 3)
    valid = s.mask & np.isfinite(s.aflow).all(-1)
    assert valid.sum() > 200  # warp keeps a usable overlap
    ys, xs = np.nonzero(valid)
    # Limit to a sample for speed.
    sel = rng.choice(len(ys), size=min(200, len(ys)), replace=False)
    ys, xs = ys[sel], xs[sel]
    tx = s.aflow[ys, xs, 0]
    ty = s.aflow[ys, xs, 1]
    txi = np.clip(np.round(tx).astype(int), 0, 63)
    tyi = np.clip(np.round(ty).astype(int), 0, 63)
    # Un-normalise both crops back to raw pixel space for comparison.
    a = s.img1[ys, xs]
    bpix = s.img2[tyi, txi]
    # ImageNet-normalised images: compare correlation, not equality
    # (bilinear warp blurs). Matching pixels must correlate strongly.
    corr = np.corrcoef(a.reshape(len(ys), -1).ravel(), bpix.reshape(len(ys), -1).ravel())[0, 1]
    assert corr > 0.8, corr


def test_transformed_pairs_through_loader(rng):
    ds = _TinyPairDataset(rng)
    loader = PairLoader(
        ds, TransformedPairBuilder(crop=64, noise=0.02), batch_size=2, workers=2
    )
    batch = next(iter(loader.epoch(0)))
    assert batch["image1"].shape == (2, 64, 64, 3)
    assert batch["aflow"].shape == (2, 64, 64, 2)
    # isinstance check in PairLoader must keep the subclass (not replace
    # it with a plain PrecomputedPairBuilder).
    assert isinstance(loader.builder, PrecomputedPairBuilder)
    # Flow is jittered: not identity on average.
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    ident = np.stack([xs, ys], -1)
    af = batch["aflow"][0]
    ok = np.isfinite(af).all(-1)
    assert not np.allclose(af[ok], ident[ok], atol=0.5)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros → 0x8a9136aa.
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_tb_events_readable_by_tensorboard(tmp_path):
    with ScalarEventWriter(tmp_path / "tb") as w:
        for i in range(5):
            w.add_scalar("train/loss", 1.0 / (i + 1), i)
        w.add_scalar("train/lr", 1e-4, 4)

    # Parse back with the real TensorBoard reader → format compatibility.
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "train/loss" in tags and "train/lr" in tags
    losses = acc.Scalars("train/loss")
    assert len(losses) == 5
    assert losses[0].step == 0 and abs(losses[0].value - 1.0) < 1e-6
    assert losses[4].step == 4 and abs(losses[4].value - 0.2) < 1e-6
