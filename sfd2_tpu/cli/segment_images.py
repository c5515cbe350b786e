"""Semantic-label precompute CLI (``python -m sfd2_tpu.cli.segment_images``).

Capability parity: the reference labels training images online through
mmseg (``nets/semseg/segnet.py``, ``trainer.py:281-316``). This framework
supports both online labeling (``training/seg_teacher.SegTeacher``) and
the offline path sanctioned by SURVEY §7.2(7): this CLI runs the in-repo
UPerNet-ConvNeXt segmentor over an image folder and writes one uint8 PNG
label map per image (1-based ADE20k ids, 0 = unlabeled) for
``LabelDirTeacher`` / dataset loaders to consume.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def list_images(root: Path):
    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    return sorted(
        p for p in root.rglob("*") if p.suffix.lower() in exts
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", type=Path, required=True)
    parser.add_argument("--out_dir", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="mmseg upernet_convnext torch checkpoint "
                             "(converted on load); random weights if absent "
                             "(smoke runs only)")
    parser.add_argument("--mode", choices=["slide", "whole"], default="slide",
                        help="slide = shipped test_cfg (512 crop / 341 stride)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import cv2

    from sfd2_tpu.models.upernet import Segmentor, SegmentorConfig, convert_upernet

    variables = None
    if args.checkpoint is not None:
        import torch

        state = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        variables = convert_upernet(state)
    else:
        logging.warning("no --checkpoint: labeling with RANDOM weights")
    seg = Segmentor(variables=variables, config=SegmentorConfig(mode=args.mode))

    args.out_dir.mkdir(parents=True, exist_ok=True)
    images = list_images(args.image_dir)
    for p in images:
        # Mirror the relative path under out_dir: bare stems collide
        # across subdirectories (db/1000.jpg vs sequences/1000.jpg in
        # Aachen layouts) and would silently skip the second image.
        out = args.out_dir / p.relative_to(args.image_dir).with_suffix(".png")
        if out.exists():
            continue
        out.parent.mkdir(parents=True, exist_ok=True)
        bgr = cv2.imread(str(p))
        if bgr is None:
            logging.warning("unreadable image %s", p)
            continue
        labels = seg.evaluate(bgr[:, :, ::-1]) + 1  # 1-based (trainer.py:290)
        cv2.imwrite(str(out), labels.astype(np.uint8))
    logging.info("labeled %d images → %s", len(images), args.out_dir)


if __name__ == "__main__":
    main()
