"""Global retrieval-descriptor extraction CLI
(``python -m sfd2_tpu.cli.extract_global``).

Capability parity: ``hloc/extract_features.py`` run with the ``dir`` conf
(``hloc/extractors/dir.py``) — computes one global descriptor per image.
Output is the ``.npz`` (names[], descriptors[N,D]) consumed by
``sfd2_tpu.cli.pairs_from retrieval``.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from sfd2_tpu.pipeline.extract import load_image
from sfd2_tpu.pipeline.extractors import GLOBAL_EXTRACTOR_REGISTRY


def list_images(root: Path):
    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    return sorted(
        str(p.relative_to(root))
        for p in root.rglob("*")
        if p.suffix.lower() in exts
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True,
                        help=".npz with names[] and descriptors[N,D]")
    parser.add_argument("--extractor", default="dir",
                        choices=sorted(GLOBAL_EXTRACTOR_REGISTRY))
    parser.add_argument("--image_list", type=Path, default=None,
                        help="optional file of relative image paths")
    parser.add_argument("--resize_max", type=int, default=1024)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    extract = GLOBAL_EXTRACTOR_REGISTRY[args.extractor]()
    names = (
        [l.strip() for l in args.image_list.read_text().splitlines() if l.strip()]
        if args.image_list
        else list_images(args.image_dir)
    )
    descs = []
    for n in names:
        img, _ = load_image(args.image_dir / n, args.resize_max)
        descs.append(extract(img))
    args.output.parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.output, names=np.array(names), descriptors=np.stack(descs))
    logging.info("wrote %d global descriptors → %s", len(names), args.output)


if __name__ == "__main__":
    main()
