"""Feature-extraction CLI (``python -m sfd2_tpu.cli.extract_features``).

Capability parity: ``extract_localization.py`` (main CLI with conf
registry, image-list input, HDF5 export, resume) and
``hloc/extract_features.py``'s generic driver.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from pathlib import Path

from sfd2_tpu.io.feature_store import FeatureStore
from sfd2_tpu.models.convert import convert_checkpoint
from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.pipeline.extract import EXTRACTION_CONFS, Extractor


def list_images(image_dir: Path, image_list: Path | None):
    if image_list:
        return [l.strip() for l in Path(image_list).read_text().splitlines() if l.strip()]
    exts = (".jpg", ".jpeg", ".png")
    return sorted(
        str(p.relative_to(image_dir))
        for p in image_dir.rglob("*")
        if p.suffix.lower() in exts
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", type=Path, required=True)
    parser.add_argument("--image_list", type=Path, default=None)
    parser.add_argument("--export_fn", type=Path, required=True)
    parser.add_argument("--conf", default="sfd2-n4096-r1600", choices=EXTRACTION_CONFS)
    parser.add_argument("--weights", type=Path, default=None,
                        help="torch .pth checkpoint to convert, or .ckpt")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--as_half", action="store_true",
                        help="store descriptors as float16 (half the disk)")
    parser.add_argument("--mask_dir", type=Path, default=None,
                        help="semantic-mask dir (same relative paths); "
                             "enables labeled-first top-K + per-keypoint "
                             "labels for NNML (nets/extractor.py:240-326)")
    parser.add_argument("--mask_suffix", default=".png")
    parser.add_argument("--extractor", default="sfd2",
                        help="baseline extractor name (hloc extract_features "
                             "parity): sfd2|superpoint|r2d2|sift|d2net|caps|sgd2")
    parser.add_argument("--bf16", choices=["auto", "on", "off"], default="auto",
                        help="trunk numerics: auto = bfloat16 on TPU. Use "
                             "'off' for recall-parity / validation runs "
                             "(bit-comparable to the f32 reference)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.extractor == "dir":
        parser.error(
            "'dir' is a GLOBAL retrieval extractor (one vector per image); "
            "this CLI writes per-keypoint stores — use "
            "python -m sfd2_tpu.cli.extract_global instead"
        )
    if args.mask_dir is not None and args.extractor != "sfd2":
        parser.error(
            "--mask_dir (semantic labeled-first extraction) is only "
            "supported by the sfd2 extractor; baseline extractors have no "
            "label chain (nets/extractor.py:240-326)"
        )
    cfg = EXTRACTION_CONFS[args.conf]
    if args.as_half:
        cfg = dataclasses.replace(cfg, as_half=True)
    if args.bf16 != "auto":
        cfg = dataclasses.replace(cfg, bf16=args.bf16 == "on")
    model = ResSegNetV2(require_stability=True)
    if args.weights and str(args.weights).endswith(".pth"):
        variables = convert_checkpoint(str(args.weights))
    else:
        import jax
        import jax.numpy as jnp

        variables = model.init(
            jax.random.PRNGKey(args.seed), jnp.zeros((1, 256, 256, 3))
        )
        if args.weights:
            from flax import serialization

            variables = serialization.from_bytes(
                variables, Path(args.weights).read_bytes()
            )

    names = list_images(args.image_dir, args.image_list)
    args.export_fn.parent.mkdir(parents=True, exist_ok=True)
    if args.extractor != "sfd2":
        # Baseline plug-in path (hloc/extract_features.py drivers): host
        # loop over images, per-image ImageFeatures into the store.
        from sfd2_tpu.io.feature_store import ImageFeatures
        from sfd2_tpu.pipeline.extract import load_image
        from sfd2_tpu.pipeline.extractors import BaselineConfig, dynamic_load

        extract = dynamic_load(
            args.extractor,
            BaselineConfig(max_keypoints=cfg.max_keypoints,
                           conf_threshold=cfg.conf_threshold),
        )
        count = 0
        with FeatureStore(args.export_fn, "a") as store:
            for nme in names:
                if nme in store:
                    continue
                im, (w0, h0) = load_image(
                    Path(args.image_dir) / nme, cfg.resize_max
                )
                f = extract(im)
                import numpy as np

                scale = np.array(
                    [w0 / im.shape[1], h0 / im.shape[0]], np.float32
                )
                kp = (f.keypoints + 0.5) * scale - 0.5
                store.write(
                    nme,
                    ImageFeatures(kp, f.descriptors, f.scores,
                                  np.array([w0, h0]), f.labels),
                    as_half=cfg.as_half,
                )
                count += 1
        logging.info("extracted %d images → %s", count, args.export_fn)
        return
    extractor = Extractor(variables, cfg, model=model)
    with FeatureStore(args.export_fn, "a") as store:
        n = extractor.extract_to_store(
            args.image_dir, names, store,
            mask_dir=args.mask_dir, mask_suffix=args.mask_suffix,
        )
    logging.info("extracted %d images → %s", n, args.export_fn)


if __name__ == "__main__":
    main()
