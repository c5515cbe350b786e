"""Pair matching CLI (``python -m sfd2_tpu.cli.match_features``).

Capability parity: ``hloc/match_features.py`` — pair-list or exhaustive
matching into an HDF5 match store, resumable.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from sfd2_tpu.io.feature_store import FeatureStore, MatchStore
from sfd2_tpu.pipeline.match import MATCHER_CONFS, MatchConfig, match_pairs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--features", type=Path, required=True)
    parser.add_argument("--export_fn", type=Path, required=True)
    parser.add_argument("--pairs", type=Path, default=None)
    parser.add_argument("--exhaustive", action="store_true")
    parser.add_argument("--conf", default="NNM", choices=MATCHER_CONFS)
    parser.add_argument("--max_keypoints", type=int, default=4096)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    with FeatureStore(args.features, "r") as fs:
        if args.exhaustive:
            names = sorted(fs.keys())
            pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
        else:
            pairs = [
                tuple(l.split(" ")[:2])
                for l in Path(args.pairs).read_text().splitlines()
                if l.strip()
            ]
        args.export_fn.parent.mkdir(parents=True, exist_ok=True)
        with MatchStore(args.export_fn, "a") as ms:
            n = match_pairs(
                fs, pairs, ms,
                MatchConfig(
                    matcher=args.conf,
                    max_keypoints=args.max_keypoints,
                    batch_size=args.batch_size,
                ),
            )
    logging.info("matched %d pairs → %s", n, args.export_fn)


if __name__ == "__main__":
    main()
