"""Localization serving daemon (``python -m sfd2_tpu.cli.serve``).

Production counterpart of the reference's one-shot benchmark scripts
(``it_loc/localizer.py`` runs a query list and exits): loads the SfM
model + feature store once, compiles the match/PnP/refine programs with
a warmup query, then serves `POST /localize` until stopped. See
``sfd2_tpu/serving/server.py`` for the API.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from sfd2_tpu.io.colmap_model import read_model
from sfd2_tpu.io.feature_store import FeatureStore
from sfd2_tpu.localization.engine import LocalizerConfig
from sfd2_tpu.serving.server import LocalizationService, make_server
from sfd2_tpu.sfm.map_index import MapIndex


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reference_sfm", type=Path, required=True)
    parser.add_argument("--features", type=Path, required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--ransac_thresh", type=float, default=15.0)
    parser.add_argument("--opt_thresh", type=float, default=15.0)
    parser.add_argument("--inlier_thresh", type=int, default=10)
    parser.add_argument("--covisibility_frame", type=int, default=50)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--radius", type=float, default=30.0)
    parser.add_argument("--obs_thresh", type=int, default=3)
    parser.add_argument("--max_keypoints", type=int, default=4096)
    parser.add_argument("--pnp_pad_floor", type=int, default=4096,
                        help="pin PnP/refine to one compiled bucket")
    parser.add_argument("--no_warmup", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    cameras, images, points3d = read_model(args.reference_sfm)
    mi = MapIndex(cameras, images, points3d)
    cfg = LocalizerConfig(
        ransac_thresh=args.ransac_thresh, opt_thresh=args.opt_thresh,
        inlier_thresh=args.inlier_thresh,
        covisibility_frame=args.covisibility_frame, iters=args.iters,
        radius=args.radius, obs_thresh=args.obs_thresh,
        max_keypoints=args.max_keypoints, pnp_pad_floor=args.pnp_pad_floor,
    )
    with FeatureStore(args.features, "r") as fs:
        service = LocalizationService(mi, fs, cfg)
        if not args.no_warmup:
            logging.info("warmup (compiles match/PnP/refine programs)…")
            logging.info("warmup done in %.1fs", service.warmup())
        server = make_server(service, args.host, args.port)
        logging.info("serving on http://%s:%d (POST /localize)",
                     *server.server_address)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()


if __name__ == "__main__":
    main()
