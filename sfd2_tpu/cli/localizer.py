"""Localization CLI (``python -m sfd2_tpu.cli.localizer``).

Capability parity: ``it_loc/localizer.py`` argparse main with the full
knob set of the benchmark scripts (``test_aachenv_1_1:59-80``):
ransac/opt thresholds, covisibility frame count, init type, opt type,
inlier threshold, iters, radius, obs threshold, dataset name mangling
and ECMU prefixes.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from sfd2_tpu.localization.engine import LocalizerConfig
from sfd2_tpu.localization.localizer import LocalizerRun, run


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="aachen_v1.1",
                        choices=["aachen", "aachen_v1.1", "robotcar", "ecmu"])
    parser.add_argument("--reference_sfm", type=Path, required=True)
    parser.add_argument("--queries", type=Path, required=True)
    parser.add_argument("--retrieval", type=Path, required=True)
    parser.add_argument("--features", type=Path, required=True)
    parser.add_argument("--results", type=Path, required=True)
    parser.add_argument("--gt_pose_fn", type=Path, default=None)
    parser.add_argument("--init_type", default="sng", choices=["sng", "clu"])
    parser.add_argument("--ransac_thresh", type=float, default=15.0)
    parser.add_argument("--opt_thresh", type=float, default=15.0)
    parser.add_argument("--inlier_thresh", type=int, default=10)
    parser.add_argument("--covisibility_frame", type=int, default=50)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--radius", type=float, default=30.0)
    parser.add_argument("--obs_thresh", type=int, default=3)
    parser.add_argument("--opt_type", default="clurefobs")
    parser.add_argument("--no_covisible_opt", action="store_true")
    parser.add_argument("--max_keypoints", type=int, default=4096)
    parser.add_argument("--query_prefix", default="")
    parser.add_argument("--db_prefix", default="")
    parser.add_argument("--profile_dir", type=Path, default=None,
                        help="emit a jax.profiler device trace of the "
                             "query loop (TensorBoard profile tab)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    run_cfg = LocalizerRun(
        dataset=args.dataset,
        init_type=args.init_type,
        config=LocalizerConfig(
            ransac_thresh=args.ransac_thresh,
            opt_thresh=args.opt_thresh,
            inlier_thresh=args.inlier_thresh,
            covisibility_frame=args.covisibility_frame,
            iters=args.iters,
            radius=args.radius,
            obs_thresh=args.obs_thresh,
            opt_type=args.opt_type,
            do_covisibility_opt=not args.no_covisible_opt,
            max_keypoints=args.max_keypoints,
        ),
        query_prefix=args.query_prefix,
        db_prefix=args.db_prefix,
    )
    import contextlib

    from sfd2_tpu.utils.profiling import trace

    ctx = trace(str(args.profile_dir)) if args.profile_dir \
        else contextlib.nullcontext()
    with ctx:
        stats = run(
            args.dataset, args.reference_sfm, args.queries, args.retrieval,
            args.features, args.results, run_cfg, args.gt_pose_fn,
        )
    print(stats)


if __name__ == "__main__":
    main()
