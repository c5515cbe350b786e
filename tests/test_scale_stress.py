"""Scale stress: 100-image map, 20 queries through the full engine.

Catches host-side quadratic behavior and validates recall at a scale
closer to a real benchmark slice (marked slow). The scene comes from the
shared builder (sfd2_tpu/utils/synth.py) that bench.py's e2e stage also
uses."""

import time

import pytest

from sfd2_tpu.geometry.np_pose import pose_error
from sfd2_tpu.io.feature_store import FeatureStore
from sfd2_tpu.localization.engine import LocalizationEngine, LocalizerConfig
from sfd2_tpu.utils.synth import build_corridor_scene


@pytest.mark.slow
def test_scale_100_images_20_queries(tmp_path):
    t_build0 = time.time()
    scene = build_corridor_scene(
        tmp_path / "f.h5", n_images=100, n_queries=20, n_points=3000,
        kp_per_image=800, kp_per_query=600, retrieval_k=10, seed=99,
    )
    build_s = time.time() - t_build0

    cfg = LocalizerConfig(
        ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
        covisibility_frame=10, iters=2, radius=12.0, obs_thresh=3,
        max_keypoints=1024, num_hypotheses=512,
    )
    t0 = time.time()
    n_ok = 0
    errs = []
    with FeatureStore(scene.feature_path, "r") as fs:
        eng = LocalizationEngine(scene.map_index, fs, cfg)
        for qname, q_gt, t_gt, near in scene.queries:
            res = eng.localize(qname, scene.qinfo, [[i] for i in near])
            if res.source == "accepted":
                qe, te = pose_error(res.qvec, res.tvec, q_gt, t_gt)
                errs.append((qe, te))
                if qe < 0.5 and te < 0.1:
                    n_ok += 1
    loc_s = time.time() - t0

    assert n_ok >= 19, (n_ok, errs)
    # Budget guard against host-side quadratic regressions. On the CPU
    # test platform the GEMM/RANSAC device compute itself costs ~2 s per
    # query; a regression in host orchestration would push this well past
    # the bound. 8 s (not 4) absorbs CPU contention when the suite shares
    # the host with a TPU bench run.
    assert loc_s / 20 < 8.0, f"{loc_s/20:.2f}s per query"
    print(f"built {len(scene.map_index.point_ids)} pts in {build_s:.1f}s; "
          f"{loc_s/20*1e3:.0f} ms/query, {n_ok}/20 within (0.1m, 0.5deg)")
