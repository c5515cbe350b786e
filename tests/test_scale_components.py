"""Unit tests for the Aachen-scale path: vectorised track building,
array-built MapIndex, and the device-resident bank injection the scale
dress rehearsal (scripts/bench_scale.py) composes.

Capability context: the reference operates at ~6.7k DB images
(test_aachenv_1_1 pipeline); these components exist so track assembly,
map indexing and DB-bank residency stay vectorised/device-side at that
scale.
"""

import numpy as np
import pytest

from sfd2_tpu.sfm.tracks import build_tracks, build_tracks_arrays


def _edges_from_matches(matches, kp):
    edges = []
    for i0, i1, m in matches:
        m = np.asarray(m)
        edges.append(m + np.array([(i0 - 1) * kp, (i1 - 1) * kp]))
    return np.concatenate(edges) if edges else np.zeros((0, 2), np.int64)


def test_tracks_arrays_match_list_builder():
    rng = np.random.default_rng(3)
    kp = 64
    n_img = 12
    matches = []
    for a in range(1, n_img):
        rows = rng.choice(kp, 20, replace=False)
        cols = rng.choice(kp, 20, replace=False)
        matches.append((a, a + 1, np.stack([rows, cols], 1)))

    ref = build_tracks({i: kp for i in range(1, n_img + 1)}, matches,
                       min_track_length=2)
    oi, ok, ot, n_tracks = build_tracks_arrays(
        n_img, kp, _edges_from_matches(matches, kp), min_track_length=2)

    assert n_tracks == len(ref)
    # Same multiset of tracks: compare canonical (img_row, kp) tuples.
    ref_sets = sorted(
        tuple(sorted((iid - 1, k) for iid, k in tr)) for tr in ref)
    got_sets = sorted(
        tuple(sorted(zip(oi[ot == t].tolist(), ok[ot == t].tolist())))
        for t in range(n_tracks))
    assert ref_sets == got_sets


def test_tracks_arrays_min_length_and_dedup():
    kp = 8
    # One 3-image chain + one 2-image pair + a same-image conflict edge.
    edges = np.array([
        [0 * kp + 1, 1 * kp + 2],
        [1 * kp + 2, 2 * kp + 3],
        [0 * kp + 5, 1 * kp + 6],
        [1 * kp + 2, 1 * kp + 4],  # second kp in image 1 joins the track
    ])
    oi, ok, ot, n = build_tracks_arrays(3, kp, edges, min_track_length=3)
    assert n == 1  # the pair track is filtered at min_track_length=3
    obs = sorted(zip(oi.tolist(), ok.tolist()))
    # image 1 contributes ONE observation (lowest kp index wins: 2 < 4)
    assert obs == [(0, 1), (1, 2), (2, 3)]


def test_map_index_from_arrays_matches_dict_constructor():
    from sfd2_tpu.geometry.cameras import Camera
    from sfd2_tpu.io.colmap_model import Image, Point3D
    from sfd2_tpu.sfm.map_index import MapIndex

    rng = np.random.default_rng(5)
    kp, n_img, n_pts = 16, 5, 30
    cameras = {1: Camera(1, "PINHOLE", 64, 48, np.array([50.0, 50, 32, 24]))}
    prow = {}
    images = {}
    obs = {p: [] for p in range(n_pts)}
    for i in range(1, n_img + 1):
        pr = np.full(kp, -1, np.int64)
        # Deterministic full coverage: dict path keeps only observed
        # points, and row parity with the dense array path needs all of
        # 0..n_pts-1 observed.
        seen = np.arange((i - 1) * 7, (i - 1) * 7 + 10) % n_pts
        pr[:10] = seen
        prow[i] = pr
        xys = rng.random((kp, 2)).astype(np.float32)
        images[i] = Image(i, np.array([1.0, 0, 0, 0]),
                          rng.random(3), 1, f"im{i}.jpg", xys, pr.copy())
        for row, p in enumerate(pr):
            if p >= 0:
                obs[int(p)].append((i, row))
    xyz = rng.random((n_pts, 3))
    points3d = {
        p: Point3D(p, xyz[p], np.zeros(3, np.uint8), 0.1,
                   np.array([x[0] for x in o], np.int32),
                   np.array([x[1] for x in o], np.int32))
        for p, o in obs.items() if o
    }
    track_len = np.array([len(obs[p]) for p in range(n_pts)], np.int32)

    ref = MapIndex(cameras, images, points3d)
    got = MapIndex.from_arrays(cameras, images, prow, xyz, track_len)

    assert (ref.incidence != got.incidence).nnz == 0
    np.testing.assert_array_equal(ref.track_len, got.track_len)
    np.testing.assert_allclose(ref.point_xyz, got.point_xyz)
    for iid in images:
        np.testing.assert_array_equal(
            ref.p3d_rows_per_image[ref.image_row[iid]],
            got.p3d_rows_per_image[got.image_row[iid]])
    # Covisibility queries agree.
    rows = ref.observed_point_rows(1)
    assert ref.covisibility_counts(rows) == got.covisibility_counts(rows)


def test_inject_db_features_matches_store_path():
    """Engine with injected bf16 device banks localizes identically to
    the store-fed engine (extract→localize HBM handoff)."""
    import jax.numpy as jnp

    from sfd2_tpu.io.feature_store import FeatureStore
    from sfd2_tpu.localization.engine import (LocalizationEngine,
                                              LocalizerConfig)
    from sfd2_tpu.utils.synth import build_corridor_scene

    scene = build_corridor_scene(
        "/tmp/inject_scene.h5", n_images=12, n_queries=3, n_points=500,
        desc_dim=32, kp_per_image=120, kp_per_query=100, retrieval_k=4,
        seed=13)
    cfg = LocalizerConfig(max_keypoints=128, pnp_pad_floor=64,
                          db_cache_images=64)
    with FeatureStore(scene.feature_path, "r") as fs:
        ref_eng = LocalizationEngine(scene.map_index, fs, cfg)
        inj_eng = LocalizationEngine(scene.map_index, fs, cfg)
        for iid in scene.map_index.image_ids:
            kp, desc, _, valid = fs.read_padded(
                scene.map_index.images[int(iid)].name, 128)
            inj_eng.inject_db_features(
                int(iid), kp, jnp.asarray(desc, jnp.bfloat16), valid)

        for qname, q_gt, t_gt, near in scene.queries:
            clusters = [[int(j)] for j in near]
            r_ref = ref_eng.localize(qname, scene.qinfo, clusters)
            r_inj = inj_eng.localize(qname, scene.qinfo, clusters)
            assert r_inj.source != "retrieval_fallback"
            # bf16 descriptors may flip a borderline match; poses must
            # still agree to well under the benchmark's finest bin.
            from sfd2_tpu.geometry.np_pose import pose_error
            dq, dt = pose_error(r_ref.qvec, r_ref.tvec,
                                r_inj.qvec, r_inj.tvec)
            assert dq < 0.5 and dt < 0.05
