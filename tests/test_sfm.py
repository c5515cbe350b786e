import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.localization.engine import _np_project
from sfd2_tpu.sfm.twoview import (
    fit_fundamental,
    sampson_error,
    verify_fundamental_ransac,
)
from sfd2_tpu.sfm.tracks import build_tracks
from sfd2_tpu.sfm.triangulation import triangulate_tracks

CAM8 = canonicalize_params("PINHOLE", [500.0, 500.0, 320.0, 240.0]).astype(np.float32)


def two_view_scene(rng, n=100, noise=0.0, outliers=0):
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(6, 12, n)], 1
    )
    q1 = np.array([1.0, 0, 0, 0])
    t1 = np.zeros(3)
    r2 = Rotation.from_rotvec([0.02, 0.25, 0.01])
    q2 = r2.as_quat()[[3, 0, 1, 2]]
    t2 = -r2.as_matrix() @ np.array([1.2, 0.1, 0.0])
    xy1, d1 = _np_project(pts, q1, t1, CAM8)
    xy2, d2 = _np_project(pts, q2, t2, CAM8)
    assert np.all(d1 > 0) and np.all(d2 > 0)
    xy1 += rng.normal(size=xy1.shape) * noise
    xy2 += rng.normal(size=xy2.shape) * noise
    if outliers:
        xy2[-outliers:] = rng.uniform([0, 0], [640, 480], size=(outliers, 2))
    return xy1.astype(np.float32), xy2.astype(np.float32), (q1, t1, q2, t2, pts)


def test_fit_fundamental_epipolar_constraint(rng):
    xy1, xy2, _ = two_view_scene(rng, 60)
    f = np.array(fit_fundamental(jnp.array(xy1), jnp.array(xy2)))
    err = np.array(sampson_error(jnp.array(f), jnp.array(xy1), jnp.array(xy2)))
    assert np.sqrt(err).max() < 0.5, np.sqrt(err).max()


def test_verify_ransac_with_outliers(rng):
    xy1, xy2, _ = two_view_scene(rng, 128, noise=0.3, outliers=40)
    valid = np.ones(128, bool)
    res = verify_fundamental_ransac(
        jnp.array(xy1), jnp.array(xy2), jnp.array(valid),
        threshold=4.0, key=jax.random.PRNGKey(0),
    )
    assert bool(res.success)
    inl = np.array(res.inliers)
    assert inl[:88].mean() > 0.9  # true inliers kept
    assert inl[-40:].mean() < 0.9  # many outliers rejected (random can hit)
    assert int(res.num_inliers) >= 80


def test_verify_ransac_rejects_garbage(rng):
    xy1 = rng.uniform(0, 640, (64, 2)).astype(np.float32)
    xy2 = rng.uniform(0, 640, (64, 2)).astype(np.float32)
    res = verify_fundamental_ransac(
        jnp.array(xy1), jnp.array(xy2), jnp.array(np.ones(64, bool)),
        threshold=1.0, key=jax.random.PRNGKey(1),
    )
    # Random correspondences: low consensus → should not be "verified".
    assert int(res.num_inliers) < 40


def test_build_tracks_chains_pairs():
    nk = {1: 5, 2: 5, 3: 5}
    matches = [
        (1, 2, np.array([[0, 1], [2, 2]])),
        (2, 3, np.array([[1, 4], [3, 0]])),
    ]
    tracks = build_tracks(nk, matches)
    as_sets = [set(t) for t in tracks]
    assert {(1, 0), (2, 1), (3, 4)} in as_sets  # chained across 3 images
    assert {(1, 2), (2, 2)} in as_sets
    assert {(2, 3), (3, 0)} in as_sets


def test_build_tracks_conflict_dropped():
    nk = {1: 4, 2: 4}
    # kp0 and kp1 of image 1 both match kp0 of image 2 → one track with an
    # image-1 conflict; only one image-1 observation survives.
    matches = [(1, 2, np.array([[0, 0], [1, 0]]))]
    tracks = build_tracks(nk, matches)
    assert len(tracks) == 1
    imgs = [i for i, _ in tracks[0]]
    assert imgs.count(1) == 1 and imgs.count(2) == 1


def multi_view_scene(rng, n_pts=64, n_cams=4, noise=0.0):
    pts = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(6, 12, n_pts)], 1
    )
    poses = []
    for i in range(n_cams):
        r = Rotation.from_rotvec(rng.normal(size=3) * 0.05)
        q = r.as_quat()[[3, 0, 1, 2]]
        t = -r.as_matrix() @ np.array([i * 0.8 - 1.2, 0, 0])
        poses.append((q, t))
    obs = np.zeros((n_pts, n_cams, 2), np.float32)
    for i, (q, t) in enumerate(poses):
        xy, _ = _np_project(pts, q, t, CAM8)
        obs[:, i] = xy + rng.normal(size=xy.shape) * noise
    return pts, poses, obs


def test_triangulate_tracks_exact(rng):
    pts, poses, obs = multi_view_scene(rng)
    n_pts, n_cams = obs.shape[:2]
    qvecs = np.stack([np.tile(q, (n_cams, 1)) for q in [np.stack([p[0] for p in poses])]])[0]
    qvecs = np.broadcast_to(np.stack([p[0] for p in poses]), (n_pts, n_cams, 4))
    tvecs = np.broadcast_to(np.stack([p[1] for p in poses]), (n_pts, n_cams, 3))
    cams = np.broadcast_to(CAM8, (n_pts, n_cams, 8))
    mask = np.ones((n_pts, n_cams), bool)
    res = triangulate_tracks(
        jnp.array(obs), jnp.array(mask),
        jnp.array(qvecs, jnp.float32), jnp.array(tvecs, jnp.float32),
        jnp.array(cams, jnp.float32),
    )
    assert bool(np.array(res.valid).all())
    np.testing.assert_allclose(np.array(res.xyz), pts, atol=2e-2)
    assert np.array(res.errors).max() < 0.5


def test_triangulate_filters_bad_tracks(rng):
    pts, poses, obs = multi_view_scene(rng, noise=0.2)
    n_pts, n_cams = obs.shape[:2]
    # Corrupt track 0's observations entirely.
    obs[0] = rng.uniform(0, 640, (n_cams, 2))
    # Track 1: only one valid observation → no triangulation possible.
    mask = np.ones((n_pts, n_cams), bool)
    mask[1, 1:] = False
    qvecs = np.broadcast_to(np.stack([p[0] for p in poses]), (n_pts, n_cams, 4))
    tvecs = np.broadcast_to(np.stack([p[1] for p in poses]), (n_pts, n_cams, 3))
    cams = np.broadcast_to(CAM8, (n_pts, n_cams, 8))
    res = triangulate_tracks(
        jnp.array(obs), jnp.array(mask),
        jnp.array(qvecs, jnp.float32), jnp.array(tvecs, jnp.float32),
        jnp.array(cams, jnp.float32),
    )
    valid = np.array(res.valid)
    assert not valid[0]
    assert not valid[1]
    assert valid[2:].mean() > 0.9


def test_native_union_find_matches_python(rng):
    from sfd2_tpu.native import union_find_roots

    n = 500
    edges = rng.integers(0, n, size=(800, 2)).astype(np.int64)
    roots = union_find_roots(n, edges)
    if roots is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    # Same partition as a python DSU (root labels may differ).
    from sfd2_tpu.sfm.tracks import UnionFind

    dsu = UnionFind(n)
    for a, b in edges:
        dsu.union(int(a), int(b))
    py_roots = np.array([dsu.find(i) for i in range(n)])
    # Partition equality: same-root in one ⇔ same-root in the other.
    for arr in (roots, py_roots):
        assert len(arr) == n
    _, inv_a = np.unique(roots, return_inverse=True)
    _, inv_b = np.unique(py_roots, return_inverse=True)
    remap = {}
    for x, y in zip(inv_a, inv_b):
        assert remap.setdefault(x, y) == y
