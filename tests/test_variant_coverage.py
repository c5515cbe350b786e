"""Coverage for secondary variants: ResSegNet V1, clurefpos refinement,
alternative SegLoss branches, triangulation-angle filtering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import canonicalize_params
from sfd2_tpu.localization.engine import _np_project
from sfd2_tpu.models.sfd2 import ResSegNet
from sfd2_tpu.sfm.triangulation import triangulate_tracks


def test_ressegnet_v1_sigmoid_stability():
    model = ResSegNet(require_stability=True)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    # V1 stability is a sigmoid map in (0, 1), not the {0.1,0.5,1.0} classes.
    s = np.asarray(out.stability)
    assert s.shape == (1, 64, 64)
    assert (s > 0).all() and (s < 1).all()
    uniq = np.unique(np.round(s, 3))
    assert len(uniq) > 3  # continuous, not 3-class

    # V1 det_train does NOT fold stability into the score.
    out_t = model.apply(v, x, training_outputs=True)
    out_p = model.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out_t.score), np.asarray(out_p.score), atol=1e-6
    )


def test_seg_loss_variant_branches(rng):
    from sfd2_tpu.training.losses import SegLossConfig, seg_loss
    from sfd2_tpu.training.sampler import NghSampler2DS
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tl", "tests/test_training_losses.py"
    )
    tl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tl)
    inp = tl._full_loss_inputs(rng)
    sampler = NghSampler2DS(ngh=3, subq=-2, pos_d=1, neg_d=2, border=3, subd_neg=-2)
    for det in ("l1", "bce"):
        for seg_fn in ("wap", "2m"):
            cfg = SegLossConfig(
                det_loss=det, seg_desc_loss_fn=seg_fn, topk_per_half=32
            )
            out = seg_loss(jax.random.PRNGKey(0), inp, sampler, cfg)
            assert np.isfinite(float(out["loss"])), (det, seg_fn)


def test_triangulation_angle_filter(rng):
    """Near-zero-baseline observations must be rejected by the
    min-triangulation-angle gate."""
    cam8 = canonicalize_params("PINHOLE", [500.0, 500.0, 320.0, 240.0]).astype(np.float32)
    pts = np.array([[0.5, 0.2, 10.0]])
    # Two cameras 1 mm apart → triangulation angle ≈ 0.006°.
    q = np.array([1.0, 0, 0, 0], np.float32)
    t1 = np.zeros(3, np.float32)
    t2 = np.array([0.001, 0, 0], np.float32)
    obs = np.zeros((1, 2, 2), np.float32)
    for i, t in enumerate([t1, t2]):
        xy, _ = _np_project(pts, q, t, cam8)
        obs[0, i] = xy[0]
    res = triangulate_tracks(
        jnp.asarray(obs), jnp.ones((1, 2), bool),
        jnp.asarray(np.broadcast_to(q, (1, 2, 4))),
        jnp.asarray(np.stack([t1, t2])[None]),
        jnp.asarray(np.broadcast_to(cam8, (1, 2, 8))),
        min_tri_angle_deg=1.5,
    )
    assert not bool(np.asarray(res.valid)[0])


@pytest.mark.slow
def test_clurefpos_refinement_path(tmp_path):
    """opt_type='clurefpos' (RobotCar knobs) exercises
    covis_frames_pose-based frame expansion."""
    from sfd2_tpu.geometry.cameras import Camera
    from sfd2_tpu.geometry.np_pose import pose_error
    from sfd2_tpu.io.colmap_model import Image, Point3D
    from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
    from sfd2_tpu.localization.engine import LocalizationEngine, LocalizerConfig
    from sfd2_tpu.sfm.map_index import MapIndex

    rng = np.random.default_rng(13)
    W, H = 640, 480
    cam_params = [500.0, 500.0, 320.0, 240.0]
    cam8 = canonicalize_params("PINHOLE", cam_params)
    n_pts = 300
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 14, n_pts)], 1
    )
    pdesc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)
    cameras = {1: Camera(1, "PINHOLE", W, H, np.array(cam_params))}
    images, obs = {}, {i: [] for i in range(n_pts)}
    with FeatureStore(tmp_path / "f.h5", "w") as fs:
        for i in range(6):
            iid = i + 1
            r = Rotation.from_rotvec(rng.normal(size=3) * 0.03)
            q = r.as_quat()[[3, 0, 1, 2]]
            t = -r.as_matrix() @ np.array([i * 0.6 - 1.5, 0, 0])
            xy, depth = _np_project(pts, q, t, cam8)
            vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
            idx = np.nonzero(vis)[0]
            kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
            de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.05
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            name = f"db/{iid}.jpg"
            images[iid] = Image(iid, q, t, 1, name, kp, idx.astype(np.int64))
            fs.write(name, ImageFeatures(kp.astype(np.float32), de, rng.random(len(idx)).astype(np.float32), None))
            for row, p in enumerate(idx):
                obs[int(p)].append((iid, row))
        points3d = {
            p: Point3D(p, pts[p], np.zeros(3, np.uint8), 0.4,
                       np.array([x[0] for x in o], np.int32),
                       np.array([x[1] for x in o], np.int32))
            for p, o in obs.items() if len(o) >= 2
        }
        for iid in list(images):
            im = images[iid]
            p3d = np.array([p if p in points3d else -1 for p in im.point3D_ids], np.int64)
            images[iid] = Image(iid, im.qvec, im.tvec, 1, im.name, im.xys, p3d)
        r = Rotation.from_rotvec(rng.normal(size=3) * 0.02)
        q_gt = r.as_quat()[[3, 0, 1, 2]]
        t_gt = -r.as_matrix() @ np.array([0.2, 0.1, -0.1])
        xy, depth = _np_project(pts, q_gt, t_gt, cam8)
        vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
        idx = np.nonzero(vis)[0][:250]
        kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.3
        de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.05
        de /= np.linalg.norm(de, axis=1, keepdims=True)
        fs.write("q.jpg", ImageFeatures(kp.astype(np.float32), de, rng.random(len(idx)).astype(np.float32), None))

    mi = MapIndex(cameras, images, points3d)
    cfg = LocalizerConfig(
        ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
        covisibility_frame=6, iters=2, radius=12.0, obs_thresh=2,
        opt_type="clurefpos",  # RobotCar conf (test_robotcar:48-56)
        max_keypoints=512, num_hypotheses=512,
    )
    with FeatureStore(tmp_path / "f.h5", "r") as fs:
        eng = LocalizationEngine(mi, fs, cfg)
        res = eng.localize("q.jpg", ("PINHOLE", W, H, np.array(cam_params)),
                           [[i] for i in sorted(images)])
    assert res.source == "accepted", res.log
    qe, te = pose_error(res.qvec, res.tvec, q_gt, t_gt)
    assert qe < 0.5 and te < 0.1, (qe, te, res.log)


def test_sce_det_loss(rng):
    from sfd2_tpu.training.losses import SegLossConfig, seg_loss
    from sfd2_tpu.training.sampler import NghSampler2DS
    import importlib.util

    spec = importlib.util.spec_from_file_location("tl2", "tests/test_training_losses.py")
    tl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tl)
    inp = tl._full_loss_inputs(rng)
    sampler = NghSampler2DS(ngh=3, subq=-2, pos_d=1, neg_d=2, border=3, subd_neg=-2)
    out = seg_loss(jax.random.PRNGKey(0), inp,
                   sampler, SegLossConfig(det_loss="sce", topk_per_half=32))
    assert np.isfinite(float(out["det_loss"]))
    # Modulated target differs from plain ce on semantically-varied input.
    out_ce = seg_loss(jax.random.PRNGKey(0), inp,
                      sampler, SegLossConfig(det_loss="ce", topk_per_half=32))
    assert abs(float(out["det_loss"]) - float(out_ce["det_loss"])) > 1e-6


def test_nms_fast_host(rng):
    from sfd2_tpu.ops.nms import nms_fast_host

    pts = np.array([[10, 10], [12, 11], [30, 30], [10, 40]], float)
    sc = np.array([0.9, 0.95, 0.5, 0.7])
    kept = nms_fast_host(pts, sc, 64, 64, dist_thresh=4)
    # (12,11) beats (10,10) within radius; others survive.
    assert 1 in kept and 0 not in kept
    assert 2 in kept and 3 in kept
    assert list(kept) == sorted(kept, key=lambda i: -sc[i])


def test_model_size():
    from sfd2_tpu.utils.config import model_size
    from sfd2_tpu.models.sfd2 import ResSegNetV2

    m = ResSegNetV2(require_stability=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = model_size(v["params"])
    assert 3_000_000 < n < 20_000_000  # ~5-6M params expected
