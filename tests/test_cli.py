"""CLI smoke tests: drive the 4-stage pipeline through the argparse mains
(test_aachenv_1_1's extract_feat_db → match_db → triangulation → localize)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sfd2_tpu.geometry.cameras import Camera, canonicalize_params
from sfd2_tpu.io.colmap_model import Image, read_model, write_model
from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
from sfd2_tpu.localization.engine import _np_project
from sfd2_tpu.cli import (
    extract_features as cli_extract,
    match_features as cli_match,
    triangulation as cli_triangulation,
    localizer as cli_localizer,
    pairs_from as cli_pairs,
)

W, H = 640, 480
CAM_PARAMS = [520.0, 520.0, 320.0, 240.0]
CAM8 = canonicalize_params("PINHOLE", CAM_PARAMS)


@pytest.fixture(scope="module")
def cli_scene(tmp_path_factory):
    """Synthetic DB features + empty reference model + query, on disk."""
    rng = np.random.default_rng(31)
    base = tmp_path_factory.mktemp("cli")
    n_pts = 280
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(8, 14, n_pts)], 1
    )
    pdesc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=1, keepdims=True)

    cameras = {1: Camera(1, "PINHOLE", W, H, np.array(CAM_PARAMS))}
    ref_images = {}
    names = []
    with FeatureStore(base / "feats.h5", "w") as fs:
        for i in range(5):
            iid = i + 1
            r = Rotation.from_rotvec(rng.normal(size=3) * 0.04)
            q = r.as_quat()[[3, 0, 1, 2]]
            t = -r.as_matrix() @ np.array([i * 0.8 - 1.6, 0, 0])
            xy, depth = _np_project(pts, q, t, CAM8)
            vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
            idx = np.nonzero(vis)[0]
            kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.25
            de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.04
            de /= np.linalg.norm(de, axis=1, keepdims=True)
            name = f"db/{iid:04d}.jpg"
            names.append(name)
            ref_images[iid] = Image(iid, q, t, 1, name, np.zeros((0, 2)), np.zeros(0, np.int64))
            fs.write(name, ImageFeatures(kp.astype(np.float32), de,
                                         rng.random(len(idx)).astype(np.float32), None))
        # Query.
        r = Rotation.from_rotvec(rng.normal(size=3) * 0.03)
        q_q = r.as_quat()[[3, 0, 1, 2]]
        t_q = -r.as_matrix() @ np.array([0.1, 0.1, -0.1])
        xy, depth = _np_project(pts, q_q, t_q, CAM8)
        vis = (depth > 0) & (xy[:, 0] > 8) & (xy[:, 0] < W - 8) & (xy[:, 1] > 8) & (xy[:, 1] < H - 8)
        idx = np.nonzero(vis)[0][:250]
        kp = xy[idx] + rng.normal(size=(len(idx), 2)) * 0.25
        de = pdesc[idx] + rng.normal(size=(len(idx), 64)).astype(np.float32) * 0.04
        de /= np.linalg.norm(de, axis=1, keepdims=True)
        fs.write("query/q.jpg", ImageFeatures(kp.astype(np.float32), de,
                                              rng.random(len(idx)).astype(np.float32), None))

    write_model(cameras, ref_images, {}, base / "ref_model", ext=".bin")
    (base / "pairs_db.txt").write_text(
        "\n".join(f"{a} {b}" for i, a in enumerate(names) for b in names[i + 1 :]) + "\n"
    )
    (base / "queries.txt").write_text("query/q.jpg PINHOLE 640 480 520 520 320 240\n")
    (base / "retrieval.txt").write_text(
        "\n".join(f"query/q.jpg {n}" for n in names) + "\n"
    )
    (base / "gt.txt").write_text("q.jpg " + " ".join(map(str, [*q_q, *t_q])) + "\n")
    return base


def test_cli_match_and_triangulate_and_localize(cli_scene, capsys):
    base = cli_scene
    cli_match.main([
        "--features", str(base / "feats.h5"),
        "--export_fn", str(base / "matches.h5"),
        "--pairs", str(base / "pairs_db.txt"),
        "--max_keypoints", "512", "--batch_size", "8",
    ])
    cli_triangulation.main([
        "--sfm_dir", str(base / "sfm"),
        "--reference_sfm_model", str(base / "ref_model"),
        "--pairs", str(base / "pairs_db.txt"),
        "--features", str(base / "feats.h5"),
        "--matches", str(base / "matches.h5"),
        "--export_database",
    ])
    cams, images, points = read_model(base / "sfm")
    assert len(points) > 150
    assert (base / "sfm" / "database.db").exists()

    cli_localizer.main([
        "--dataset", "aachen_v1.1",
        "--reference_sfm", str(base / "sfm"),
        "--queries", str(base / "queries.txt"),
        "--retrieval", str(base / "retrieval.txt"),
        "--features", str(base / "feats.h5"),
        "--results", str(base / "poses.txt"),
        "--gt_pose_fn", str(base / "gt.txt"),
        "--ransac_thresh", "8", "--opt_thresh", "8",
        "--covisibility_frame", "5", "--iters", "2", "--radius", "12",
        "--obs_thresh", "2", "--max_keypoints", "512",
    ])
    out = capsys.readouterr().out
    assert "'recall': [1.0, 1.0, 1.0]" in out, out
    assert (base / "poses.txt").exists()


def test_cli_pairs_from_covisibility(cli_scene, tmp_path):
    base = cli_scene
    out = tmp_path / "pairs_covis.txt"
    cli_pairs.main([
        "covisibility", "--model", str(base / "sfm"),
        "--output", str(out), "--num_matched", "2",
    ])
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 10  # 5 images × 2


def test_cli_extract_features(tmp_path, rng):
    import cv2

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"{i}.png"), (rng.random((120, 160, 3)) * 255).astype(np.uint8))
    cli_extract.main([
        "--image_dir", str(d),
        "--export_fn", str(tmp_path / "f.h5"),
        "--conf", "sfd2-n1000-r1600",
    ])
    with FeatureStore(tmp_path / "f.h5", "r") as fs:
        names = fs.keys()
        assert len(names) == 2
        f = fs.read(names[0])
        assert f.descriptors.shape[1] == 128


def test_cli_extract_features_rejects_bad_combos(tmp_path):
    """ADVICE r2: 'dir' (global retrieval) must be rejected with a pointer
    to extract_global, and --mask_dir with a non-sfd2 extractor must fail
    loudly instead of being silently ignored."""
    args = ["--image_dir", str(tmp_path), "--export_fn",
            str(tmp_path / "f.h5")]
    with pytest.raises(SystemExit):
        cli_extract.main(args + ["--extractor", "dir"])
    with pytest.raises(SystemExit):
        cli_extract.main(args + ["--extractor", "superpoint",
                                 "--mask_dir", str(tmp_path)])


def test_cli_train_sampler_and_det_loss_flags(tmp_path):
    """--sampler registry + config-time 'cel' rejection reach argparse."""
    import cv2

    from sfd2_tpu.cli import train as cli_train

    d = tmp_path / "imgs"
    d.mkdir()
    cv2.imwrite(str(d / "a.png"), np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="cel"):
        cli_train.main([
            "--image_dirs", str(d), "--det_loss", "cel",
            "--epochs", "0", "--iters_per_epoch", "1", "--workers", "0",
            "--save_dir", str(tmp_path / "runs"),
        ])
