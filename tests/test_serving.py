"""Serving daemon: warm service answers /localize over HTTP with the
same result the engine gives directly, and survives malformed requests."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from sfd2_tpu.geometry.np_pose import pose_error
from sfd2_tpu.io.feature_store import FeatureStore
from sfd2_tpu.localization.engine import LocalizerConfig
from sfd2_tpu.serving.server import LocalizationService, make_server
from sfd2_tpu.utils.synth import build_corridor_scene


@pytest.fixture(scope="module")
def served_scene(tmp_path_factory):
    base = tmp_path_factory.mktemp("serve")
    scene = build_corridor_scene(
        base / "f.h5", n_images=20, n_queries=3, n_points=1200,
        kp_per_image=400, kp_per_query=350, retrieval_k=6, seed=5,
    )
    fs = FeatureStore(scene.feature_path, "r")
    service = LocalizationService(
        scene.map_index, fs,
        LocalizerConfig(
            ransac_thresh=8.0, opt_thresh=8.0, inlier_thresh=10,
            covisibility_frame=6, iters=2, radius=12.0, obs_thresh=3,
            max_keypoints=512, num_hypotheses=512,
        ),
    )
    warm_s = service.warmup()
    server = make_server(service, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield scene, service, server, warm_s
    server.shutdown()
    fs.close()


def _post(server, path, body):
    url = f"http://{server.server_address[0]}:{server.server_address[1]}{path}"
    req = urllib.request.Request(
        url, json.dumps(body).encode(), {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_localize(served_scene):
    scene, service, server, warm_s = served_scene
    url = f"http://{server.server_address[0]}:{server.server_address[1]}/healthz"
    with urllib.request.urlopen(url) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["images"] == 20

    qname, q_gt, t_gt, near = scene.queries[0]
    body = {
        "query_name": qname,
        "db_ids": [int(i) for i in near],
        "camera": {"model": scene.cam_model, "width": scene.width,
                   "height": scene.height, "params": scene.cam_params},
    }
    code, res = _post(server, "/localize", body)
    assert code == 200, res
    assert res["source"] == "accepted"
    qe, te = pose_error(np.array(res["qvec"]), np.array(res["tvec"]), q_gt, t_gt)
    assert qe < 0.5 and te < 0.1, (qe, te)
    # Warm service answers faster than its own cold warmup compiled.
    assert res["ms"] / 1e3 < warm_s

    # db_names addressing resolves to the same frames.
    body2 = dict(body, db_names=[scene.map_index.images[i].name for i in near])
    del body2["db_ids"]
    code2, res2 = _post(server, "/localize", body2)
    assert code2 == 200 and res2["source"] == "accepted"
    np.testing.assert_allclose(res2["qvec"], res["qvec"], atol=1e-6)


def test_concurrent_requests_serialise_through_the_lock(served_scene):
    """ThreadingHTTPServer + the service dispatch lock: simultaneous
    clients all get answers, and identical requests get identical poses
    (one device, deterministic jit programs)."""
    import threading

    scene, service, server, _ = served_scene
    qname, q_gt, t_gt, near = scene.queries[0]
    body = {
        "query_name": qname, "db_ids": [int(i) for i in near],
        "camera": {"model": scene.cam_model, "width": scene.width,
                   "height": scene.height, "params": scene.cam_params},
    }
    results = [None] * 6

    def go(i):
        results[i] = _post(server, "/localize", body)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and r[0] == 200 for r in results), results
    first = results[0][1]
    for code, res in results[1:]:
        np.testing.assert_allclose(res["qvec"], first["qvec"], atol=1e-6)
        assert res["num_inliers"] == first["num_inliers"]


def test_malformed_requests_do_not_kill_server(served_scene):
    scene, service, server, _ = served_scene
    code, res = _post(server, "/localize", {"query_name": "nope"})
    assert code in (400, 500) and "error" in res
    code, res = _post(server, "/nothing", {})
    assert code == 404
    # Client errors are 4xx, not 5xx: empty body, non-object body.
    addr = f"http://{server.server_address[0]}:{server.server_address[1]}"
    req = urllib.request.Request(f"{addr}/localize", b"",
                                 {"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        raise AssertionError("empty body should not be 200")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    code, res = _post(server, "/localize", ["not", "an", "object"])
    assert code == 400 and "error" in res
    # Server still healthy afterwards.
    qname, q_gt, t_gt, near = scene.queries[1]
    code, res = _post(server, "/localize", {
        "query_name": qname, "db_ids": [int(i) for i in near],
        "camera": {"model": scene.cam_model, "width": scene.width,
                   "height": scene.height, "params": scene.cam_params},
    })
    assert code == 200 and res["source"] == "accepted"
