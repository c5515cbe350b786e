"""Benchmark: end-to-end extraction + matching throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: localization-pipeline frames/s/chip — full-res
(1024×1024) ResSegNetV2 forward + NMS + top-4096 extraction, plus the
per-query matching of the Aachen benchmark path (mutual-NN vs 50
candidate DB frames, K=4096, C=128). The reference publishes no speed
numbers (BASELINE.md → published: {}), so vs_baseline is 1.0 by
definition until a measured reference wall-clock exists.

Timing method: the sandbox TPU sits behind a high-latency relay
(~50-100 ms RPC round-trip), so each stage processes a BATCH of frames
per dispatch (amortising the round-trip) and is fenced by a small host
transfer; the median over repeated calls is reported.
"""

from __future__ import annotations

import json
import statistics
import time
import traceback

import numpy as np


def _timed_per_item(fn, fence, items_per_call, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / items_per_call


def run_bench():
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.matching import mutual_nn_match
    from sfd2_tpu.ops.pallas_match import mutual_nn_match_pallas

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    h = w = 1024
    k = 4096
    c = 128
    n_db = 50  # candidate DB frames per query (test_aachenv_1_1 NetVLAD top-50)
    ex_batch = 8 if on_tpu else 1
    # The Pallas matcher never materialises the K×K similarity in HBM, so
    # all 50 pairs fit in one launch on TPU; the XLA path chunks.
    match_chunk = n_db if on_tpu else 10

    model = ResSegNetV2(require_stability=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))

    @jax.jit
    def extract(variables, images):
        out = model.apply(variables, images)
        return extract_keypoints(
            out.score, out.descriptors, out.stability,
            max_keypoints=k, conf_threshold=0.001,
        )

    rng = np.random.default_rng(0)

    # Relay RTT: every fenced dispatch pays a fixed host↔device round-trip
    # (~30-100 ms through the sandbox tunnel, ~µs on directly-attached
    # TPUs). Measure it with a trivial op and report RTT-corrected device
    # times alongside the raw wall-clock.
    tiny = jnp.zeros((8, 128))
    tiny_f = jax.jit(lambda x, s: x + s)
    np.asarray(tiny_f(tiny, 0.0)[0, :4])
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny_f(tiny, float(i + 1))[0, :4])
        rtts.append(time.perf_counter() - t0)
    rtt = statistics.median(rtts)

    imgs = jnp.asarray(rng.normal(size=(ex_batch, h, w, 3)).astype(np.float32))
    np.asarray(extract(variables, imgs).scores)  # compile + warm

    t_extract = _timed_per_item(
        lambda: extract(variables, imgs),
        lambda o: np.asarray(o.scores[:, :8]),
        ex_batch,
    )
    t_extract_dev = max(t_extract - rtt / ex_batch, 1e-6)

    qd = rng.normal(size=(match_chunk, k, c)).astype(np.float32)
    dd = rng.normal(size=(match_chunk, k, c)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=-1, keepdims=True)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    qdj, ddj = jnp.asarray(qd), jnp.asarray(dd)

    if on_tpu:
        match = lambda: mutual_nn_match_pallas(qdj, ddj, None, None)[0]
        matcher_name = "pallas"
    else:
        vm = jax.jit(jax.vmap(lambda a, b: mutual_nn_match(a, b, None, None)))
        match = lambda: vm(qdj, ddj)[0]
        matcher_name = "xla"
    np.asarray(match()[:, :4])  # compile + warm
    t_pair = _timed_per_item(match, lambda o: np.asarray(o[:, :4]), match_chunk)
    t_match = t_pair * n_db
    t_match_dev = max(t_pair * match_chunk - rtt, 1e-6) / match_chunk * n_db

    frame_time = t_extract_dev + t_match_dev
    return {
        "metric": "localization_pipeline_frames_per_s_per_chip",
        "value": round(1.0 / frame_time, 3),
        "unit": "frames/s (1024px extract@4096kp + 50-pair mutual-NN; "
                "device time, relay RTT subtracted)",
        "vs_baseline": 1.0,
        "platform": platform,
        "extract_ms": round(t_extract_dev * 1e3, 2),
        "match50_ms": round(t_match_dev * 1e3, 2),
        "raw_fps_incl_relay_rtt": round(1.0 / (t_extract + t_match), 3),
        "relay_rtt_ms": round(rtt * 1e3, 2),
        "matcher": matcher_name,
    }


_WATCHDOG_S = 480  # the relay TPU occasionally hangs inside a jax call


def main():
    """Run the bench under a hard watchdog: the relay-backed TPU can hang
    inside device calls (no exception to catch), so the workload runs in a
    daemon thread and a timeout still yields the JSON line."""
    import os
    import threading

    result_box = {}

    def work():
        try:
            result_box["result"] = run_bench()
        except Exception as e:  # never exit without the JSON line
            result_box["result"] = {
                "metric": "localization_pipeline_frames_per_s_per_chip",
                "value": 0.0,
                "unit": "frames/s (bench failed)",
                "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}",
            }
            traceback.print_exc()

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(_WATCHDOG_S)
    result = result_box.get(
        "result",
        {
            "metric": "localization_pipeline_frames_per_s_per_chip",
            "value": 0.0,
            "unit": "frames/s (bench timed out)",
            "vs_baseline": 0.0,
            "error": f"watchdog timeout after {_WATCHDOG_S}s (TPU relay hang)",
        },
    )
    print(json.dumps(result), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
