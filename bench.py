"""Benchmark: end-to-end extraction + matching throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: localization-pipeline frames/s/chip — full-res
(1024×1024) ResSegNetV2 forward + NMS + top-4096 extraction, plus the
per-query matching of the Aachen benchmark path (mutual-NN vs 50
candidate DB frames, K=4096, C=128). The reference publishes no speed
numbers (BASELINE.md → published: {}), so vs_baseline is 1.0 by
definition until a measured reference wall-clock exists.

Timing notes: every iteration is fenced by a small host transfer
(np.asarray of a [K] vector) — on the experimental axon platform
block_until_ready alone under-measures. The median over iterations is
reported to shed tunnel hiccups.
"""

from __future__ import annotations

import json
import statistics
import time
import traceback

import numpy as np


def _timed(fn, fence, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def run_bench():
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.matching import mutual_nn_match_batch

    platform = jax.devices()[0].platform

    h = w = 1024
    k = 4096
    n_db = 50  # candidate DB frames per query (test_aachenv_1_1 NetVLAD top-50)
    chunk = 10  # matching pairs per launch (bounds the K×K sim memory)

    model = ResSegNetV2(require_stability=True)
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)

    @jax.jit
    def extract(v, im):
        out = model.apply(v, im)
        return extract_keypoints(
            out.score, out.descriptors, out.stability,
            max_keypoints=k, conf_threshold=0.001,
        )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))

    kp = extract(variables, img)
    np.asarray(kp.scores)  # warm-up + compile

    iters = 5 if platform == "tpu" else 2
    t_extract = _timed(
        lambda: extract(variables, img), lambda o: np.asarray(o.scores), iters
    )

    qd = rng.normal(size=(chunk, k, 128)).astype(np.float32)
    dd = rng.normal(size=(chunk, k, 128)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=-1, keepdims=True)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    qv = np.ones((chunk, k), bool)
    qdj, ddj, qvj = jnp.asarray(qd), jnp.asarray(dd), jnp.asarray(qv)

    m, _ = mutual_nn_match_batch(qdj, ddj, qvj, qvj)
    np.asarray(m[:, :4])  # warm-up

    t_chunk = _timed(
        lambda: mutual_nn_match_batch(qdj, ddj, qvj, qvj)[0],
        lambda o: np.asarray(o[:, :4]),
        iters,
    )
    t_match = t_chunk * (n_db / chunk)

    frame_time = t_extract + t_match
    return {
        "metric": "localization_pipeline_frames_per_s_per_chip",
        "value": round(1.0 / frame_time, 3),
        "unit": "frames/s (1024px extract@4096kp + 50-pair mutual-NN)",
        "vs_baseline": 1.0,
        "platform": platform,
        "extract_ms": round(t_extract * 1e3, 2),
        "match50_ms": round(t_match * 1e3, 2),
    }


def main():
    try:
        result = run_bench()
    except Exception as e:  # never exit without the JSON line
        result = {
            "metric": "localization_pipeline_frames_per_s_per_chip",
            "value": 0.0,
            "unit": "frames/s (bench failed)",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }
        traceback.print_exc()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
