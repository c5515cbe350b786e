"""Benchmark: end-to-end extraction + matching throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: localization-pipeline frames/s/chip — full-res
(1024×1024) ResSegNetV2 forward + NMS + top-4096 extraction, plus the
per-query matching of the Aachen benchmark path (mutual-NN vs 50
candidate DB frames, K=4096, C=128). The reference publishes no speed
numbers (BASELINE.md → published: {}), so vs_baseline is 1.0 by
definition until a measured reference wall-clock exists.

Timing method: the sandbox TPU is reached through a high-latency relay
(~50-100 ms RPC round-trip), so per-call host timing measures the
tunnel, not the chip. Each stage therefore runs R iterations *inside one
jitted lax.scan* (inputs generated on device) and returns a scalar; the
single round-trip is amortised over R.
"""

from __future__ import annotations

import json
import time
import traceback

import numpy as np

REPS = 16


def _time_scanned(jitted, *args):
    """Median of 3 runs of an R-rep scanned program; returns secs/rep."""
    np.asarray(jitted(0, *args))  # compile + warm
    ts = []
    for t in range(3):
        t0 = time.perf_counter()
        np.asarray(jitted(t + 1, *args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / REPS


def run_bench():
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.matching import mutual_nn_match
    from sfd2_tpu.ops.pallas_match import mutual_nn_match_pallas

    platform = jax.devices()[0].platform

    h = w = 1024
    k = 4096
    c = 128
    n_db = 50  # candidate DB frames per query (test_aachenv_1_1 NetVLAD top-50)
    chunk = 10  # pairs per matching launch

    model = ResSegNetV2(require_stability=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))

    @jax.jit
    def extract_scan(seed, variables):
        def body(carry, i):
            img = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), i), (1, h, w, 3)
            )
            out = model.apply(variables, img)
            kp = extract_keypoints(
                out.score, out.descriptors, out.stability,
                max_keypoints=k, conf_threshold=0.001,
            )
            return carry + jnp.sum(kp.scores), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return tot

    t_extract = _time_scanned(extract_scan, variables)

    def match_scan_fn(match):
        @jax.jit
        def run(seed):
            key = jax.random.PRNGKey(seed)

            def mk(i):
                d = jax.random.normal(jax.random.fold_in(key, i), (chunk, k, c))
                return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

            def body(carry, i):
                m, _ = match(mk(2 * i), mk(2 * i + 1))
                return carry + jnp.sum(m), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS))
            return tot

        return run

    use_pallas = platform == "tpu"
    if use_pallas:
        match = lambda a, b: mutual_nn_match_pallas(a, b, None, None)
    else:
        match = lambda a, b: jax.vmap(lambda x, y: mutual_nn_match(x, y, None, None))(a, b)
    t_chunk = _time_scanned(match_scan_fn(match))
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
        "matcher": "pallas" if use_pallas else "xla",
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
