"""Attribute the fused s2d stem's time across its three phases on the
real TPU (DCE-truncated jit programs, CLAUDE.md methodology), plus XLA
cost analysis per truncation. Guides the Pallas-vs-XLA decision for the
stem (VERDICT r3 #1)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from sfd2_tpu.utils.benchtime import (  # noqa: E402
    enable_compile_cache,
    measure_rtt,
    timed_per_item as timed,
)


def main():
    import jax
    import jax.numpy as jnp

    enable_compile_cache(_REPO)

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.stem import repack_stem_params, space_to_depth

    on_tpu = jax.default_backend() == "tpu"
    h = w = 1024 if on_tpu else 128
    b = 8 if on_tpu else 1
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    model = ResSegNetV2(require_stability=True, dtype=dt)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    packed = repack_stem_params(variables["params"], variables["batch_stats"])
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3), jnp.float32)
    rtt = measure_rtt(6)
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2), "shape": [b, h, w]}),
          flush=True)

    def upto(stage):
        @jax.jit
        def run(x):
            x2 = space_to_depth(x).astype(dt)
            if stage == "s2d":
                return x2
            a = jax.lax.conv_general_dilated(
                x2, packed.w1.astype(dt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            a = jax.nn.relu(a + packed.b1)
            if stage == "stageA":
                return a
            out = jax.lax.conv_general_dilated(
                a.astype(dt), packed.w2.astype(dt), (1, 1),
                [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jax.nn.relu(out + packed.b2).astype(dt)
        return run

    prev = 0.0
    for stage in ("s2d", "stageA", "full"):
        run = upto(stage)
        cost = run.lower(x).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        np.asarray(run(x)[0, 0, :4].astype(jnp.float32))
        t = timed(lambda: run(x),
                  lambda o: np.asarray(o[0, 0, :4].astype(jnp.float32)),
                  items_per_call=b, iters=3, inner=8, rtt=rtt)
        ms = t * 1e3
        print(json.dumps({
            "upto": stage, "cum_ms_per_img": round(ms, 3),
            "delta_ms": round(ms - prev, 3),
            "flops_g_per_img": round(float(cost.get("flops", 0)) / b / 1e9, 2),
            "hbm_gb_per_img": round(
                float(cost.get("bytes accessed", 0)) / b / 1e9, 3),
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
