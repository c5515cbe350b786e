"""Attribute extraction time across encoder stages ON THE REAL TPU.

Times jitted programs that return only successively deeper activations —
XLA's dead-code elimination trims everything past the returned value, so
t(out1c) − t(out1a) is the true in-composition cost of conv1b+bn1b, etc.
(CLAUDE.md: never trust standalone per-layer timings on TPU).

Also prints HBM-bytes/flops per truncated program from XLA cost
analysis, so each stage can be placed on the roofline (is the stem
memory-bound?). Informs the round-3 stem decision (VERDICT r2 #6).
"""

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
    import flax.linen as nn

    enable_compile_cache(_REPO)

    from sfd2_tpu.models.layers import BNRelu, ConvBNReluConv, ConvUnit, ResBlock

    on_tpu = jax.default_backend() == "tpu"
    h = w = 1024 if on_tpu else 256
    b = 8 if on_tpu else 1
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    class Encoder(nn.Module):
        upto: str = "out4"

        @nn.compact
        def __call__(self, x):
            taps = {}
            out1a = ConvUnit(64, dtype=dt, name="conv1a")(x, False)
            taps["out1a"] = out1a
            out1b = ConvUnit(64, stride=2, use_bn=False, relu=False,
                             dtype=dt, name="conv1b")(out1a, False)
            out1c = BNRelu(dtype=dt, name="bn1b")(out1b, False)
            taps["out1c"] = out1c
            out2a = ConvUnit(128, dtype=dt, name="conv2a")(out1c, False)
            out2b = ConvUnit(128, stride=2, use_bn=False, relu=False,
                             dtype=dt, name="conv2b")(out2a, False)
            out2c = BNRelu(dtype=dt, name="bn2b")(out2b, False)
            taps["out2c"] = out2c
            out3a = ConvUnit(256, dtype=dt, name="conv3a")(out2c, False)
            out3b = ConvUnit(256, use_bn=False, relu=False,
                             dtype=dt, name="conv3b")(out3a, False)
            out3c = BNRelu(dtype=dt, name="bn3b")(out3b, False)
            taps["out3c"] = out3c
            out4 = out3c
            for i in range(3):
                out4 = ResBlock(256, dtype=dt, name=f"res{i+1}")(out4, False)
            taps["out4"] = out4
            return taps[self.upto]

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, 3), jnp.float32).astype(dt)
    full = Encoder()
    variables = full.init(key, x)
    if on_tpu:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    rtt = measure_rtt(6)
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2), "shape": [b, h, w]}),
          flush=True)

    prev_ms = 0.0
    for upto in ("out1a", "out1c", "out2c", "out3c", "out4"):
        m = Encoder(upto=upto)
        run = jax.jit(lambda v, z: m.apply(v, z))
        lowered = run.lower(variables, x).compile()
        cost = lowered.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        np.asarray(run(variables, x)[0, 0, :4].astype(jnp.float32))
        t = timed(lambda: run(variables, x),
                  lambda o: np.asarray(o[0, 0, :4].astype(jnp.float32)),
                  rtt=rtt) / b
        ms = t * 1e3
        print(json.dumps({
            "upto": upto, "cum_ms_per_img": round(ms, 3),
            "delta_ms": round(ms - prev_ms, 3),
            "flops_g_per_img": round(float(cost.get("flops", 0)) / b / 1e9, 1),
            "hbm_gb_per_img": round(
                float(cost.get("bytes accessed", 0)) / b / 1e9, 3),
        }), flush=True)
        prev_ms = ms


if __name__ == "__main__":
    main()
