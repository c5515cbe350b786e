"""A/B the fused s2d stem (ops/stem.py) against the layer-by-layer stem
INSIDE the full extraction program on the real TPU.

Times the complete jitted extract (model forward + NMS/top-K/sampling)
both ways at the bench shapes — in-composition, not standalone
(CLAUDE.md: XLA optimises composed programs differently) — plus the
truncated out1c-only programs for stem-level attribution. Prints one
JSON line per measurement. Env: AB_H/AB_W (1024/1024), AB_B (8),
AB_K (4096)."""

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
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.stem import fused_stem_apply, repack_stem_params

    on_tpu = jax.default_backend() == "tpu"
    h = int(os.environ.get("AB_H", "1024" if on_tpu else "256"))
    w = int(os.environ.get("AB_W", "1024" if on_tpu else "256"))
    b = int(os.environ.get("AB_B", "8" if on_tpu else "1"))
    k = int(os.environ.get("AB_K", "4096" if on_tpu else "512"))
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    model = ResSegNetV2(require_stability=True, dtype=dt)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    packed = repack_stem_params(variables["params"], variables["batch_stats"])
    if on_tpu:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3), jnp.float32)
    rtt = measure_rtt(6)
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2),
                      "shape": [b, h, w], "k": k}), flush=True)

    def full(fused):
        @jax.jit
        def run(variables, images):
            if fused:
                out1c = fused_stem_apply(images, packed, dt)
                out = model.apply(variables, out1c,
                                  method=model.forward_from_out1c)
            else:
                out = model.apply(variables, images)
            return extract_keypoints(out.score, out.descriptors,
                                     out.stability, max_keypoints=k,
                                     conf_threshold=0.001)
        return run

    def stem_only(fused):
        if fused:
            @jax.jit
            def run(variables, images):
                return fused_stem_apply(images, packed, dt)
        else:
            from sfd2_tpu.models.layers import BNRelu, ConvUnit
            import flax.linen as nn

            class Stem(nn.Module):
                @nn.compact
                def __call__(self, z):
                    a = ConvUnit(64, dtype=dt, name="conv1a")(z, False)
                    c = ConvUnit(64, stride=2, use_bn=False, relu=False,
                                 dtype=dt, name="conv1b")(a, False)
                    return BNRelu(dtype=dt, name="bn1b")(c, False)

            stem = Stem()
            sv = {"params": {n: variables["params"][n]
                             for n in ("conv1a", "conv1b")},
                  "batch_stats": {n: variables["batch_stats"][n]
                                  for n in ("conv1a", "bn1b")}}

            @jax.jit
            def run(variables, images):
                return stem.apply(sv, images)
        return run

    for name, builder, fence in (
        ("extract_standard", full(False), lambda o: np.asarray(o.scores[:, :4])),
        ("extract_fused", full(True), lambda o: np.asarray(o.scores[:, :4])),
        ("stem_standard", stem_only(False),
         lambda o: np.asarray(o[:, 0, :4].astype(jnp.float32))),
        ("stem_fused", stem_only(True),
         lambda o: np.asarray(o[:, 0, :4].astype(jnp.float32))),
    ):
        fence(builder(variables, x))  # compile + warm
        t = timed(lambda: builder(variables, x), fence,
                  items_per_call=b, iters=3, inner=6, rtt=rtt)
        print(json.dumps({"prog": name, "ms_per_img": round(t * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
