"""Pallas stem kernel on the REAL TPU: Mosaic-lowering correctness vs
the XLA s2d stem, then speed standalone and inside the full extract
program. Env: SP_H/SP_W (1024), SP_B (8)."""

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
    from sfd2_tpu.ops.pallas_stem import StemWeights, stem_pallas_apply
    from sfd2_tpu.ops.stem import fused_stem_apply, repack_stem_params

    on_tpu = jax.default_backend() == "tpu"
    h = int(os.environ.get("SP_H", "1024" if on_tpu else "64"))
    w = int(os.environ.get("SP_W", "1024" if on_tpu else "256"))
    b = int(os.environ.get("SP_B", "8" if on_tpu else "1"))
    k = 4096 if on_tpu else 512
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    model = ResSegNetV2(require_stability=True, dtype=dt)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    packed = repack_stem_params(variables["params"], variables["batch_stats"])
    weights = StemWeights(packed)  # kernel computes f32 (Mosaic rotate)
    if on_tpu:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3), jnp.float32)
    rtt = measure_rtt(6)
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2), "shape": [b, h, w]}),
          flush=True)

    # --- correctness on the real backend (bf16 GEMMs both sides) --------
    ref = jax.jit(lambda z: fused_stem_apply(z, packed, dt))(x)
    got = jax.jit(lambda z: stem_pallas_apply(z, weights, dt))(x)
    ref_f = np.asarray(ref.astype(jnp.float32))
    got_f = np.asarray(got.astype(jnp.float32))
    denom = max(1e-6, float(np.abs(ref_f).max()))
    print(json.dumps({
        "check": "pallas_vs_xla_s2d",
        "max_abs": round(float(np.abs(got_f - ref_f).max()), 6),
        "max_rel": round(float(np.abs(got_f - ref_f).max() / denom), 6),
    }), flush=True)

    # --- speed: stem standalone + full extract ---------------------------
    run_stem = jax.jit(lambda z: stem_pallas_apply(z, weights, dt))
    np.asarray(run_stem(x)[:, 0, 0, :4].astype(jnp.float32))
    t = timed(lambda: run_stem(x),
              lambda o: np.asarray(o[:, 0, 0, :4].astype(jnp.float32)),
              items_per_call=b, iters=3, inner=6, rtt=rtt)
    print(json.dumps({"prog": "stem_pallas", "ms_per_img": round(t * 1e3, 3)}),
          flush=True)

    @jax.jit
    def extract_p(variables, images):
        out1c = stem_pallas_apply(images, weights, dt)
        out = model.apply(variables, out1c, method=model.forward_from_out1c)
        return extract_keypoints(out.score, out.descriptors, out.stability,
                                 max_keypoints=k, conf_threshold=0.001)

    np.asarray(extract_p(variables, x).scores[:, :4])
    t = timed(lambda: extract_p(variables, x),
              lambda o: np.asarray(o.scores[:, :4]),
              items_per_call=b, iters=3, inner=6, rtt=rtt)
    print(json.dumps({"prog": "extract_pallas_stem",
                      "ms_per_img": round(t * 1e3, 3)}), flush=True)

    # --- host-packed variants: what production actually dispatches ------
    # (the host builds the s2d layout next to the upload, so the device
    # program starts from packed input in both backends)
    from sfd2_tpu.ops.pallas_stem import fused_stem_pallas, pack_s2d_plane_rows
    from sfd2_tpu.ops.stem import space_to_depth

    x2_rows = jax.device_put(pack_s2d_plane_rows(x).astype(jnp.float32))
    run_k = jax.jit(lambda z: fused_stem_pallas(
        z, weights.w1k, weights.w2k, weights.b1, weights.b2, out_dtype=dt))
    np.asarray(run_k(x2_rows)[:, 0, 0, :4].astype(jnp.float32))
    t = timed(lambda: run_k(x2_rows),
              lambda o: np.asarray(o[:, 0, 0, :4].astype(jnp.float32)),
              items_per_call=b, iters=3, inner=6, rtt=rtt)
    print(json.dumps({"prog": "stem_pallas_prepacked",
                      "ms_per_img": round(t * 1e3, 3)}), flush=True)

    x2_nhwc = jax.device_put(space_to_depth(x).astype(dt))

    @jax.jit
    def run_xla_convs(z):
        a = jax.lax.conv_general_dilated(
            z, packed.w1.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        a = jax.nn.relu(a + packed.b1)
        o = jax.lax.conv_general_dilated(
            a.astype(dt), packed.w2.astype(dt), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(o + packed.b2).astype(dt)

    np.asarray(run_xla_convs(x2_nhwc)[:, 0, 0, :4].astype(jnp.float32))
    t = timed(lambda: run_xla_convs(x2_nhwc),
              lambda o: np.asarray(o[:, 0, 0, :4].astype(jnp.float32)),
              items_per_call=b, iters=3, inner=6, rtt=rtt)
    print(json.dumps({"prog": "stem_xla_convs_prepacked",
                      "ms_per_img": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
