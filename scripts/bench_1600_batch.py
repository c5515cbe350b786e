"""A/B probe for the r1600 Aachen-config extract batch size (VERDICT r4 #2).

The extract1600 bench stage runs batch 8 (bench.py); 1024² runs batch
16 and is ~19 % more pixel-efficient. This measures the full jitted
extract program at 1600×1280 (pallas-stem bucket for Aachen 1600×1200,
resize_max 1600 — extract_localization.py:39) across batch sizes, with
the relay-aware methodology from utils/benchtime.py.

Prints one JSON line per batch size. Env: B1600_BATCHES="8,16".
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from sfd2_tpu.utils.benchtime import (  # noqa: E402
    enable_compile_cache, measure_rtt, timed_per_item)


def main():
    import jax
    import jax.numpy as jnp

    enable_compile_cache(str(_REPO))
    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.ops.extract import extract_keypoints
    from sfd2_tpu.ops.pallas_stem import StemWeights, fused_stem_pallas
    from sfd2_tpu.ops.stem import repack_stem_params

    h16, w16 = 1600, 1280
    k = 4096
    model = ResSegNetV2(require_stability=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32))
    stem_w = StemWeights(repack_stem_params(
        variables["params"], variables["batch_stats"]))
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def extract1600(variables, x2_rows):
        out1c = fused_stem_pallas(
            x2_rows, stem_w.w1k, stem_w.w2k, stem_w.b1, stem_w.b2,
            out_dtype=jnp.bfloat16)
        out = model.apply(variables, out1c,
                          method=model.forward_from_out1c)
        return extract_keypoints(out.score, out.descriptors, out.stability,
                                 max_keypoints=k, conf_threshold=0.001)

    rtt = measure_rtt()
    key = jax.random.PRNGKey(1)
    for b in [int(x) for x in
              os.environ.get("B1600_BATCHES", "8,16").split(",")]:
        imgs = jax.random.normal(
            jax.random.fold_in(key, b), (b, h16 // 2 + 8, 16, w16 // 2),
            jnp.float32)
        try:
            np.asarray(extract1600(variables, imgs).scores[:, :8])  # warm
            t = timed_per_item(
                lambda: extract1600(variables, imgs),
                lambda o: np.asarray(o.scores[:, :8]), b, inner=4, rtt=rtt)
            print(json.dumps({"batch": b, "extract1600_ms": round(t * 1e3, 3),
                              "fps_1600_extract_only": round(1e-3 / t, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"batch": b,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
