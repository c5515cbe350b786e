"""Teacher-precompute throughput ON THE REAL TPU (single chip).

The training design replaces the reference's in-loop mmseg/ConvNeXt
teacher calls (``trainer.py:277-316``, a per-sample CPU↔GPU ping-pong)
with batched on-device teacher passes; this measures what those passes
cost so the offline/online precompute budget is a number, not a guess
(VERDICT r3 missing #4):

  * SegTeacher.label_batch — UPerNet(ConvNeXt-base) forward + logit
    upsample + argmax at the shipped train crop R=512 (the crop equals
    the mmseg slide window, so whole-image == slide at this size);
  * ConvNeXt-base stages 0-1 forward — the seg_feat consistency
    teacher's features for the concatenated pair batch.

Prints ONE JSON line with imgs/s for each. Env knobs: BT_R (default
512), BT_BS (default 8), BT_WINDOWS (3), BT_INNER (4). Run under an
external ``timeout`` (relay wedges — CLAUDE.md); compiles are served
from .jax_cache/ on retry.
"""

from __future__ import annotations

import json
import os
import sys
import time

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

    from sfd2_tpu.models.convnext import ConvNeXt
    from sfd2_tpu.training.seg_teacher import SegTeacher

    on_tpu = jax.default_backend() == "tpu"
    r = int(os.environ.get("BT_R", "512" if on_tpu else "64"))
    b = int(os.environ.get("BT_BS", "8" if on_tpu else "2"))
    windows = int(os.environ.get("BT_WINDOWS", "3"))
    inner = int(os.environ.get("BT_INNER", "4" if on_tpu else "2"))
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((b, r, r, 3)).astype(np.float32))

    rtt = measure_rtt()
    out = {"metric": "teacher_precompute_imgs_per_s",
           "platform": jax.default_backend(), "R": r, "batch": b,
           "relay_rtt_ms": round(rtt * 1e3, 2)}

    # --- UPerNet segmentation teacher -----------------------------------
    teacher = SegTeacher()
    t0 = time.time()
    np.asarray(teacher._label(teacher.variables, raw)[:, :2, :2])  # compile
    out["seg_compile_s"] = round(time.time() - t0, 1)
    t = timed(lambda: teacher._label(teacher.variables, raw),
              lambda o: np.asarray(o[:, :2, :2]),
              items_per_call=b, iters=windows, inner=inner, rtt=rtt)
    out["seg_ms_per_img"] = round(t * 1e3, 2)
    out["seg_imgs_per_s"] = round(1.0 / t, 1)

    # --- ConvNeXt-base feature teacher (stages 0-1) ----------------------
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    cnx = ConvNeXt(dtype=dt)
    variables = cnx.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    if on_tpu:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)

    @jax.jit
    def feats(variables, x):
        return cnx.apply(variables, x)[:2]  # stages 0-1 feed seg_feat

    t0 = time.time()
    np.asarray(feats(variables, raw)[0][:, 0, 0, :4].astype(jnp.float32))
    out["feat_compile_s"] = round(time.time() - t0, 1)
    t = timed(lambda: feats(variables, raw),
              lambda o: np.asarray(o[0][:, 0, 0, :4].astype(jnp.float32)),
              items_per_call=b, iters=windows, inner=inner, rtt=rtt)
    out["feat_ms_per_img"] = round(t * 1e3, 2)
    out["feat_imgs_per_s"] = round(1.0 / t, 1)

    out["note"] = ("batched on-device teacher passes (vs the reference's "
                   "per-sample host loop, trainer.py:277-316); MIN across "
                   f"{windows} windows x {inner} async dispatches")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
