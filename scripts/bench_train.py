"""Train-step throughput ON THE REAL TPU (single chip).

The reference publishes no training speed numbers; this establishes
ours. Times the full production step — ResSegNetV2 student forward on
the concatenated pair + SuperPoint teacher + SegLoss (det/desc/seg
terms) + Adam update (``trainer.py:258`` / ``train.py:192-213``
semantics) — with the relay-aware methodology from
sfd2_tpu/utils/benchtime.py (async dispatch batching, fenced windows,
RTT subtracted, MIN across windows).

Prints ONE JSON line with step_ms / imgs_per_s. Env knobs:
BT_R (pair resolution, default 256), BT_BS (pairs per batch, default 2),
BT_WINDOWS (default 3), BT_INNER (async steps per fence, default 4).

Run under an external ``timeout`` — the relay can wedge (CLAUDE.md);
the remote compile of the train graph takes ~4-5 min cold and is served
from .jax_cache/ on retries.
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

    from sfd2_tpu.models.sfd2 import ResSegNetV2
    from sfd2_tpu.models.superpoint import SuperPoint
    from sfd2_tpu.training.losses import SegLossConfig
    from sfd2_tpu.training.sampler import NghSampler2DS
    from sfd2_tpu.training.train_step import (
        TrainBatch,
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    r = int(os.environ.get("BT_R", "256" if on_tpu else "64"))
    b = int(os.environ.get("BT_BS", "2"))
    windows = int(os.environ.get("BT_WINDOWS", "3"))
    inner = int(os.environ.get("BT_INNER", "4" if on_tpu else "2"))
    rng = np.random.default_rng(0)

    model = ResSegNetV2(require_stability=True, require_feature=True)
    sp = SuperPoint()
    cfg = TrainConfig()  # production sampler/loss defaults
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    sp_vars = sp.init(jax.random.PRNGKey(1), jnp.zeros((1, r, r, 1)))
    step = jax.jit(make_train_step(model, sp, sp_vars, cfg))

    ys, xs = np.mgrid[0:r, 0:r]
    aflow = np.stack([xs, ys], -1).astype(np.float32)[None].repeat(b, 0)
    batch = TrainBatch(
        image1=jnp.asarray(rng.normal(size=(b, r, r, 3)).astype(np.float32)),
        image2=jnp.asarray(rng.normal(size=(b, r, r, 3)).astype(np.float32)),
        gray1=jnp.asarray(rng.random((b, r, r, 1)).astype(np.float32)),
        gray2=jnp.asarray(rng.random((b, r, r, 1)).astype(np.float32)),
        aflow=jnp.asarray(aflow),
        seg1=jnp.asarray(rng.integers(1, 150, size=(b, r, r)).astype(np.int32)),
    )
    key = jax.device_put(jax.random.PRNGKey(2))

    rtt = measure_rtt()
    t0 = time.time()
    state, metrics = step(state, batch, key)  # compile + warm
    loss0 = float(metrics["loss"])
    compile_s = time.time() - t0

    holder = {"state": state}

    def one_step():
        holder["state"], m = step(holder["state"], batch, key)
        return m

    t = timed(one_step, lambda m: np.asarray(m["loss"]),
              items_per_call=1, iters=windows, inner=inner, rtt=rtt)

    print(json.dumps({
        "metric": "train_step_ms",
        "platform": jax.default_backend(),
        "R": r, "batch_pairs": b,
        "step_ms": round(t * 1e3, 2),
        "imgs_per_s": round(2 * b / t, 1),  # student sees 2 images/pair
        "loss0": round(loss0, 4),
        "compile_s": round(compile_s, 1),
        "relay_rtt_ms": round(rtt * 1e3, 2),
        "note": ("full step: student fwd+bwd on the concat pair + "
                 "SuperPoint teacher + SegLoss + Adam; MIN across "
                 f"{windows} windows x {inner} async steps"),
    }), flush=True)


if __name__ == "__main__":
    main()
