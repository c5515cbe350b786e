"""Relay-aware TPU timing helpers shared by bench.py and scripts/.

The sandbox TPU sits behind a high-latency relay (~25-100 ms RPC
round-trip) with multi-minute "turbulence" phases that inflate whole
measurement windows 10-30×. The methodology that survives it (CLAUDE.md
"TPU performance rules"):

* batch many ASYNC dispatches per window and fence ONCE with a small
  host transfer (np.asarray of a tiny slice — block_until_ready
  under-measures through the relay);
* subtract the separately-measured RTT once per window;
* report the MIN across windows: device time is fixed and relay noise is
  strictly additive, so min is the consistent estimator (a median cannot
  reject a majority-turbulent sample).
"""

from __future__ import annotations

import time

import numpy as np


def measure_rtt(samples: int = 8) -> float:
    """Fixed host↔device round-trip cost of one fenced dispatch (min over
    `samples`; RTT is a constant plus positive jitter)."""
    import jax
    import jax.numpy as jnp

    tiny = jnp.zeros((8, 128))
    tiny_f = jax.jit(lambda x, s: x + s)
    np.asarray(tiny_f(tiny, 0.0)[0, :4])  # compile + warm
    rtts = []
    for i in range(samples):
        t0 = time.perf_counter()
        np.asarray(tiny_f(tiny, float(i + 1))[0, :4])
        rtts.append(time.perf_counter() - t0)
    return min(rtts)


def timed_per_item(fn, fence, items_per_call=1, iters=3, inner=8, rtt=0.0):
    """MIN per-item seconds over `iters` windows of `inner` async
    dispatches fenced once at the end; `rtt` is subtracted per window
    (floored at 5% of the window so a mis-estimated RTT can never zero
    out a short stage)."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        fence(out)
        ts.append(time.perf_counter() - t0)
    t_window = min(ts)
    return max(t_window - rtt, t_window * 0.05) / (inner * items_per_call)


def enable_compile_cache(repo_dir: str) -> None:
    """Persistent XLA compile cache (remote TPU compiles take minutes;
    retries after a relay wedge must skip them). Best-effort."""
    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo_dir, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
