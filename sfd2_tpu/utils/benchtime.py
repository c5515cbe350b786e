"""Relay-aware TPU timing helpers shared by bench.py and scripts/.

The sandbox TPU sits behind a high-latency relay (~25-100 ms RPC
round-trip) with multi-minute "turbulence" phases that inflate whole
measurement windows 10-30×. The methodology that survives it (CLAUDE.md
"TPU performance rules"):

* batch many ASYNC dispatches per window and fence ONCE with a small
  host transfer (np.asarray of a tiny slice — block_until_ready
  under-measures through the relay);
* take the MIN across windows: device time is fixed and relay noise is
  strictly additive, so min is the consistent estimator (a median cannot
  reject a majority-turbulent sample);
* cancel the per-window fence/RTT cost by PAIRED-WINDOW DIFFERENCING
  (inner vs 2×inner dispatches) instead of subtracting a separately
  measured RTT — an RTT sampled in a different turbulence phase than
  the window it is subtracted from biases the estimate either way
  (see timed_per_item).
"""

from __future__ import annotations

import time

import numpy as np


_RTT_FN = None  # module-level: one traced program, re-usable cheaply


def measure_rtt(samples: int = 8) -> float:
    """Fixed host↔device round-trip cost of one fenced dispatch (min over
    `samples`; RTT is a constant plus positive jitter — re-sample
    throughout a run and keep the GLOBAL min: a single estimate taken
    during a turbulence phase poisons every window it is subtracted
    from)."""
    global _RTT_FN
    import jax
    import jax.numpy as jnp

    tiny = jnp.zeros((8, 128))
    if _RTT_FN is None:
        _RTT_FN = jax.jit(lambda x, s: x + s)
        np.asarray(_RTT_FN(tiny, 0.0)[0, :4])  # compile + warm
    rtts = []
    for i in range(samples):
        t0 = time.perf_counter()
        np.asarray(_RTT_FN(tiny, float(i + 1))[0, :4])
        rtts.append(time.perf_counter() - t0)
    return min(rtts)


def timed_per_item(fn, fence, items_per_call=1, iters=3, inner=8, rtt=0.0):
    """Per-item seconds by PAIRED-WINDOW DIFFERENCING: time windows of
    `inner` and 2×`inner` async dispatches (each the min over `iters`),
    then divide the difference by `inner` — the per-window fence/RTT
    cost cancels exactly, so the estimate is immune to an RTT measured
    during a different relay-turbulence phase. (Subtracting a setup-time
    RTT once per window, the old scheme, under-reported short stages to
    below physical floors when setup was turbulent and the measurement
    windows were calm: a 41.7 ms RTT estimate against a ~35 ms match
    window left only the 5% floor — 5.4 µs/pair, beneath the 23 µs pure-
    GEMM bound.) Falls back to rtt-subtraction (floored at 5% of the
    window) when the difference is non-positive, i.e. the short window
    never escaped turbulence; the single-window bound t1/inner caps the
    estimate either way."""

    def _window(n):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            fence(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = _window(inner)
    t2 = _window(2 * inner)
    diff = t2 - t1
    # Two estimators whose finite-sample failure modes are disjoint:
    #   est_sub  under-estimates only when `rtt` (ideally a GLOBAL MIN
    #            re-sampled across the whole run) exceeds the true RTT
    #            floor — i.e. every RTT sample was turbulent;
    #   est_diff under-estimates only when the short windows were all
    #            turbulent while the long ones were calm.
    # Both converge to the true per-item time FROM ABOVE as window count
    # grows (noise is additive positive), so max() of the two is still an
    # over-estimate — conservative in the honest direction — while either
    # alone produced below-physical-floor stage times on this relay.
    est_sub = max(t1 - rtt, t1 * 0.05) / inner
    est_diff = (min(diff, t1) / inner) if diff > 0 else 0.0
    return max(est_sub, est_diff) / items_per_call


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
