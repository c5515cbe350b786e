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
    """Per-item seconds by PAIRED-WINDOW DIFFERENCING: time PAIRS of
    windows (`inner` then 2×`inner` async dispatches, back-to-back so
    both sit in the same relay-turbulence phase), difference each pair,
    and take the min across pairs — the per-window fence/RTT cost drops
    out of each pair's difference. Differencing is a floor-protected
    lower path, not an exact cancellation: a stage whose fence costs
    more than the probed RTT, or a pair whose short window alone caught
    turbulence, can still bias one estimator, so the reported time is
    the MAX of two estimators whose finite-sample failure modes are
    disjoint:
      est_sub  under-estimates only when `rtt` (a GLOBAL MIN re-sampled
               across the whole run) exceeds the stage's true fence
               floor — i.e. every RTT sample was turbulent;
      est_diff under-estimates only when some pair's short window was
               turbulent while its long window was calm (pairs are
               back-to-back precisely to correlate the phases).
    Both converge to the true per-item time FROM ABOVE as window count
    grows (noise is additive positive), so max() is a deliberately
    conservative bound — fps is under-, never over-reported. (History:
    subtracting a setup-time RTT once per window under-reported short
    stages below physical floors — a 41.7 ms RTT estimate against a
    ~35 ms match window left only the 5% floor, 5.4 µs/pair, beneath
    the 23 µs pure-GEMM bound; unpaired differencing [all t1 windows,
    then all t2 windows] let a turbulence phase starting between the
    blocks inflate the difference to the t1 cap.)"""

    def _window(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        fence(out)
        return time.perf_counter() - t0

    t1s, diffs = [], []
    for _ in range(iters):
        a = _window(inner)
        b = _window(2 * inner)
        t1s.append(a)
        diffs.append(b - a)
    t1 = min(t1s)
    good = [d for d in diffs if d > 0]
    est_sub = max(t1 - rtt, t1 * 0.05) / inner
    est_diff = (min(min(good), t1) / inner) if good else 0.0
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
