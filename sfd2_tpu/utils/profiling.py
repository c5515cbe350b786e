"""Profiling & stage timing (first-class, per SURVEY §5).

The reference has only ad-hoc ``time.time()`` prints; here:
* `StageTimer` — accumulating per-stage wall-clock with JSON export,
* `trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace,
* `device_time` — fenced timing helper for jitted callables (handles
  async dispatch by blocking on a representative output).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in self.totals
        }

    def dump(self, path):
        Path(path).write_text(json.dumps(self.summary(), indent=2))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, fence=None, iters: int = 3):
    """Median wall-clock of `fn(*args)` with a host-transfer fence."""
    import jax
    import numpy as np

    if fence is None:
        fence = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0])
    fence(fn(*args))  # warm-up / compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]
