"""Unit tests for the relay-aware timing helpers that bench.py and the
scripts/ benchmarks build on (CLAUDE.md timing methodology)."""

import time

import numpy as np

from sfd2_tpu.utils.benchtime import enable_compile_cache, timed_per_item


def test_timed_per_item_divides_by_items_and_inner():
    sleep_s = 0.02

    def fn():
        time.sleep(sleep_s)
        return 1

    t = timed_per_item(fn, fence=lambda o: o, items_per_call=5,
                       iters=2, inner=2, rtt=0.0)
    # window = 2 dispatches of 20 ms → per item = 40 ms / (2*5) = 4 ms.
    assert 0.5 * sleep_s * 2 / 10 <= t <= 3 * sleep_s * 2 / 10, t


def test_timed_per_item_rtt_floor_never_zeroes_a_stage():
    """A mis-estimated (too large) RTT must not produce ≤0 per-item time:
    differencing ignores the RTT estimate, and the non-positive-diff
    fallback floors the subtraction at 5% of the window."""
    def fn():
        time.sleep(0.002)
        return 1

    t = timed_per_item(fn, fence=lambda o: o, items_per_call=1,
                       iters=1, inner=1, rtt=1e9)
    assert t > 0.0


def test_timed_per_item_min_across_windows_rejects_one_slow_window():
    # First window of the short-pass turbulent; everything else calm.
    calls = [0.05, 0.001, 0.001] + [0.001] * 6

    def fn():
        time.sleep(calls.pop(0))
        return 1

    t = timed_per_item(fn, fence=lambda o: o, items_per_call=1,
                       iters=3, inner=1, rtt=0.0)
    assert t < 0.02, t  # min window, not mean (which would be ~17 ms)


def test_timed_per_item_differencing_cancels_fence_cost():
    """Paired-window differencing measures the per-dispatch time exactly
    even when every window pays a large fixed fence/RTT cost AND the
    supplied rtt estimate is wildly wrong (the failure that produced
    below-GEMM-floor stage times on the relay)."""
    d, fence_cost = 0.002, 0.03

    def fn():
        time.sleep(d)
        return 1

    t = timed_per_item(fn, fence=lambda o: time.sleep(fence_cost),
                       items_per_call=1, iters=2, inner=4, rtt=0.1)
    assert 0.5 * d <= t <= 2.0 * d, t


def test_enable_compile_cache_is_best_effort(tmp_path):
    enable_compile_cache(str(tmp_path))  # must not raise
