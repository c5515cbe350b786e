"""Unit tests for bench.py's wedge-survivability plumbing: partial
composition, round-aware ledger selection, and attempt logging.

These are the driver's only window into performance (VERDICT r2 #1) —
the composition logic must keep emitting sane JSON from any partial
state a relay wedge leaves behind."""

import json

import bench


def _ledgered(shared):
    # Avoid reading the repo's real BENCH_r*.json in composition tests.
    shared.setdefault("ledger", (None, None, None))
    return shared


def test_compose_empty_state_is_partial_zero():
    out = bench._compose(_ledgered({}))
    assert out["value"] == 0.0
    assert out["partial"] is True
    assert out["stages_measured"] == []
    assert out["metric"] == bench._METRIC


def test_compose_partial_reports_measured_stages_only():
    shared = _ledgered({
        "times": {"match": 30e-6, "gemm": 1.0},
        "n_db": 50,
        "gemm_flops_total": 1e12,
        "platform": "tpu",
    })
    out = bench._compose(shared)
    assert out["partial"] is True
    assert out["stages_measured"] == ["match"]
    assert out["match50_ms"] == 1.5  # 30 µs × 50
    assert abs(out["value"] - 1.0 / 1.5e-3) < 1.0
    assert "PARTIAL" in out["unit"]
    assert out["measured_gemm_tflops"] == 1.0


def test_compose_complete_headline():
    times = {"extract": 6e-3, "match": 30e-6, "pnp": 1.3e-3,
             "refine": 0.25e-3, "ba": 50e-3}
    shared = _ledgered({"times": dict(times), "n_db": 50, "ba_frames": 50})
    out = bench._compose(shared)
    assert "partial" not in out
    frame = 6e-3 + 1.5e-3 + 1.3e-3 + 0.25e-3 + 1e-3
    assert abs(out["value"] - 1.0 / frame) < 0.5
    assert out["ba_ms_per_frame"] == 1.0
    json.dumps(out)  # must be JSON-serialisable as emitted


def test_compose_quick_mode_is_marked():
    out = bench._compose(_ledgered({"quick": True, "times": {"match": 1e-5},
                                    "n_db": 50}))
    assert out["quick"] is True
    assert out["unit"].startswith("QUICK MODE")


def test_compose_fatal_error_reaches_json():
    """A worker crash must be visible in the emitted line, not only in a
    shared dict the watchdog never re-reads."""
    out = bench._compose(_ledgered({
        "times": {"match": 1e-5}, "n_db": 50,
        "stage_errors": {"fatal": "RuntimeError: remote compile SIGABRT"},
    }))
    assert out["error"] == "RuntimeError: remote compile SIGABRT"
    assert out["stage_errors"]["fatal"].startswith("RuntimeError")


def test_prev_bench_round_inference(tmp_path, monkeypatch):
    """Baseline = highest round with value>0; wedged 0.0 rounds skipped."""
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    assert bench._prev_bench() == (None, None, None)

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"value": 40.3}}))
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"value": 0.0}}))  # wedged round
    ref, prev, r01 = bench._prev_bench()
    assert (ref, prev, r01) == ("BENCH_r01", 40.3, 40.3)

    # After this round's artifact lands, a rerun compares against it
    # (a real prior artifact), not against r01 silently.
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"parsed": {"value": 90.0}}))
    ref, prev, r01 = bench._prev_bench()
    assert (ref, prev) == ("BENCH_r03", 90.0)
    assert r01 == 40.3


def test_append_attempt_writes_jsonl(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    bench._append_attempt({"event": "start", "budget_s": 1})
    bench._append_attempt({"event": "end", "value": 1.5})
    lines = (tmp_path / "BENCH_ATTEMPTS.jsonl").read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["event"] == "start" and "iso" in rec and "ts" in rec
