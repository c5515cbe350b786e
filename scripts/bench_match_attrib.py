"""Attribute the match-stage gap: r04 bench read match50 2.31 ms/frame
(46 µs/pair) against the matcher kernel's own 24.8 µs/pair floor
(VERDICT r4 #3 asked for a measurement-backed attribution).

Measured candidates, all at the production [50, 4096, 128] shapes:
  gemm     — the pure similarity GEMM floor (einsum, jitted)
  jitted   — mutual_nn_match_pallas under ONE jit program
  eager    — mutual_nn_match_pallas called op-by-op (the r04 bench code
             path: kernel + epilogue + ~13 glue primitives, each its own
             dispatch through the relay)
  dispatch — per-dispatch overhead of a trivial jitted op (differenced),
             scaled by the eager path's op count
  b128     — jitted matcher at the 128-pair chunk cap (amortisation)

Usage: timeout 900 python scripts/bench_match_attrib.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sfd2_tpu.utils.benchtime import (  # noqa: E402
    enable_compile_cache, measure_rtt, timed_per_item)

enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sfd2_tpu.ops.pallas_match import mutual_nn_match_pallas  # noqa: E402


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    b, k, c = (50, 4096, 128) if on_tpu else (4, 512, 64)
    out = {"platform": jax.devices()[0].platform, "shape": [b, k, c]}
    key = jax.random.PRNGKey(0)

    def unit(kk, shape):
        d = jax.random.normal(kk, shape, jnp.float32)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    d0 = unit(jax.random.fold_in(key, 0), (b, k, c))
    d1 = unit(jax.random.fold_in(key, 1), (b, k, c))
    rtt = measure_rtt()
    out["rtt_ms"] = round(rtt * 1e3, 2)
    interp = not on_tpu

    # Per-dispatch overhead: trivial op, differenced windows.
    tiny = jnp.zeros((8, 128))
    triv = jax.jit(lambda x: x + 1.0)
    np.asarray(triv(tiny)[0, :4])
    t_disp = timed_per_item(lambda: triv(tiny), lambda o: np.asarray(o[0, :4]),
                            1, inner=32, rtt=rtt)
    out["dispatch_us"] = round(t_disp * 1e6, 1)

    # Pure GEMM floor.
    gemm = jax.jit(lambda a, bb: jnp.einsum(
        "bnc,bmc->bnm", a, bb, preferred_element_type=jnp.float32))
    np.asarray(gemm(d0, d1)[0, 0, :4])
    t_gemm = timed_per_item(lambda: gemm(d0, d1),
                            lambda o: np.asarray(o[0, 0, :4]), b,
                            inner=8, rtt=rtt)
    out["gemm_us_per_pair"] = round(t_gemm * 1e6, 2)

    # Jitted full matcher.
    mj = jax.jit(lambda a, bb: mutual_nn_match_pallas(
        a, bb, None, None, interpret=interp))
    np.asarray(mj(d0, d1)[0][:, :4])
    t_jit = timed_per_item(lambda: mj(d0, d1)[0],
                           lambda o: np.asarray(o[:, :4]), b,
                           inner=8, rtt=rtt)
    out["jitted_us_per_pair"] = round(t_jit * 1e6, 2)

    # Eager full matcher (the r04 bench code path).
    np.asarray(mutual_nn_match_pallas(d0, d1, None, None,
                                      interpret=interp)[0][:, :4])
    t_eag = timed_per_item(
        lambda: mutual_nn_match_pallas(d0, d1, None, None,
                                       interpret=interp)[0],
        lambda o: np.asarray(o[:, :4]), b, inner=8, rtt=rtt)
    out["eager_us_per_pair"] = round(t_eag * 1e6, 2)
    out["eager_minus_jitted_ms_per_frame"] = round((t_eag - t_jit) * b * 1e3, 3)

    # 128-pair chunk (the engine's _batched_match cap).
    if on_tpu:
        b2 = 128
        d0b = unit(jax.random.fold_in(key, 2), (b2, k, c))
        d1b = unit(jax.random.fold_in(key, 3), (b2, k, c))
        np.asarray(mj(d0b, d1b)[0][:, :4])
        t_128 = timed_per_item(lambda: mj(d0b, d1b)[0],
                               lambda o: np.asarray(o[:, :4]), b2,
                               inner=4, rtt=rtt)
        out["jitted_b128_us_per_pair"] = round(t_128 * 1e6, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
