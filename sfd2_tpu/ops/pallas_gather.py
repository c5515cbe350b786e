"""Pallas row-gather for TPU: out[m] = table[idx[m]] for small-C tables.

XLA lowers `table[idx]` to a scalar gather costing ~4-10 ns/index
standalone (and ~20 ns/index when embedded in the round-2 BA CG loop,
where the [51200]←[8192] point-block gather measured 1.06 ms and
dominated the solve). Mosaic's `tpu.dynamic_gather` is an in-register
lane shuffle but only supports single-vreg (128-lane) tables, so this
kernel walks the table in 128-wide chunks per 8×128-index block:
lane-local gather + chunk select on the high index bits — pure vector
ops serving 8 row groups per visited chunk.

Scaling (round-3 redesign): a full walk visits all N/128 chunks per
block (~0.24 ns/idx/chunk measured — see `_CROSSOVER_CHUNKS`), so it
loses to XLA's scalar gather beyond ~16 chunks of table. Two mechanisms
fix the big-N regime:

* per-block CHUNK BOUNDS: the kernel receives each 8-group block's
  [min, max] chunk (computed with two cheap XLA reductions) and walks
  only that dynamic range (`lax.fori_loop`). For SORTED indices each
  block of 1024 consecutive indices spans ~⌈8N/M⌉ chunks, so total work
  drops from O(M/128 · N/128) to O(M/1024 + N/128). `sfm/ba.py` sorts
  its observations by point index once per solve precisely to hit this
  path (order-invariant math — everything downstream is a segment_sum).
* a STATIC crossover for unsorted indices: when the table exceeds
  `_CROSSOVER_CHUNKS` chunks and the caller cannot promise sortedness,
  `gather_rows` falls back to XLA's gather (the bounds give no static
  guarantee there; worst case is the full walk).

Used by `sfm/ba.py` (point/camera block gathers). CPU / non-TPU backends
fall back to `jnp.take` — identical results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tables larger than this many 128-row chunks use XLA's gather unless the
# caller promises sorted indices (worst-case walk would exceed the scalar
# gather's cost). Measured on the v5e (scripts/bench_ba_scale.py,
# 2026-08-18, 8-sublane kernel): SORTED stays ~0.16 ms flat from
# N=8k..131k and M=51k..410k (up to 10.4x over XLA); UNSORTED costs
# ~0.24 ns/idx/chunk vs XLA's ~4-10 ns/idx scalar gather, so the
# unsorted break-even is ~16 chunks (~2k rows). BA's camera-block
# gathers (N=cams, a few chunks, M=obs large) sit far below it; its
# point-block gathers pass idx_sorted=True (observations sorted by
# point once per solve).
_CROSSOVER_CHUNKS = 16


_SUBLANES = 8  # row groups per kernel block (full 8x128 vregs; Mosaic
#                requires the sublane block dim be a multiple of 8)


def _make_kernel(c: int):
    """Grid over 8-group blocks; per block, walk chunks [lo_b, hi_b].

    Each block holds 8 row groups as the sublanes of full 8x128 vregs:
    one lane-local `take_along_axis` serves all 8 groups per visited
    chunk (Mosaic lowers per-sublane lane gathers in-register — same
    scheme as pallas_match._gather_chunks, proven on hardware). A
    (1, 128) block would both waste 7/8 of every vreg and violate
    Mosaic's sublane-divisibility rule for non-full blocks."""

    def kernel(bounds_ref, lo_ref, hi_ref, table_ref, out_ref):
        i = pl.program_id(0)
        lo = lo_ref[...]  # [8, 128] lane-local index
        hi = hi_ref[...]  # [8, 128] chunk id
        c0 = bounds_ref[i, 0]
        c1 = bounds_ref[i, 1]
        for ci in range(c):
            def body(k, acc):
                chunk = table_ref[ci, k, :].reshape(1, 128)
                g = jnp.take_along_axis(
                    jnp.broadcast_to(chunk, (_SUBLANES, 128)), lo, axis=1,
                    mode="promise_in_bounds",
                )
                return jnp.where(hi == k, g, acc)

            out_ref[ci] = jax.lax.fori_loop(
                c0, c1 + 1, body, jnp.zeros((_SUBLANES, 128), jnp.float32)
            )

    return kernel


def _group_bounds(idx: jax.Array, m: int):
    """Pad `idx` to whole 8x128 blocks and split into per-group
    lane-local index / chunk id / per-BLOCK [min, max] chunk bounds.

    Pads with the LAST index, not 0: zero-padding would drag the final
    block's chunk lower bound to 0 and turn its bounded walk back into
    a full-table walk whenever M is not a multiple of 1024."""
    blk = _SUBLANES * 128
    mp = -(-m // blk) * blk  # pad index count to whole blocks
    fill = idx[m - 1].astype(jnp.int32) if m > 0 else jnp.int32(0)
    idx_p = jnp.full((mp,), fill, jnp.int32).at[:m].set(idx.astype(jnp.int32))
    r = mp // 128
    rb = r // _SUBLANES
    lo = (idx_p & 127).reshape(r, 128)
    hi = jax.lax.shift_right_logical(idx_p, 7).reshape(r, 128)
    hi_b = hi.reshape(rb, blk)
    bounds = jnp.stack(
        [jnp.min(hi_b, axis=1), jnp.max(hi_b, axis=1)], axis=1
    )  # [rb, 2] per-block chunk range (tight for sorted indices)
    return lo, hi, bounds, mp, rb


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(
    table: jax.Array,  # [N, C] float
    idx: jax.Array,  # [M] int32, values in [0, N)
    interpret: bool = False,
) -> jax.Array:  # [M, C], dtype of table
    """out[m] = table[idx[m]] via the bounded two-level chunk gather."""
    n, c = table.shape
    (m,) = idx.shape
    np_ = -(-n // 128) * 128  # pad table rows to whole chunks
    n_chunks = np_ // 128
    table_t = jnp.zeros((c, np_), jnp.float32).at[:, :n].set(
        table.astype(jnp.float32).T
    ).reshape(c, n_chunks, 128)
    lo, hi, bounds, mp, rb = _group_bounds(idx, m)
    out = pl.pallas_call(
        _make_kernel(c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rb,),
            in_specs=[
                pl.BlockSpec((_SUBLANES, 128), lambda i, b: (i, 0)),
                pl.BlockSpec((_SUBLANES, 128), lambda i, b: (i, 0)),
                pl.BlockSpec((c, n_chunks, 128), lambda i, b: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((c, _SUBLANES, 128),
                                   lambda i, b: (0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((c, rb * _SUBLANES, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(bounds, lo, hi, table_t)
    return out.reshape(c, mp).T[:m].astype(table.dtype)


def gather_rows(
    table: jax.Array, idx: jax.Array, idx_sorted: bool = False
) -> jax.Array:
    """Backend-dispatching row gather (TPU → Pallas kernel, else XLA).

    `idx_sorted=True` promises non-decreasing indices, which makes the
    kernel's bounded chunk walk O(M/1024 + N/128) — always profitable.
    Without the promise, tables wider than `_CROSSOVER_CHUNKS` chunks
    fall back to XLA's scalar gather (measured crossover — see the
    constant's comment)."""
    if jax.default_backend() == "tpu" and table.ndim == 2:
        n_chunks = -(-table.shape[0] // 128)
        if idx_sorted or n_chunks <= _CROSSOVER_CHUNKS:
            return gather_rows_pallas(table, idx)
    return jnp.take(table, idx, axis=0)
