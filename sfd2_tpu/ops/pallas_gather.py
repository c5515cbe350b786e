"""Pallas row-gather for TPU: out[m] = table[idx[m]] for small-C tables.

XLA lowers `table[idx]` to a scalar gather (~10 µs per 1k rows — the
[51200]←[8192] point-block gather inside every bundle-adjustment CG
iteration costs 1.06 ms, dominating the whole solve). Mosaic's
`tpu.dynamic_gather` is an in-register lane shuffle but only supports
single-vreg (128-lane) tables, so this kernel walks the table in
128-wide chunks per component: lane-local gather + chunk-select on the
high index bits — pure vector ops (measured ~4× faster at C=3, and the
win grows with index count).

Used by `sfm/ba.py` (point/camera block gathers). CPU / non-TPU backends
fall back to `jnp.take` — identical results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(c: int, n_chunks: int, r: int):
    def kernel(lo_ref, hi_ref, table_ref, out_ref):
        lo = lo_ref[...]
        hi = hi_ref[...]
        for ci in range(c):
            acc = jnp.zeros((r, 128), jnp.float32)
            for k in range(n_chunks):
                chunk = table_ref[ci:ci + 1, k * 128:(k + 1) * 128]  # [1,128]
                rep = jnp.broadcast_to(chunk, (r, 128))
                g = jnp.take_along_axis(
                    rep, lo, axis=1, mode="promise_in_bounds"
                )
                acc = jnp.where(hi == k, g, acc)
            out_ref[ci] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(
    table: jax.Array,  # [N, C] float
    idx: jax.Array,  # [M] int32, values in [0, N)
    interpret: bool = False,
) -> jax.Array:  # [M, C], dtype of table
    """out[m] = table[idx[m]] via the two-level chunk gather."""
    n, c = table.shape
    (m,) = idx.shape
    mp = -(-m // 128) * 128  # pad index count to lane rows
    np_ = -(-n // 128) * 128  # pad table rows to whole chunks
    idx_p = jnp.zeros((mp,), jnp.int32).at[:m].set(idx.astype(jnp.int32))
    table_t = jnp.zeros((c, np_), jnp.float32).at[:, :n].set(
        table.astype(jnp.float32).T
    )
    r = mp // 128
    lo = (idx_p & 127).reshape(r, 128)
    hi = jax.lax.shift_right_logical(idx_p, 7).reshape(r, 128)
    out = pl.pallas_call(
        _make_kernel(c, np_ // 128, r),
        out_shape=jax.ShapeDtypeStruct((c, r, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(lo, hi, table_t)
    return out.reshape(c, mp).T[:m].astype(table.dtype)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Backend-dispatching row gather (TPU → Pallas kernel, else XLA)."""
    if jax.default_backend() == "tpu" and table.ndim == 2:
        return gather_rows_pallas(table, idx)
    return jnp.take(table, idx, axis=0)
