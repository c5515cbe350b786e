"""Pallas fused mutual-NN matching kernel (TPU).

Capability parity: ``it_loc/matcher.py:122`` (mutual_nn_matcher), same
contract as ``sfd2_tpu.ops.matching.mutual_nn_match``.

Why a kernel: the XLA path materialises the [K, K] similarity matrix in
HBM (64 MB at K=4096 fp32) before reducing it — matching one query
against 50 DB frames moves >6 GB through HBM. This kernel tiles
D1·D2ᵀ on the MXU and keeps *running* row/col max+argmax accumulators in
VMEM, so HBM traffic is just the descriptors (2×2 MB) and four [K]
output vectors: a ~500× reduction in bytes for the reduction stage.

Grid is (B, I, J) with J innermost:
  * row accumulators (BM rows of the current I-stripe) reset at J==0 and
    flush at J==last;
  * column accumulators persist in a full-[N2] VMEM scratch across the
    I-loop (reset at I==0, flushed into the (B, J)-blocked output at
    I==last — later grid visits overwrite earlier garbage flushes).
Validity is folded in as additive −1e9 biases, matching the XLA path's
masking semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _sim_dtype(d: jax.Array) -> jax.Array:
    """Kernel input dtype: bf16 descriptors stay bf16 (full MXU rate,
    half the HBM traffic; accumulation is f32 either way via
    preferred_element_type), anything else is computed in f32 so the
    exact-vs-XLA equivalence contract holds for f32 callers."""
    return d if d.dtype == jnp.bfloat16 else d.astype(jnp.float32)


def _kernel(
    d1_ref, d2_ref, bias1_ref, bias2_ref,
    rmax_out, ridx_out, cmax_out, cidx_out,
    rmax_s, ridx_s, cmax_s, cidx_s,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)

    bm = d1_ref.shape[1]
    bn = d2_ref.shape[1]

    d1 = d1_ref[0]  # [BM, C]
    d2 = d2_ref[0]  # [BN, C]
    s = jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BM, BN]

    col_bias = bias2_ref[0, 0]  # [BN] — −1e9 on invalid DB rows
    row_bias = bias1_ref[0, 0]  # [BM]

    # ---- row (query-side) running max/argmax over all J ---------------
    s_row = s + col_bias[None, :]
    bmax = jnp.max(s_row, axis=1)  # [BM]
    bidx = jnp.argmax(s_row, axis=1).astype(jnp.int32) + j * bn

    @pl.when(j == 0)
    def _():
        rmax_s[0, :] = jnp.full((bm,), _NEG * 2.0, jnp.float32)
        ridx_s[0, :] = jnp.zeros((bm,), jnp.int32)

    better = bmax > rmax_s[0, :]
    rmax_s[0, :] = jnp.where(better, bmax, rmax_s[0, :])
    ridx_s[0, :] = jnp.where(better, bidx, ridx_s[0, :])

    @pl.when(j == n_j - 1)
    def _():
        rmax_out[0, 0, :] = rmax_s[0, :]
        ridx_out[0, 0, :] = ridx_s[0, :]

    # ---- column (DB-side) running max/argmax over all I ----------------
    s_col = s + row_bias[:, None]
    cmax = jnp.max(s_col, axis=0)  # [BN]
    cidx = jnp.argmax(s_col, axis=0).astype(jnp.int32) + i * bm

    @pl.when(i == 0)
    def _():
        cmax_s[0, pl.ds(j * bn, bn)] = jnp.full((bn,), _NEG * 2.0, jnp.float32)
        cidx_s[0, pl.ds(j * bn, bn)] = jnp.zeros((bn,), jnp.int32)

    cur_max = cmax_s[0, pl.ds(j * bn, bn)]
    cur_idx = cidx_s[0, pl.ds(j * bn, bn)]
    cbetter = cmax > cur_max
    cmax_s[0, pl.ds(j * bn, bn)] = jnp.where(cbetter, cmax, cur_max)
    cidx_s[0, pl.ds(j * bn, bn)] = jnp.where(cbetter, cidx, cur_idx)

    @pl.when(i == n_i - 1)
    def _():
        cmax_out[0, 0, :] = cmax_s[0, pl.ds(j * bn, bn)]
        cidx_out[0, 0, :] = cidx_s[0, pl.ds(j * bn, bn)]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def nn_argmax_pallas(
    desc0: jax.Array,  # [B, N1, C]
    desc1: jax.Array,  # [B, N2, C]
    valid0: jax.Array,  # [B, N1] bool
    valid1: jax.Array,  # [B, N2] bool
    block_m: int = 1024,
    block_n: int = 1024,
    interpret: bool = False,
):
    """Fused bidirectional NN: (max12, nn12, max21, nn21)."""
    b, n1, c = desc0.shape
    n2 = desc1.shape[1]
    assert n1 % block_m == 0 and n2 % block_n == 0, (n1, n2, block_m, block_n)

    # Biases and outputs carry a singleton middle dim so every BlockSpec's
    # trailing two dims are (1, block) with 1 == the array dim (TPU
    # lowering constraint on tile shapes).
    bias0 = jnp.where(valid0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    bias1 = jnp.where(valid1, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    grid = (b, n1 // block_m, n2 // block_n)
    out_shapes = (
        jax.ShapeDtypeStruct((b, 1, n1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, n2), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n2), jnp.int32),
    )
    flops = 2 * b * n1 * n2 * c
    rmax, ridx, cmax, cidx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_n, c), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_m), lambda b_, i, j: (b_, 0, i)),
            pl.BlockSpec((1, 1, block_n), lambda b_, i, j: (b_, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_m), lambda b_, i, j: (b_, 0, i)),
            pl.BlockSpec((1, 1, block_m), lambda b_, i, j: (b_, 0, i)),
            pl.BlockSpec((1, 1, block_n), lambda b_, i, j: (b_, 0, j)),
            pl.BlockSpec((1, 1, block_n), lambda b_, i, j: (b_, 0, j)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, block_m), jnp.float32),
            pltpu.VMEM((1, block_m), jnp.int32),
            pltpu.VMEM((1, n2), jnp.float32),
            pltpu.VMEM((1, n2), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * (n1 * c + n2 * c + 2 * n1 + 2 * n2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(_sim_dtype(desc0), _sim_dtype(desc1), bias0, bias1)
    return rmax[:, 0], ridx[:, 0], cmax[:, 0], cidx[:, 0]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def mutual_nn_match_pallas(
    desc0: jax.Array,
    desc1: jax.Array,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
    block_m: int = 1024,
    block_n: int = 1024,
    interpret: bool = False,
):
    """Batched mutual-NN with the −1-sentinel contract of
    `mutual_nn_match_batch`, on the fused kernel."""
    b, n1, _ = desc0.shape
    n2 = desc1.shape[1]
    if valid0 is None:
        valid0 = jnp.ones((b, n1), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, n2), bool)
    rmax, nn12, _, nn21 = nn_argmax_pallas(
        desc0, desc1, valid0, valid1, block_m, block_n, interpret
    )
    ids = jnp.arange(n1, dtype=nn12.dtype)[None, :]
    back = jnp.take_along_axis(nn21, nn12, axis=1)
    ok = (ids == back) & (rmax > _NEG / 2) & valid0
    matches0 = jnp.where(ok, nn12, -1).astype(jnp.int32)
    scores0 = jnp.where(rmax > _NEG / 2, rmax, 0.0)
    return matches0, scores0


# ---------------------------------------------------------------------------
# Top-2 variant (ratio-test support, reference NNR conf)
# ---------------------------------------------------------------------------


def _kernel_top2(
    d1_ref, d2_ref, bias1_ref, bias2_ref,
    rmax_out, ridx_out, rmax2_out, cmax_out, cidx_out, cmax2_out,
    rmax_s, ridx_s, rmax2_s, cmax_s, cidx_s, cmax2_s,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)
    bm = d1_ref.shape[1]
    bn = d2_ref.shape[1]

    s = jax.lax.dot_general(
        d1_ref[0], d2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_bias = bias2_ref[0, 0]
    row_bias = bias1_ref[0, 0]

    def block_top2(sm, axis):
        """(max, argmax, 2nd-max) along `axis`, exact (argmax masked)."""
        m1 = jnp.max(sm, axis=axis)
        a1 = jnp.argmax(sm, axis=axis).astype(jnp.int32)
        n = sm.shape[axis]
        ids = jax.lax.broadcasted_iota(jnp.int32, sm.shape, axis)
        a1b = jnp.expand_dims(a1, axis)
        masked = jnp.where(ids == a1b, _NEG * 2.0, sm)
        m2 = jnp.max(masked, axis=axis)
        return m1, a1, m2

    # Rows.
    s_row = s + col_bias[None, :]
    b1, ba, b2 = block_top2(s_row, 1)
    ba = ba + j * bn

    @pl.when(j == 0)
    def _():
        rmax_s[0, :] = jnp.full((bm,), _NEG * 2.0, jnp.float32)
        rmax2_s[0, :] = jnp.full((bm,), _NEG * 2.0, jnp.float32)
        ridx_s[0, :] = jnp.zeros((bm,), jnp.int32)

    r1 = rmax_s[0, :]
    r2 = rmax2_s[0, :]
    new_r1 = jnp.maximum(r1, b1)
    new_r2 = jnp.maximum(jnp.minimum(r1, b1), jnp.maximum(r2, b2))
    take = b1 > r1
    rmax_s[0, :] = new_r1
    rmax2_s[0, :] = new_r2
    ridx_s[0, :] = jnp.where(take, ba, ridx_s[0, :])

    @pl.when(j == n_j - 1)
    def _():
        rmax_out[0, 0, :] = rmax_s[0, :]
        rmax2_out[0, 0, :] = rmax2_s[0, :]
        ridx_out[0, 0, :] = ridx_s[0, :]

    # Columns.
    s_col = s + row_bias[:, None]
    c1, ca, c2 = block_top2(s_col, 0)
    ca = ca + i * bm

    @pl.when(i == 0)
    def _():
        cmax_s[0, pl.ds(j * bn, bn)] = jnp.full((bn,), _NEG * 2.0, jnp.float32)
        cmax2_s[0, pl.ds(j * bn, bn)] = jnp.full((bn,), _NEG * 2.0, jnp.float32)
        cidx_s[0, pl.ds(j * bn, bn)] = jnp.zeros((bn,), jnp.int32)

    q1 = cmax_s[0, pl.ds(j * bn, bn)]
    q2 = cmax2_s[0, pl.ds(j * bn, bn)]
    new_q1 = jnp.maximum(q1, c1)
    new_q2 = jnp.maximum(jnp.minimum(q1, c1), jnp.maximum(q2, c2))
    ctake = c1 > q1
    cmax_s[0, pl.ds(j * bn, bn)] = new_q1
    cmax2_s[0, pl.ds(j * bn, bn)] = new_q2
    cidx_s[0, pl.ds(j * bn, bn)] = jnp.where(ctake, ca, cidx_s[0, pl.ds(j * bn, bn)])

    @pl.when(i == n_i - 1)
    def _():
        cmax_out[0, 0, :] = cmax_s[0, pl.ds(j * bn, bn)]
        cmax2_out[0, 0, :] = cmax2_s[0, pl.ds(j * bn, bn)]
        cidx_out[0, 0, :] = cidx_s[0, pl.ds(j * bn, bn)]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def nn_top2_pallas(
    desc0: jax.Array,
    desc1: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    block_m: int = 1024,
    block_n: int = 1024,
    interpret: bool = False,
):
    """Fused bidirectional top-2 NN:
    (max12, nn12, max12_2nd, max21, nn21, max21_2nd)."""
    b, n1, c = desc0.shape
    n2 = desc1.shape[1]
    assert n1 % block_m == 0 and n2 % block_n == 0

    bias0 = jnp.where(valid0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    bias1 = jnp.where(valid1, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    grid = (b, n1 // block_m, n2 // block_n)
    out_shapes = (
        jax.ShapeDtypeStruct((b, 1, n1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, n1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n2), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n2), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, n2), jnp.float32),
    )
    row_spec = pl.BlockSpec((1, 1, block_m), lambda b_, i, j: (b_, 0, i))
    col_spec = pl.BlockSpec((1, 1, block_n), lambda b_, i, j: (b_, 0, j))
    outs = pl.pallas_call(
        _kernel_top2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_n, c), lambda b_, i, j: (b_, j, 0)),
            row_spec,
            col_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, col_spec, col_spec, col_spec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, block_m), jnp.float32),
            pltpu.VMEM((1, block_m), jnp.int32),
            pltpu.VMEM((1, block_m), jnp.float32),
            pltpu.VMEM((1, n2), jnp.float32),
            pltpu.VMEM((1, n2), jnp.int32),
            pltpu.VMEM((1, n2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n1 * n2 * c,
            bytes_accessed=4 * b * (n1 * c + n2 * c + 3 * n1 + 3 * n2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(_sim_dtype(desc0), _sim_dtype(desc1), bias0, bias1)
    return tuple(o[:, 0] for o in outs)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def mutual_nn_ratio_match_pallas(
    desc0: jax.Array,
    desc1: jax.Array,
    ratio: float | jax.Array = 0.9,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
    block_m: int = 1024,
    block_n: int = 1024,
    interpret: bool = False,
):
    """NNR conf on the fused top-2 kernel: mutual NN + symmetric Lowe
    ratio on unit-descriptor L2 distances (same contract as
    `mutual_nn_ratio_match`)."""
    b, n1, _ = desc0.shape
    n2 = desc1.shape[1]
    if valid0 is None:
        valid0 = jnp.ones((b, n1), bool)
    if valid1 is None:
        valid1 = jnp.ones((b, n2), bool)
    m1, nn12, m1b, c1, nn21, c1b = nn_top2_pallas(
        desc0, desc1, valid0, valid1, block_m, block_n, interpret
    )

    def dist(v):
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * v, 0.0))

    ratios12 = dist(m1) / (dist(m1b) + 1e-8)
    ratios21 = dist(c1) / (dist(c1b) + 1e-8)
    ids = jnp.arange(n1, dtype=nn12.dtype)[None, :]
    back = jnp.take_along_axis(nn21, nn12, axis=1)
    r21_at = jnp.take_along_axis(ratios21, nn12, axis=1)
    ok = (
        (ids == back)
        & (ratios12 <= ratio)
        & (r21_at <= ratio)
        & (m1 > _NEG / 2)
        & valid0
    )
    matches0 = jnp.where(ok, nn12, -1).astype(jnp.int32)
    scores0 = jnp.where(m1 > _NEG / 2, m1, 0.0)
    return matches0, scores0
