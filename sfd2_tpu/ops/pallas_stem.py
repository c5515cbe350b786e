"""Pallas fused s2d stem kernel (TPU) — the encoder entry at MXU rates.

Capability parity: the same stem contract as ops/stem.py (``nets/
sfd2.py:268-272``): conv1a(3→64, 3×3) → bn1a → relu → conv1b(64→64,
3×3, s2) → bn1b → relu, computed on the stride-2 grid via the
space-to-depth repack (see ops/stem.py for the index algebra).

Why a kernel: measured on the v5e (scripts/bench_stem_split.py), the
XLA lowering of the repacked convs runs at ~53 TF/s effective and the
s2d transpose alone costs 0.27 ms/img — together 1.20 ms/img of the
5.8 ms extract. The kernel removes both:

* the host (or caller) supplies the input already packed as C-major
  s2d plane rows [B, Hp, 16, W'] (12 real planes) — same bytes over the wire, zero
  device-side transpose;
* stage A (conv1a, all four phase planes) builds a [144, W'] im2col
  patch per out1a row IN VMEM — rows are (tap, plane) groups written
  as lane-aligned [16, W'] blocks with pltpu.roll for the ±1 column
  taps — and hits the MXU as one [256,144]×[144,W'] GEMM per row;
* stage B (conv1b) consumes stage A's rows straight from VMEM scratch
  (the full-res activation never exists in HBM) as 4 accumulated
  [64,256]×[256,W'] GEMMs (full-width contraction);
* biases + both affine-free BNs are pre-folded (PackedStem), ReLUs and
  the NHWC transpose ride the epilogue.

Layout requirements: W' % 128 == 0, H' % 8 == 0 (callers pad; the
extraction pipeline's bucket padding guarantees it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfd2_tpu.ops.stem import PackedStem

_HB = 8  # out1c rows per grid step (VMEM-bound: a_all is the big buffer)
_PAD_TOP = 2  # x2 plane rows of zero padding above row 0 (halo)
_PAD_BOT = 6  # below row H'-1: block DMA reads [8i, 8i+16)


class StemWeights:
    """Kernel-shaped constants derived from a PackedStem (f32 math).

    dtype note: Mosaic's lane rotate (the conv column taps) only exists
    for 32-bit data, so the kernel computes in f32 throughout — free on
    this TPU generation, where f32 GEMMs already run at bf16 MXU
    precision/rate (XLA --xla_allow_excess_precision); bf16 would only
    have cut VMEM copy traffic."""

    def __init__(self, packed: PackedStem, dtype=jnp.float32):
        w1 = jnp.asarray(packed.w1, jnp.float32)  # [3,3,12,256]
        # w1k[co, 16*(dy*3+dx) + ci] — plane groups padded 12→16 so every
        # patch write lands at a 16-sublane tile boundary (bf16 tiling).
        w1k = jnp.zeros((256, 144), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = dy * 3 + dx
                w1k = w1k.at[:, tap * 16:tap * 16 + 12].set(w1[dy, dx].T)
        w2 = jnp.asarray(packed.w2, jnp.float32)  # [2,2,256,64]
        # Stored [4, 256, 64] (ci-major): stage B contracts the a_all
        # panel's dim 0 against dim 0 — the result comes out [M, 64],
        # already in the NHWC output orientation, so the kernel never
        # transposes data.
        w2k = jnp.stack([w2[t // 2, t % 2] for t in range(4)])  # [4,256,64]
        self.w1k = w1k.astype(dtype)
        self.w2k = w2k.astype(dtype)
        self.b1 = jnp.asarray(packed.b1, jnp.float32).reshape(256, 1)
        self.b2 = jnp.asarray(packed.b2, jnp.float32).reshape(1, 64)


def pack_s2d_plane_rows(x: jax.Array) -> jax.Array:
    """[B, H, W, C(=3)] → [B, Hp, 16, W/2] s2d plane-row layout with the
    kernel's halo padding. Plane (p·2+q)·C + c holds pixel (2y+p, 2x+q, c);
    planes 12-15 are zeros (the plane dim is padded to the 8-sublane DMA
    tiling; the matching w1k rows are zero). Host-side callers should
    build this layout directly in numpy (free next to the upload); this
    jnp version serves tests/bench."""
    b, h, w, c = x.shape
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x2 = jnp.transpose(x2, (0, 1, 2, 4, 5, 3))  # [B,H',p,q,c,W']
    x2 = x2.reshape(b, h // 2, 4 * c, w // 2)
    return jnp.pad(
        x2, ((0, 0), (_PAD_TOP, _PAD_BOT), (0, 16 - 4 * c), (0, 0)))


_GB = 4  # out rows per stage-B GEMM group (8 OOMs scoped VMEM at W'=512)


def _ga(wp: int) -> int:
    """out1a rows per stage-A patch/GEMM (M ≤ ga·W'): the patch ping-pong
    pair + the [256, ga·W'] dot result are the scoped-VMEM hot spots, so
    wider buckets take smaller groups (W'=640 OOMs at ga=5)."""
    return 5 if wp <= 512 else 4


def _roll_seg(v: jax.Array, wseg: int) -> jax.Array:
    """Shift every W'-wide row segment of a multi-row panel one column
    right with zero fill (the dxB=0 / dx=0 conv tap). A plain lane roll
    would leak segment k−1's last column into segment k's column 0, so
    those columns are re-zeroed."""
    r = pltpu.roll(v, shift=1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col % wseg == 0, 0, r)


def _roll_cols(v: jax.Array, dx: int, wseg: int) -> jax.Array:
    """Value at column x+dx−1 (per W'-wide segment) with zero fill."""
    if dx == 0:
        return _roll_seg(v, wseg)
    if dx == 1:
        return v
    wp = v.shape[1]
    r = pltpu.roll(v, shift=wp - 1, axis=1)  # left by one
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col % wseg == wseg - 1, 0, r)


def _stem_kernel(x2_hbm, w1_ref, w2_ref, b1_ref, b2_ref, out_ref,
                 slab2, patch2, a_all, sem2, *, wp: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_b = pl.num_programs(1)
    n_a = _HB + 1  # out1a rows per block (halo row included)

    # Double-buffered input slabs: 16 padded plane-rows [16, 16, W']
    # starting at row 8i (halo [8i, 8i+11) of this block's 9 out1a
    # rows). Block (b, i) computes on slab2[i%2] — prefetched by the
    # PREVIOUS grid step — and prefetches (b, i+1)'s slab into the other
    # buffer before computing, so the DMA rides under the GEMMs.
    slot = jax.lax.rem(i, 2)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _first_fetch():
        pltpu.make_async_copy(
            x2_hbm.at[0, pl.ds(0, 2 * _HB)], slab2.at[0], sem2.at[0]
        ).start()

    # Prefetch the next block's slab (wrapping to the next image); the
    # very last grid step starts no copy (every DMA must be waited).
    nxt = jax.lax.rem(i + 1, n_b)
    nb = jnp.where(i + 1 == n_b, b + 1, b)
    is_last = nb >= pl.num_programs(0)

    @pl.when(jnp.logical_not(is_last))
    def _prefetch():
        pltpu.make_async_copy(
            x2_hbm.at[jnp.minimum(nb, pl.num_programs(0) - 1),
                      pl.ds(nxt * _HB, 2 * _HB)],
            slab2.at[1 - slot], sem2.at[1 - slot],
        ).start()

    pltpu.make_async_copy(
        x2_hbm.at[b, pl.ds(i * _HB, 2 * _HB)], slab2.at[slot],
        sem2.at[slot],
    ).wait()
    slab = slab2.at[slot]

    # Stage A: out1a s2d rows a = 0.._HB (absolute out row _HB·i−1+a),
    # GEMM'd _GA rows at a time — patch column block k holds row g0+k,
    # so one [256,144]×[144,_GA·W'] dot produces _GA rows. Results live
    # side-by-side in a_all [256, (_HB+1)·W'] (row a at lane offset a·W'),
    # which stage B can then slice contiguously. Ping-pong patch buffers
    # let the VPU build group g+1 while the MXU contracts group g.
    ga = _ga(wp)
    groups = [(g0, min(ga, n_a - g0)) for g0 in range(0, n_a, ga)]
    for gi, (g0, g) in enumerate(groups):  # static unroll
        patch = patch2.at[gi % 2]
        for k in range(g):
            for dy in range(3):
                src = slab[g0 + k + dy]  # [16, W'] plane row (12 real)
                for dx in range(3):
                    tap = dy * 3 + dx
                    patch[pl.ds(tap * 16, 16), pl.ds(k * wp, wp)] = (
                        _roll_cols(src, dx, wp))
        acc = jax.lax.dot_general(
            w1_ref[...], patch[:, : g * wp], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [256, g·W']
        a_all[:, pl.ds(g0 * wp, g * wp)] = \
            jnp.maximum(acc + b1_ref[...], 0.0).astype(a_all.dtype)

    # a_all row 0 of the first block is out1a row −1 — conv1b's ZERO
    # padding, not a computed row (bias/BN/relu would make it nonzero).
    @pl.when(i == 0)
    def _zero_top():
        a_all[:, pl.ds(0, wp)] = jnp.zeros((256, wp), a_all.dtype)

    # Stage B: out rows in groups of _GB; out[y'] needs A rows y'−1, y'
    # (dyB ∈ {0,1}) — contiguous [256, _GB·W'] panels of a_all, no
    # copies; column taps dxB ∈ {0,1} → x'+dxB−1 via segment roll. The
    # dots contract panel dim 0 against w2k dim 0, so the result is
    # [_GB·W', 64] — NHWC orientation, no in-kernel transpose.
    for r0 in range(0, _HB, _GB):
        acc = jnp.zeros((_GB * wp, 64), jnp.float32)
        for dyB in range(2):
            panel = a_all[:, pl.ds((r0 + dyB) * wp, _GB * wp)]
            acc += jax.lax.dot_general(
                _roll_seg(panel, wp), w2_ref[dyB * 2],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                panel, w2_ref[dyB * 2 + 1],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        rows = jnp.maximum(acc + b2_ref[...], 0.0)  # [_GB·W', 64]
        out_ref[0, pl.ds(r0, _GB)] = (
            rows.astype(out_ref.dtype).reshape(_GB, wp, 64))


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def fused_stem_pallas(
    x2_rows: jax.Array,
    w1k: jax.Array,
    w2k: jax.Array,
    b1: jax.Array,
    b2: jax.Array,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """x2_rows: [B, Hp, 16, W'] (pack_s2d_plane_rows layout, normalised,
    f32) → out1c [B, H', W', 64] NHWC. W' % 128 == 0, H' % 8 == 0."""
    b, hp, _, wp = x2_rows.shape
    h2 = hp - _PAD_TOP - _PAD_BOT
    assert h2 % _HB == 0 and wp % 128 == 0, (h2, wp)
    grid = (b, h2 // _HB)
    return pl.pallas_call(
        functools.partial(_stem_kernel, wp=wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((256, 144), lambda bb, ii: (0, 0)),
            pl.BlockSpec((4, 256, 64), lambda bb, ii: (0, 0, 0)),
            pl.BlockSpec((256, 1), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, 64), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _HB, wp, 64), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h2, wp, 64), out_dtype),
        # The default scoped-VMEM stack cap is 16 MB; wide buckets
        # (W'=640, the r1600 Aachen config) legitimately need ~18 MB of
        # scratch+stack — raise the cap (physical VMEM is 128 MB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * _HB, 16, wp), x2_rows.dtype),
            pltpu.VMEM((2, 144, _ga(wp) * wp), x2_rows.dtype),
            pltpu.VMEM((256, (_HB + 1) * wp), x2_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2_rows, w1k, w2k, b1, b2)


def stem_pallas_apply(
    x: jax.Array, weights: StemWeights, dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Convenience wrapper from standard NHWC input (tests/bench): packs
    s2d plane rows in-graph, pads W to the kernel's 256-pixel multiple,
    runs the kernel, and crops. Production callers pack on the host.
    `dtype` is the OUTPUT dtype; the kernel computes in f32 (see
    StemWeights)."""
    b, h, w, _ = x.shape
    wpad = (-w) % 256
    if wpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    hpad = (-(h // 2)) % _HB * 2
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    x2 = pack_s2d_plane_rows(x).astype(jnp.float32)
    out = fused_stem_pallas(
        x2, weights.w1k, weights.w2k, weights.b1, weights.b2,
        interpret=interpret, out_dtype=dtype,
    )
    return out[:, : h // 2, : w // 2, :]
