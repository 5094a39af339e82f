"""Fused Pallas kernels for LCNN mid-trunk segments (bf16 attack path).

One segment = conv1x1 + MFM [+ folded BN] + conv3x3 + MFM + 2x2 maxpool
— the shape of LCNN's conv3/conv6+pool and conv10/conv13+pool blocks
(reference src/models/lcnn.py:120-157; BNs sit after MFMs and are
folded into the conv weights by the caller, see models/lcnn.py). On the
XLA schedule these blocks materialize every intermediate in HBM
(~1.3 GB per batch-256 forward for the first segment); fused, the
conv3x3 -> MFM -> pool chain runs in VMEM and only the conv1x1+MFM
activation and the pooled output touch HBM.

Division of labor:

* conv1x1 + MFM stays in XLA (`fused_segment` computes it with plain
  jnp ops): a pointwise matmul+max fuses perfectly there, and autodiff
  through it needs no custom rules.
* conv3x3 + MFM + 2x2 maxpool is the Pallas op (`_conv3_op`), with a
  custom VJP that recomputes in VMEM and routes pool+MFM cotangents by
  eq/count tie-splitting (ties split evenly across the up-to-8
  candidates; torch routes to a single argmax — only exact-tie
  coordinates diverge, same convention as pallas_layer0). dW falls
  back to the XLA reference on training paths; with need_dw=False
  (attack programs differentiate w.r.t. x only) the weight cotangents
  are NaN so accidental consumption fails loudly.

Kernel geometry (shaped by mosaic's 16 MB scoped-VMEM ceiling, which
counts every predicated branch's stack SUMMED — earlier all-planes-in-
one-step and dynamic-slot variants measured 19-31 MB):

* The (t, f) grid splits into FOUR parity planes; the 2x2 pool is then
  an elementwise max of the four conv+MFM plane outputs at identical
  row indices — no strided sublane access anywhere.
* Each plane is stored BORDERED — one ring of zero cells — so the
  conv's SAME zero-padding is part of the layout and the kernel needs
  no edge masks at all. A tap (dt, df) of output plane (p, q) is then
  exactly a row-roll of source plane ((p+dt)%2, (q+df)%2) by
  t_off * (fp+2) + f_off; roll wrap-around only ever lands in border
  rows whose output is discarded.
* Planes are CHUNKED along t' with a one-row halo of overlap so a
  grid step's working set is a ~620-row block: per-step stack is a
  few hundred KB per tap instead of MBs. The backward's halo
  contributions are summed across chunks by the XLA epilogue.
* conv3x3 is an im2col matmul with ZERO FLOP inflation: the
  (rows, 9*c) scratch is built from 9 rolled copies (channels live in
  lanes, so the contraction is exact — the layer-0 Toeplitz
  formulation pays 4.8x lane-width FLOPs).

Numerics: dots in bfloat16 with f32 accumulation (the bf16-trunk fast
path; the f32 parity path keeps the XLA module chain).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = [(dt, df) for dt in (-1, 0, 1) for df in (-1, 0, 1)]


class SegmentSpec(NamedTuple):
    t: int       # input time extent
    f: int       # input freq extent
    c_in: int
    c_mid: int   # conv1x1 output channels (MFM halves to c_mid // 2)
    c_out: int   # conv3x3 output channels (MFM halves to c_out // 2)

    @property
    def tp(self) -> int:  # plane time rows
        return (self.t + 1) // 2

    @property
    def fp(self) -> int:  # plane freq rows
        return (self.f + 1) // 2

    @property
    def c2(self) -> int:  # conv3x3 input channels (post-MFM)
        return self.c_mid // 2

    @property
    def kb(self) -> int:
        return 9 * self.c2

    @property
    def t_out(self) -> int:
        return self.t // 2

    @property
    def f_out(self) -> int:
        return self.f // 2

    # ---- bordered / chunked plane geometry ----

    @property
    def fpb(self) -> int:  # bordered f' cells per t' row
        return self.fp + 2

    @property
    def ct(self) -> int:
        """Interior t'-rows per chunk: the largest value keeping the
        block near ~640 rows with (ct + 2) * fpb a sublane multiple."""
        best = 1
        for ct in range(1, self.tp + 1):
            rows = (ct + 2) * self.fpb
            if rows % 8 == 0 and rows <= 656:
                best = ct
        return best

    @property
    def nc(self) -> int:  # chunks along t'
        return -(-self.tp // self.ct)

    @property
    def rows_c(self) -> int:  # rows per chunk block
        return (self.ct + 2) * self.fpb

    @property
    def tpbp(self) -> int:  # padded bordered t'-rows (chunk coverage)
        return self.ct * self.nc + 2


SEGMENT_A = SegmentSpec(202, 40, 32, 64, 96)    # conv3 / conv6 + pool
SEGMENT_B = SegmentSpec(101, 20, 48, 96, 128)   # conv10 / conv13 + pool


def _src_for(p: int, q: int, dt: int, df: int, fpb: int):
    """(source plane slot, row shift) for tap (dt, df) at plane (p, q)."""
    tt, ff = p + dt, q + df
    pp, qq = tt % 2, ff % 2
    t_off, f_off = (tt - pp) // 2, (ff - qq) // 2
    return pp * 2 + qq, t_off * fpb + f_off


def _roll_rows(x, shift: int):
    if shift == 0:
        return x
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _mfm(y, half: int):
    return jnp.maximum(y[:, :half], y[:, half:2 * half])


def _fwd_kernel(spec: SegmentSpec, refs):
    """Grid (B, NC, 4): one output plane of one chunk per step; the
    pool max-accumulates into the revisited out block."""
    (s0, s1, s2, s3, wb, bb, out, scr) = refs
    srcs = (s0, s1, s2, s3)
    c2 = spec.c2
    k = pl.program_id(2)

    for kk in range(4):
        @pl.when(k == kk)
        def _(kk=kk):
            p, q = kk // 2, kk % 2
            for dt, df in TAPS:
                j = (dt + 1) * 3 + (df + 1)
                src, shift = _src_for(p, q, dt, df, spec.fpb)
                blk = _roll_rows(srcs[src][...], -shift)
                scr[:, c2 * j : c2 * (j + 1)] = blk.astype(jnp.bfloat16)
            y = jnp.dot(
                scr[...], wb[...], preferred_element_type=jnp.float32
            ) + bb[...]
            m = _mfm(y, spec.c_out // 2)
            out[...] = m if kk == 0 else jnp.maximum(out[...], m)


def _bwd_kernel(spec: SegmentSpec, refs):
    """Grid (B, NC): full pool+MFM routing for one chunk (recompute the
    four pre-MFM plane outputs, derive the pooled max and candidate
    counts, scatter each plane's im2col-transposed cotangent into the
    stacked dam output)."""
    (s0, s1, s2, s3, wb, bb, wbt, g, dam, scr) = refs
    srcs = (s0, s1, s2, s3)
    c2 = spec.c2
    half = spec.c_out // 2
    rows = spec.rows_c

    ys = []
    for kk in range(4):
        p, q = kk // 2, kk % 2
        for dt, df in TAPS:
            j = (dt + 1) * 3 + (df + 1)
            src, shift = _src_for(p, q, dt, df, spec.fpb)
            blk = _roll_rows(srcs[src][...], -shift)
            scr[:, c2 * j : c2 * (j + 1)] = blk.astype(jnp.bfloat16)
        ys.append(jnp.dot(
            scr[...], wb[...], preferred_element_type=jnp.float32
        ) + bb[...])

    pool = _mfm(ys[0], half)
    for kk in range(1, 4):
        pool = jnp.maximum(pool, _mfm(ys[kk], half))
    cnt = jnp.zeros_like(pool)
    for kk in range(4):
        cnt = cnt + (ys[kk][:, :half] == pool) + (ys[kk][:, half:] == pool)
    inv = g[...] / jnp.maximum(cnt, 1.0)

    dam[...] = jnp.zeros_like(dam)
    for kk in range(4):
        p, q = kk // 2, kk % 2
        y = ys[kk]
        dy = jnp.concatenate(
            [
                jnp.where(y[:, :half] == pool, inv, 0.0),
                jnp.where(y[:, half:] == pool, inv, 0.0),
            ],
            axis=1,
        ).astype(jnp.bfloat16)
        dscr = jnp.dot(dy, wbt[...], preferred_element_type=jnp.float32)
        for dt, df in TAPS:
            j = (dt + 1) * 3 + (df + 1)
            src, shift = _src_for(p, q, dt, df, spec.fpb)
            contrib = _roll_rows(dscr[:, c2 * j : c2 * (j + 1)], shift)
            dam[src * rows : (src + 1) * rows, :] = (
                dam[src * rows : (src + 1) * rows, :] + contrib
            )


# ---------------------------------------------------------------------------
# Host-side plumbing (XLA pack/unpack)
# ---------------------------------------------------------------------------


def _parity_extents(spec: SegmentSpec):
    """(t'-count, f'-count) per parity (p, q)."""
    return [
        ((spec.t - p + 1) // 2, (spec.f - q + 1) // 2)
        for p in range(2) for q in range(2)
    ]


def _pack_planes(am: jax.Array, spec: SegmentSpec):
    """(B, T, F, c2) f32 -> bordered chunked planes
    (B * NC * 4 * rows_c, c2) f32, order (sample, chunk, plane, row).

    Border cells are zero (the conv's SAME padding); consecutive
    chunks overlap by the two halo rows.
    """
    b = am.shape[0]
    full = jnp.zeros((b, 4, spec.tpbp, spec.fpb, spec.c2), am.dtype)
    for s, (p, q) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        tpq, fpq = _parity_extents(spec)[s]
        full = full.at[:, s, 1 : 1 + tpq, 1 : 1 + fpq, :].set(
            am[:, p::2, q::2, :]
        )
    chunks = jnp.stack(
        [
            full[:, :, spec.ct * c : spec.ct * c + spec.ct + 2]
            for c in range(spec.nc)
        ],
        axis=1,
    )  # (B, NC, 4, ct+2, fpb, c2)
    return chunks.reshape(b * spec.nc * 4 * spec.rows_c, spec.c2)


def _unpack_out(out: jax.Array, spec: SegmentSpec, b: int):
    """(B * NC * rows_c, half) -> (B, t_out, f_out, half)."""
    half = spec.c_out // 2
    o = out.reshape(b, spec.nc, spec.ct + 2, spec.fpb, half)
    o = o[:, :, 1 : 1 + spec.ct, 1 : 1 + spec.fp, :]
    o = o.reshape(b, spec.nc * spec.ct, spec.fp, half)
    return o[:, : spec.t_out, : spec.f_out]


def _pack_g(g: jax.Array, spec: SegmentSpec, b: int):
    """(B, t_out, f_out, half) -> zero-bordered chunk layout
    (B * NC * rows_c, half); halo rows zero (each output row's
    gradient belongs to exactly one chunk)."""
    half = spec.c_out // 2
    gt = jnp.zeros((b, spec.nc * spec.ct, spec.fp, half), jnp.float32)
    gt = gt.at[:, : spec.t_out, : spec.f_out].set(g.astype(jnp.float32))
    gt = gt.reshape(b, spec.nc, spec.ct, spec.fp, half)
    gfull = jnp.zeros(
        (b, spec.nc, spec.ct + 2, spec.fpb, half), jnp.float32
    )
    gfull = gfull.at[:, :, 1 : 1 + spec.ct, 1 : 1 + spec.fp].set(gt)
    return gfull.reshape(b * spec.nc * spec.rows_c, half)


def _merge_dam(dam: jax.Array, spec: SegmentSpec, b: int):
    """Stacked chunk cotangents -> (B, T, F, c2): halo rows add into
    the neighboring chunk's interior; border cells are padding grad
    and are dropped."""
    d = dam.reshape(b, spec.nc, 4, spec.ct + 2, spec.fpb, spec.c2)
    full = jnp.zeros((b, 4, spec.tpbp, spec.fpb, spec.c2), jnp.float32)
    for c in range(spec.nc):
        full = full.at[:, :, spec.ct * c : spec.ct * c + spec.ct + 2].add(
            d[:, c]
        )
    out = jnp.zeros((b, spec.t, spec.f, spec.c2), jnp.float32)
    for s, (p, q) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        tpq, fpq = _parity_extents(spec)[s]
        out = out.at[:, p::2, q::2, :].set(
            full[:, s, 1 : 1 + tpq, 1 : 1 + fpq, :]
        )
    return out


def _pack_wb(wb, bb):
    """(3, 3, c2, c_out) HWIO -> (9 * c2, c_out) bf16 (tap-major rows)
    + f32 bias row."""
    kh, kw, c2, c_out = wb.shape
    return (
        wb.reshape(kh * kw * c2, c_out).astype(jnp.bfloat16),
        bb.reshape(1, -1).astype(jnp.float32),
    )


def _fwd_call(spec: SegmentSpec, planes, wb2, bb2, interpret):
    b = planes.shape[0] // (spec.nc * 4 * spec.rows_c)
    half = spec.c_out // 2
    rows = spec.rows_c
    cspec = lambda shape: pl.BlockSpec(
        shape, lambda i, c, k, _n=len(shape): (0,) * _n,
        memory_space=pltpu.VMEM,
    )
    src_spec = lambda s: pl.BlockSpec(
        (rows, spec.c2),
        lambda i, c, k, s=s: (i * spec.nc * 4 + c * 4 + s, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        lambda *refs: _fwd_kernel(spec, refs),
        out_shape=jax.ShapeDtypeStruct(
            (b * spec.nc * rows, half), jnp.float32
        ),
        grid=(b, spec.nc, 4),
        in_specs=[
            src_spec(0), src_spec(1), src_spec(2), src_spec(3),
            cspec(wb2.shape),
            cspec(bb2.shape),
        ],
        out_specs=pl.BlockSpec(
            (rows, half), lambda i, c, k: (i * spec.nc + c, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((rows, spec.kb), jnp.bfloat16)],
        interpret=interpret,
    )(planes, planes, planes, planes, wb2, bb2)
    return out


def _bwd_call(spec: SegmentSpec, planes, wb2, bb2, g, interpret):
    b = planes.shape[0] // (spec.nc * 4 * spec.rows_c)
    half = spec.c_out // 2
    rows = spec.rows_c
    cspec = lambda shape: pl.BlockSpec(
        shape, lambda i, c, _n=len(shape): (0,) * _n,
        memory_space=pltpu.VMEM,
    )
    src_spec = lambda s: pl.BlockSpec(
        (rows, spec.c2),
        lambda i, c, s=s: (i * spec.nc * 4 + c * 4 + s, 0),
        memory_space=pltpu.VMEM,
    )
    dam = pl.pallas_call(
        lambda *refs: _bwd_kernel(spec, refs),
        out_shape=jax.ShapeDtypeStruct(
            (b * spec.nc * 4 * rows, spec.c2), jnp.float32
        ),
        grid=(b, spec.nc),
        in_specs=[
            src_spec(0), src_spec(1), src_spec(2), src_spec(3),
            cspec(wb2.shape),
            cspec(bb2.shape),
            cspec((wb2.shape[1], wb2.shape[0])),
            pl.BlockSpec((rows, half), lambda i, c: (i * spec.nc + c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * rows, spec.c2), lambda i, c: (i * spec.nc + c, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((rows, spec.kb), jnp.bfloat16)],
        interpret=interpret,
    )(planes, planes, planes, planes, wb2, bb2, wb2.T, g)
    return dam


def _pool_reference_xla(am, wb, bb):
    """XLA reference for the Pallas op: conv3x3 SAME + MFM + floor 2x2
    maxpool (dW path + test oracle)."""
    y = jax.lax.conv_general_dilated(
        am, wb, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bb
    a, b_ = jnp.split(y, 2, axis=-1)
    y = jnp.maximum(a, b_)
    bsz, t, f, c = y.shape
    y = y[:, : t // 2 * 2, : f // 2 * 2]
    y = y.reshape(bsz, t // 2, 2, f // 2, 2, c)
    return y.max(axis=(2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _conv3_op(am, wb, bb, spec: SegmentSpec, interpret: bool,
              need_dw: bool):
    """(B, T, F, c2) f32 -> (B, T//2, F//2, c_out//2): the fused
    conv3x3 + MFM + maxpool2x2 Pallas op."""
    planes = _pack_planes(am.astype(jnp.float32), spec)
    wb2, bb2 = _pack_wb(wb, bb)
    out = _fwd_call(spec, planes, wb2, bb2, interpret)
    return _unpack_out(out, spec, am.shape[0]).astype(am.dtype)


def _conv3_fwd(am, wb, bb, spec, interpret, need_dw):
    return _conv3_op(am, wb, bb, spec, interpret, need_dw), (am, wb, bb)


def _conv3_bwd(spec, interpret, need_dw, res, g):
    am, wb, bb = res
    b = am.shape[0]
    planes = _pack_planes(am.astype(jnp.float32), spec)
    wb2, bb2 = _pack_wb(wb, bb)
    gp = _pack_g(g, spec, b)
    dam = _bwd_call(spec, planes, wb2, bb2, gp, interpret)
    d_am = _merge_dam(dam, spec, b).astype(am.dtype)
    if not need_dw:
        # attack paths differentiate w.r.t. x only; NaN fails loudly if
        # a weight cotangent is accidentally consumed
        return d_am, jnp.full_like(wb, jnp.nan), jnp.full_like(bb, jnp.nan)
    _, vjp = jax.vjp(
        lambda ww, bb_: _pool_reference_xla(
            am.astype(jnp.bfloat16), ww, bb_
        ),
        wb.astype(jnp.bfloat16), bb.astype(jnp.bfloat16),
    )
    dwb, dbb = vjp(g.astype(jnp.bfloat16))
    return d_am, dwb.astype(wb.dtype), dbb.astype(bb.dtype)


_conv3_op.defvjp(_conv3_fwd, _conv3_bwd)


# ---------------------------------------------------------------------------
# Public segment entry
# ---------------------------------------------------------------------------


def fused_segment(x, wa, ba, wb, bb, spec: SegmentSpec,
                  interpret: bool = False, need_dw: bool = True):
    """(B, T, F, c_in) -> (B, T//2, F//2, c_out//2).

    Equals conv1x1+MFM / conv3x3(SAME)+MFM / maxpool2x2 with bf16 dots
    and f32 accumulation. conv1x1+MFM runs as plain jnp (XLA fuses it;
    autodiff handles its backward); the conv3x3 chain is the Pallas op.
    """
    wa2 = wa.reshape(wa.shape[-2], wa.shape[-1])
    acc = jnp.einsum(
        "btfc,cn->btfn", x.astype(jnp.bfloat16),
        wa2.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + ba.astype(jnp.float32)
    am = jnp.maximum(
        acc[..., : spec.c2], acc[..., spec.c2 :]
    )
    return _conv3_op(am, wb, bb, spec, interpret, need_dw).astype(x.dtype)


def _reference_xla(x, wa, ba, wb, bb):
    """Full-segment XLA reference (test oracle): conv1x1+MFM,
    conv3x3 SAME +MFM, floor 2x2 maxpool."""
    y = jax.lax.conv_general_dilated(
        x, wa, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + ba
    a, b_ = jnp.split(y, 2, axis=-1)
    y = jnp.maximum(a, b_)
    return _pool_reference_xla(y, wb, bb)
