"""Fused Pallas kernel for RawNet3's eval-mode Bottle2neck blocks.

Why: the three Res2Net blocks dominate the rawnet3 attack path — layer1
alone is ~65% of a PGD step (51.5 of ~79 ms fwd+bwd at batch 64,
scripts/profiling/profile_rawnet_r4.json) while its matmuls only need
~16 ms of MXU at peak: the XLA schedule round-trips every intermediate
of the conv1 -> 7-scale-conv chain -> concat -> conv3 -> residual-add
pipeline through HBM at (B, 6435, 1024) scale (~843 MB per tensor at
batch 64). This kernel runs the whole block body per (sample,
time-tile) grid step inside VMEM and writes only the block output and
one epilogue-mask plane.

Measured outcome (v5e, r4, BENCH_ATTACKS.json): a NEGATIVE result —
rawnet3:PGD+b2n 64.8 ex/s vs 82.8 for the default XLA path, with
identical attack effectiveness (BENCH_EFFECTIVENESS.json
rawnet3:bf16_fused_b2n, logit shift within 1% of f32). The halo
re-materialisation per time-tile plus the recompute-in-backward costs
more than the HBM round-trips it saves, so the kernel stays opt-in
(ADAA_FUSED_B2N=1), kept as real, tested evidence of the experiment.

Reference behavior (Bottle2neck lineage): src/models/rawnet3.py:185-274
(conv1x1 -> BN/relu -> res2net dilated conv chain -> concat -> conv1x1
-> BN/relu -> +residual -> maxpool -> AFMS). Eval mode only (BNs are
folded affines); the flax path (models/rawnet3.py) remains the train /
f32-parity implementation.

Design (mosaic-safe by construction: 2-D refs, 16-aligned sublane
slices, 128-aligned lane slices, f32-only sublane rolls):

* Time is tiled at Tt=480 rows with an Hpad halo on each side
  (Hpad >= 2*7*dilation: the recompute-in-backward needs forward
  validity creep H plus cotangent spread H). Halos are supplied as a
  separate pre-gathered strip array (B*nt, 2*Hpad, C) so every kernel
  input uses a standard non-overlapping BlockSpec (automatic double
  buffering, no manual DMA); the region is assembled in a VMEM scratch.
* The dilated k=3 convs are three shifted (R,128)x(128,128) MXU dots;
  shifts are circular `pltpu.roll`s on the f32 chain values (mosaic
  rolls are 32-bit only) whose wrap garbage stays inside the halo.
* Array-boundary semantics: every conv input is masked to zero outside
  [0, T) (broadcasted-iota row positions), reproducing the zero padding
  the true convs apply at the sequence edges — halo rows of edge tiles
  otherwise hold f(0) != 0, not 0.
* The non-overlapping 1-D max pool (window p | Tt) and AFMS stay in
  XLA: pool fwd is one cheap reshape-max; pool backward is folded into
  the VJP as an elementwise equality route against the saved pooled
  output (exact in bf16; ties double-route where torch picks one
  winner — measure-zero coordinates, same class of deviation as
  ops/pallas_layer0.py's tie handling).
* Backward (dx only): recomputes conv1 + the scale chain from x inside
  VMEM (their relu/BN masks are cheaper to recompute than to save:
  ~0.7 GFLOP/tile vs ~2 GB of mask planes per direction), but NOT
  conv3 — its mask comes from the saved block-body output ``o`` (one
  bf16 plane, mask = o != folded-bn3 bias). Then one (R,1024)x
  (1024,1024) dot against W3^T, the 7-level transposed-conv descent,
  and two (R,1024)x(1024,Cin) dots for conv1^T / residual^T.
  Parameter cotangents are NaN-poisoned (attack/eval paths only — the
  same need_dw contract as ops/pallas_layer0.py / ops/sinc_conv.py).

Numerics: all matmuls are bf16 with f32 accumulation; the inter-conv
chain stays f32 inside the tile (strictly tighter than the XLA bf16
path it replaces).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PLANES = 1024
SCALE = 8
WIDTH = PLANES // SCALE  # 128
NUMS = SCALE - 1  # 7
TT = 480  # time rows per tile: 16-aligned, divisible by pools 3 and 5


def _hpad(dilation: int) -> int:
    """Halo: >= 2 * NUMS * dilation, 16-aligned (bf16 sublane tiles)."""
    need = 2 * NUMS * dilation
    return -(-need // 16) * 16


def _roll(x, shift: int):
    """Sublane roll, jnp.roll sign semantics (f32 only on mosaic)."""
    if shift % x.shape[0] == 0:
        return x
    return pltpu.roll(x, shift % x.shape[0], axis=0)


class B2NParams(NamedTuple):
    """Folded eval-mode parameters (BNs as y = relu(z)*s + t affines)."""

    w1: jax.Array    # (Cin, 1024) bf16
    b1: jax.Array    # (1, 1024) f32
    s1: jax.Array    # (1, 1024) f32
    t1: jax.Array    # (1, 1024) f32
    wc: jax.Array    # (21*128, 128) bf16 — rows [(i*3+s)*128, +128) = tap s of conv i
    bc: jax.Array    # (1, 896) f32 — lanes [i*128, +128) = conv i
    sc: jax.Array    # (1, 896) f32
    tc: jax.Array    # (1, 896) f32
    w3: jax.Array    # (1024, 1024) bf16
    b3: jax.Array    # (1, 1024) f32
    s3: jax.Array    # (1, 1024) f32
    t3: jax.Array    # (1, 1024) f32
    wr: Optional[jax.Array]  # (Cin, 1024) bf16, None = identity residual


def _halo_blocks(a: jax.Array, hpad: int, nt: int):
    """(B, T, C) -> main (B*nt*TT, C) + halo strips (B*nt*2*hpad, C).

    Strip block i holds the hpad rows before and after tile i's center,
    zero-padded outside [0, T).
    """
    b, t, c = a.shape
    tpad = nt * TT
    ap = jnp.pad(a, ((0, 0), (hpad, tpad - t + hpad), (0, 0)))
    main = ap[:, hpad : hpad + tpad].reshape(b * nt * TT, c)
    strips = jnp.stack(
        [
            jnp.concatenate(
                [ap[:, i * TT : i * TT + hpad],
                 ap[:, hpad + (i + 1) * TT : 2 * hpad + (i + 1) * TT]],
                axis=1,
            )
            for i in range(nt)
        ],
        axis=1,
    )  # (B, nt, 2*hpad, C)
    return main, strips.reshape(b * nt * 2 * hpad, c)


def _assemble(xw, main_ref, strip_ref, hpad: int):
    """Region scratch = [left halo, center, right halo] (16-aligned)."""
    tt = main_ref.shape[0]
    xw[0:hpad, :] = strip_ref[0:hpad, :]
    xw[hpad : hpad + tt, :] = main_ref[...]
    xw[hpad + tt : 2 * hpad + tt, :] = strip_ref[hpad : 2 * hpad, :]


def _inbounds(r: int, hpad: int, t_total: int, nt: int):
    """(R, 1) bool — region rows that map inside [0, T)."""
    t_idx = pl.program_id(0) % nt
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        + t_idx * TT
        - hpad
    )
    return (pos >= 0) & (pos < t_total)


def _chain_fwd(h, wc_ref, bc_ref, sc_ref, tc_ref, inb, d: int, cat=None):
    """Run the 7-conv res2net chain on the f32 region ``h``.

    Returns the list of f32 sp planes; if ``cat`` scratch is given, also
    stores their bf16 casts (the conv3 input layout).
    """
    sps = []
    sp = None
    for i in range(NUMS):
        sl = slice(WIDTH * i, WIDTH * (i + 1))
        spin = h[:, sl] if i == 0 else sp + h[:, sl]
        spin = jnp.where(inb, spin, 0.0)
        zi = bc_ref[:, sl].astype(jnp.float32)
        for s in range(3):
            shifted = _roll(spin, -(s - 1) * d).astype(jnp.bfloat16)
            w = wc_ref[(i * 3 + s) * WIDTH : (i * 3 + s + 1) * WIDTH, :]
            zi = zi + jnp.dot(shifted, w,
                              preferred_element_type=jnp.float32)
        sp = jnp.maximum(zi, 0.0) * sc_ref[:, sl] + tc_ref[:, sl]
        sps.append(sp)
        if cat is not None:
            cat[:, sl] = sp.astype(jnp.bfloat16)
    return sps


def _fwd_kernel(
    main_ref, strip_ref,
    w1_ref, b1_ref, s1_ref, t1_ref,
    wc_ref, bc_ref, sc_ref, tc_ref,
    w3_ref, b3_ref, s3_ref, t3_ref,
    *rest,
    d: int, t_total: int, hpad: int, nt: int, has_r: bool,
):
    if has_r:
        wr_ref, y_ref, o_ref, xw, cat = rest
    else:
        y_ref, o_ref, xw, cat = rest
    r = TT + 2 * hpad
    _assemble(xw, main_ref, strip_ref, hpad)
    inb = _inbounds(r, hpad, t_total, nt)
    xb = xw[...]
    z = jnp.dot(xb, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(z + b1_ref[...], 0.0) * s1_ref[...] + t1_ref[...]
    _chain_fwd(h, wc_ref, bc_ref, sc_ref, tc_ref, inb, d, cat=cat)
    cat[:, WIDTH * NUMS :] = h[:, WIDTH * NUMS :].astype(jnp.bfloat16)
    z3 = jnp.dot(cat[...], w3_ref[...],
                 preferred_element_type=jnp.float32)
    o = jnp.maximum(z3 + b3_ref[...], 0.0) * s3_ref[...] + t3_ref[...]
    o_ref[...] = o[hpad : hpad + TT].astype(jnp.bfloat16)
    if has_r:
        res = jnp.dot(xb, wr_ref[...], preferred_element_type=jnp.float32)
    else:
        res = xb.astype(jnp.float32)
    y = o + res
    y_ref[...] = y[hpad : hpad + TT].astype(jnp.bfloat16)


def _bwd_kernel(
    mainx_ref, stripx_ref, maindy_ref, stripdy_ref, maino_ref, stripo_ref,
    w1_ref, b1_ref, s1_ref, t1_ref,
    wc_ref, bc_ref, sc_ref, tc_ref,
    wct_ref, w3t_ref, t3_ref, s3_ref, w1t_ref,
    *rest,
    d: int, t_total: int, hpad: int, nt: int, has_r: bool,
):
    if has_r:
        wrt_ref, dx_ref, xw, dyw, ow, dh = rest
    else:
        dx_ref, xw, dyw, ow, dh = rest
    r = TT + 2 * hpad
    _assemble(xw, mainx_ref, stripx_ref, hpad)
    _assemble(dyw, maindy_ref, stripdy_ref, hpad)
    _assemble(ow, maino_ref, stripo_ref, hpad)
    inb = _inbounds(r, hpad, t_total, nt)

    # recompute conv1 + the scale chain (masks only — values are not
    # needed by the transposed dots, but the relu masks are)
    xb = xw[...]
    z = jnp.dot(xb, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(z + b1_ref[...], 0.0) * s1_ref[...] + t1_ref[...]
    sps = _chain_fwd(h, wc_ref, bc_ref, sc_ref, tc_ref, inb, d)

    dy = dyw[...].astype(jnp.float32)
    # relu(z3) == 0  <=>  o rounds to t3. Equality is on the bf16
    # grid, but the compare itself runs in f32: mosaic's TPU lowering
    # has no bf16 cmpf ("Target does not support this comparison"),
    # and bf16 -> f32 is exact so the mask is unchanged.
    t3b = t3_ref[...].astype(jnp.bfloat16)
    mask3 = ow[...].astype(jnp.float32) != t3b.astype(jnp.float32)
    dq = jnp.where(mask3, dy * s3_ref[...], 0.0).astype(jnp.bfloat16)
    dcat = jnp.dot(dq, w3t_ref[...], preferred_element_type=jnp.float32)

    dh[:, WIDTH * NUMS :] = dcat[:, WIDTH * NUMS :]
    carry = None
    for i in range(NUMS - 1, -1, -1):
        sl = slice(WIDTH * i, WIDTH * (i + 1))
        dsp = dcat[:, sl] if carry is None else dcat[:, sl] + carry
        tci = tc_ref[:, sl]
        # relu mask of conv i: sp == t  <=>  relu(z_i) == 0 (f32 chain)
        mi = sps[i] != tci
        dz = jnp.where(mi, dsp * sc_ref[:, sl], 0.0)
        din = jnp.zeros_like(dz)
        for s in range(3):
            shifted = _roll(dz, (s - 1) * d).astype(jnp.bfloat16)
            w = wct_ref[(i * 3 + s) * WIDTH : (i * 3 + s + 1) * WIDTH, :]
            din = din + jnp.dot(shifted, w,
                                preferred_element_type=jnp.float32)
        din = jnp.where(inb, din, 0.0)
        dh[:, sl] = din
        carry = din
    mask1 = (z + b1_ref[...]) > 0.0
    dz1 = jnp.where(mask1, dh[...] * s1_ref[...], 0.0)
    dx = jnp.dot(dz1.astype(jnp.bfloat16), w1t_ref[...],
                 preferred_element_type=jnp.float32)
    if has_r:
        dx = dx + jnp.dot(dy.astype(jnp.bfloat16), wrt_ref[...],
                          preferred_element_type=jnp.float32)
    else:
        dx = dx + dy
    dx_ref[...] = dx[hpad : hpad + TT].astype(dx_ref.dtype)


def _const_spec(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=n: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _row_spec(rows, lanes):
    return pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_call(x, p: B2NParams, d: int, interpret: bool):
    b, t, cin = x.shape
    nt = -(-t // TT)
    hpad = _hpad(d)
    r = TT + 2 * hpad
    main, strips = _halo_blocks(x.astype(jnp.bfloat16), hpad, nt)
    kern = functools.partial(
        _fwd_kernel, d=d, t_total=t, hpad=hpad, nt=nt,
        has_r=p.wr is not None,
    )
    ins = [main, strips, p.w1, p.b1, p.s1, p.t1, p.wc, p.bc, p.sc,
           p.tc, p.w3, p.b3, p.s3, p.t3]
    in_specs = [
        _row_spec(TT, cin), _row_spec(2 * hpad, cin),
        _const_spec(p.w1.shape), _const_spec(p.b1.shape),
        _const_spec(p.s1.shape), _const_spec(p.t1.shape),
        _const_spec(p.wc.shape), _const_spec(p.bc.shape),
        _const_spec(p.sc.shape), _const_spec(p.tc.shape),
        _const_spec(p.w3.shape), _const_spec(p.b3.shape),
        _const_spec(p.s3.shape), _const_spec(p.t3.shape),
    ]
    if p.wr is not None:
        ins.append(p.wr)
        in_specs.append(_const_spec(p.wr.shape))
    y, o = pl.pallas_call(
        kern,
        grid=(b * nt,),
        in_specs=in_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b * nt * TT, PLANES), jnp.bfloat16),
            jax.ShapeDtypeStruct((b * nt * TT, PLANES), jnp.bfloat16),
        ],
        out_specs=[_row_spec(TT, PLANES), _row_spec(TT, PLANES)],
        scratch_shapes=[
            pltpu.VMEM((r, cin), jnp.bfloat16),
            pltpu.VMEM((r, PLANES), jnp.bfloat16),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ins)
    y = y.reshape(b, nt * TT, PLANES)[:, :t]
    o = o.reshape(b, nt * TT, PLANES)[:, :t]
    return y, o


def _bwd_call(x, dy, o, p: B2NParams, d: int, interpret: bool):
    b, t, cin = x.shape
    nt = -(-t // TT)
    hpad = _hpad(d)
    r = TT + 2 * hpad
    mainx, stripx = _halo_blocks(x.astype(jnp.bfloat16), hpad, nt)
    maindy, stripdy = _halo_blocks(dy.astype(jnp.bfloat16), hpad, nt)
    maino, stripo = _halo_blocks(o, hpad, nt)
    wct = jnp.concatenate(
        [
            p.wc[j * WIDTH : (j + 1) * WIDTH, :].T
            for j in range(3 * NUMS)
        ],
        axis=0,
    )
    w1t = p.w1.T
    kern = functools.partial(
        _bwd_kernel, d=d, t_total=t, hpad=hpad, nt=nt,
        has_r=p.wr is not None,
    )
    ins = [mainx, stripx, maindy, stripdy, maino, stripo,
           p.w1, p.b1, p.s1, p.t1, p.wc, p.bc, p.sc, p.tc,
           wct, p.w3.T, p.t3, p.s3, w1t]
    in_specs = [
        _row_spec(TT, cin), _row_spec(2 * hpad, cin),
        _row_spec(TT, PLANES), _row_spec(2 * hpad, PLANES),
        _row_spec(TT, PLANES), _row_spec(2 * hpad, PLANES),
        _const_spec(p.w1.shape), _const_spec(p.b1.shape),
        _const_spec(p.s1.shape), _const_spec(p.t1.shape),
        _const_spec(p.wc.shape), _const_spec(p.bc.shape),
        _const_spec(p.sc.shape), _const_spec(p.tc.shape),
        _const_spec(wct.shape), _const_spec((PLANES, PLANES)),
        _const_spec(p.t3.shape), _const_spec(p.s3.shape),
        _const_spec((PLANES, cin)),
    ]
    if p.wr is not None:
        ins.append(p.wr.T)
        in_specs.append(_const_spec((PLANES, cin)))
    dx = pl.pallas_call(
        kern,
        grid=(b * nt,),
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct((b * nt * TT, cin), jnp.bfloat16),
        out_specs=_row_spec(TT, cin),
        scratch_shapes=[
            pltpu.VMEM((r, cin), jnp.bfloat16),
            pltpu.VMEM((r, PLANES), jnp.bfloat16),
            pltpu.VMEM((r, PLANES), jnp.bfloat16),
            pltpu.VMEM((r, PLANES), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ins)
    return dx.reshape(b, nt * TT, cin)[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_bottle2neck(x, p: B2NParams, dilation: int, pool: int,
                      interpret: bool = False):
    """Eval-mode Bottle2neck body + pool, fused. x (B, T, Cin) -> bf16
    (B, T // pool, 1024) (or (B, T, 1024) for pool=0), pre-AFMS.

    T must be divisible by ``pool``. Differentiable w.r.t. x only
    (parameter cotangents are NaN-poisoned — attack/eval contract).
    """
    if pool and x.shape[1] % pool != 0:
        raise ValueError(
            f"fused_bottle2neck: T={x.shape[1]} not divisible by "
            f"pool={pool}")
    y, _ = _fwd_call(x, p, dilation, interpret)
    return _pool(y, pool)


def _pool(y, pool: int):
    if not pool:
        return y
    b, t, c = y.shape
    return y.reshape(b, t // pool, pool, c).max(axis=2)


def _fused_fwd(x, p, dilation, pool, interpret):
    y, o = _fwd_call(x, p, dilation, interpret)
    out = _pool(y, pool)
    return out, (x, y, o, out, p)


def _fused_bwd(dilation, pool, interpret, res, g):
    x, y, o, out, p = res
    if pool:
        up = jnp.repeat(out, pool, axis=1)
        ge = jnp.repeat(g, pool, axis=1)
        # winner routing by equality against the pooled max — exact in
        # bf16; exact ties double-route (see module docstring)
        dy = jnp.where(y == up, ge.astype(jnp.float32), 0.0)
    else:
        dy = g.astype(jnp.float32)
    dx = _bwd_call(x, dy, o, p, dilation, interpret)
    nanlike = lambda a: None if a is None else jnp.full_like(a, jnp.nan)
    dp = B2NParams(*(nanlike(a) for a in p))
    return dx.astype(x.dtype), dp


fused_bottle2neck.defvjp(_fused_fwd, _fused_bwd)
