"""Fused Pallas kernel for LCNN's first block: conv 5x5 (1->64) + MFM + 2x2 maxpool.

Why: this block dominates the PGD hot loop. Its conv output at full
resolution is (B, 404, 80, 64) — ~1 GB bf16 at batch 256 — and the XLA
schedule materializes it (plus the MFM and pool intermediates) in HBM
in both directions: measured 8.5 ms forward / 25.2 ms fwd+bwd out of the
whole 9-conv stack's 11.7/38.6 ms. The arithmetic is trivial (26 GFLOP);
it is pure memory traffic. This kernel keeps everything in VMEM and
writes only the pooled (B, 202, 40, 32) result (~130 MB), with a custom
VJP that recomputes in-VMEM instead of saving activations.

Reference behavior (conv+MFM+pool lineage): src/models/lcnn.py:102-243
(torch Conv2d(1,64,5,padding=2) -> MaxFeatureMap2D -> MaxPool2d(2,2)).

Design (mosaic-safe by construction — no sublane-misaligned slices,
8-aligned lane offsets, 2-D refs only):

* The time axis is split by parity OUTSIDE the kernel (one XLA pass
  over the 16 MB input): planes xe/xo with rows (t' + halo) and lanes
  f in [-2, 86). The 2x2 pool's t-pairs then become a plain
  elementwise max of two accumulators (even/odd conv rows) — never a
  stride-2 sublane access. Halo rows are reached with sublane
  rotates (f32 — mosaic rotates are 32-bit only); only 6 rotated
  planes exist (parity x shift 0..2), hoisted once per grid step.
* The conv is a block-Toeplitz matmul: output f-blocks of 16 need a
  24-wide f-input span; with the 5 time taps along K each block is an
  MXU dot (R*208 x 120) @ (120 x 1024), N = 16 f_out x 64 channels in
  lanes. The weight matrix is block-independent (edges handled by
  plane zero-padding), so one (120, 1024) bf16 operand stays resident.
* MFM (channel halves) and the pool's f-pairs are lane-local. The
  weight columns are PERMUTED so a pooled output's four candidates
  (f-parity x MFM-half) sit at the same offset of the four 256-lane
  quarters: the epilogue is three aligned slice-maxes and one
  256-lane store per block — zero lane rotates (a lane rotate
  rewrites the whole (rows, 1024) array; roll-based epilogues
  dominated earlier versions of this kernel).
* All arrays are passed FLATTENED to (B*ROWS_PAD, lanes) and blocked
  as row ranges of R samples — kernel refs are 2-D, so no mosaic
  value reshapes occur anywhere. Sample boundaries are protected by
  each sample's zero pad rows (rotate spill lands only in pad).
* Backward: the VJP forward emits a WINNER INDEX alongside the output
  — one bf16 plane holding argmax_c over the 8 pool/MFM candidates
  (c = parity*4 + quarter; lowest index on exact ties; small ints are
  exact in bf16). The backward routes the whole cotangent to that
  candidate ((idx == c) compares — torch-style single-winner routing;
  the XLA path's composed reshape-max splits ties hierarchically, and
  an earlier kernel split eq/count-evenly — all three differ only at
  exact-tie coordinates, which are measure-zero in f32 and rare in
  bf16) and produces dx via transposed dots. The index costs one
  (rows, 1280) bf16 store/load (~0.3 ms HBM at batch 256) and buys
  the backward out of recomputing both conv accumulators (10 MXU
  dots) and the 6 full-plane rotates. A first mask variant stored 8
  eq-bits packed as sum 2^c and decoded with floor-chains: ~2 ms of
  VPU decode per step that did not overlap the dx dots (measured
  5.9 ms vs 4.7 ms for the recompute backward it replaced) — the
  index form needs only one compare per candidate. dW falls back to
  the XLA reference implementation (attacks/eval set need_dw=False
  and skip it).

Numerics: conv products in bfloat16 with f32 accumulation — the
bf16-trunk fast path. The f32 EER-parity mode (`precision: "highest"`)
keeps the XLA path (models/lcnn.py gates on compute_dtype).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_IN = 404
F_IN = 80
C_OUT = 64  # conv channels (MFM halves to 32)
K = 5
T_OUT = T_IN // 2  # 202
F_OUT = F_IN // 2  # 40
ROWS_PAD = 208  # 202 t' rows + 1 halo row each side, 16-aligned
LANES_IN = 88  # f in [-2, 86): 80 + conv pad, rounded so every block
# slice [16*b, 16*b + 24) stays in range
FBLK = 16  # f_out per block
NBLK = F_IN // FBLK  # 5
SPAN = FBLK + 8  # 24: f-input span per block, 8-aligned
KDIM = K * SPAN  # 120
NDIM = FBLK * C_OUT  # 1024
QL = NDIM // 4  # 256: lanes per candidate quarter (see _pack_weights)
NOUT = F_OUT * 32  # 1280 merged output lanes


def _roll_rows(x, shift: int):
    """Sublane roll with jnp.roll sign semantics (f32 only on mosaic)."""
    if shift == 0:
        return x
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _src_for(pt: int, dt: int):
    """(plane parity, roll shift) for conv tap dt at output parity pt.

    Conv row t = 2t' + pt + (dt - 2) = 2*(t' + off) + parity; the
    plane row is t' + off + 1 (halo offset), reached by rolling the
    plane up by off + 1.
    """
    tot = pt + dt - 2
    parity = tot % 2
    off = (tot - parity) // 2
    return parity, off + 1


def _rolled_planes(xe, xo):
    """The 6 distinct rotated planes, cast to bf16: [parity][shift]."""
    return [
        [_roll_rows(p, -s).astype(jnp.bfloat16) for s in range(3)]
        for p in (xe, xo)
    ]


def _accumulate(planes, w_ref, bias_ref, b5, pt, x_scratch):
    """One parity's conv accumulator for f-block b5: (rows, NDIM) f32."""
    for dt in range(K):
        parity, shift = _src_for(pt, dt)
        x_scratch[:, dt * SPAN : (dt + 1) * SPAN] = planes[parity][shift][
            :, FBLK * b5 : FBLK * b5 + SPAN
        ]
    acc = jnp.dot(
        x_scratch[:, :], w_ref[:, :], preferred_element_type=jnp.float32
    )
    return acc + bias_ref[:, :]


def _quarter_max(m):
    """Max over the four 256-lane candidate quarters -> (rows, 256).

    The weight columns are permuted (see _pack_weights) so a pooled
    output's four candidates (f-parity x MFM-half) live at the same
    offset of the four quarters — the whole MFM+pool epilogue is
    aligned slice maxes, no lane rotates (a lane rotate rewrites the
    entire (rows, 1024) array and dominated earlier kernel versions).
    """
    return jnp.maximum(
        jnp.maximum(m[:, 0:QL], m[:, QL : 2 * QL]),
        jnp.maximum(m[:, 2 * QL : 3 * QL], m[:, 3 * QL : 4 * QL]),
    )


def _fwd_kernel(xe_ref, xo_ref, w_ref, bias_ref, out_ref, x_scratch):
    planes = _rolled_planes(xe_ref[...], xo_ref[...])
    for b5 in range(NBLK):
        acc_e = _accumulate(planes, w_ref, bias_ref, b5, 0, x_scratch)
        acc_o = _accumulate(planes, w_ref, bias_ref, b5, 1, x_scratch)
        mm = _quarter_max(jnp.maximum(acc_e, acc_o))
        # store in the caller's dtype (bf16 on the fast trunk): an f32
        # store + XLA cast would round-trip the 273 MB batch-256 output
        # through HBM once more
        out_ref[:, QL * b5 : QL * (b5 + 1)] = mm.astype(out_ref.dtype)


def _fwd_mask_kernel(
    xe_ref, xo_ref, w_ref, bias_ref, out_ref, mask_ref, x_scratch
):
    """Forward + winner index (VJP path; see module docstring)."""
    planes = _rolled_planes(xe_ref[...], xo_ref[...])
    for b5 in range(NBLK):
        acc_e = _accumulate(planes, w_ref, bias_ref, b5, 0, x_scratch)
        acc_o = _accumulate(planes, w_ref, bias_ref, b5, 1, x_scratch)
        mm = _quarter_max(jnp.maximum(acc_e, acc_o))
        out_ref[:, QL * b5 : QL * (b5 + 1)] = mm.astype(out_ref.dtype)
        # lowest winning candidate index c = parity*4 + quarter
        m = jnp.full_like(mm, 7.0)
        for pt, acc in ((1, acc_o), (0, acc_e)):  # descending c
            for q in (3, 2, 1, 0):
                c = float(pt * 4 + q)
                sl = acc[:, QL * q : QL * (q + 1)]
                m = jnp.where(sl == mm, c, m)
        mask_ref[:, QL * b5 : QL * (b5 + 1)] = m.astype(jnp.bfloat16)


def _bwd_kernel(
    wt_ref, mask_ref, g_ref,
    dxe_ref, dxo_ref, d_scratch, de_scratch, do_scratch,
):
    """Index-driven dx: no conv recompute, no input planes, no plane rolls."""
    de_scratch[:, :] = jnp.zeros_like(de_scratch)
    do_scratch[:, :] = jnp.zeros_like(do_scratch)

    for b5 in range(NBLK):
        # f32 compare: mosaic has no bf16 integer-equality on v5e
        m = mask_ref[:, QL * b5 : QL * (b5 + 1)].astype(jnp.float32)
        gg = g_ref[:, QL * b5 : QL * (b5 + 1)]

        for pt in (0, 1):
            for q in range(4):
                c = float(pt * 4 + q)
                d_scratch[:, QL * q : QL * (q + 1)] = jnp.where(
                    m == c, gg, 0.0
                ).astype(d_scratch.dtype)
            dx_b = jnp.dot(
                d_scratch[:, :],
                wt_ref[:, :],
                preferred_element_type=jnp.float32,
            )  # (rows, KDIM)
            for dt in range(K):
                parity, shift = _src_for(pt, dt)
                dst = de_scratch if parity == 0 else do_scratch
                contrib = _roll_rows(
                    dx_b[:, dt * SPAN : (dt + 1) * SPAN], shift
                )
                dst[:, FBLK * b5 : FBLK * b5 + SPAN] = (
                    dst[:, FBLK * b5 : FBLK * b5 + SPAN] + contrib
                )
    dxe_ref[...] = de_scratch[:, :]
    dxo_ref[...] = do_scratch[:, :]


def _pack_weights(w: jax.Array, bias: jax.Array):
    """flax HWIO (5, 5, 1, 64) -> block-Toeplitz (120, 1024) + bias row."""
    wt2 = w[:, :, 0, :].reshape(K * K, C_OUT)  # (dt*5 + df, c)
    fi = np.arange(SPAN)[None, :, None]
    fo = np.arange(FBLK)[None, None, :]
    dt = np.arange(K)[:, None, None]
    df = fi - fo  # in [0, 5) when valid
    valid = (df >= 0) & (df < K)
    # static numpy gather indices (jnp index arrays break when traced
    # inside scan bodies)
    flat = dt * K + np.clip(df, 0, K - 1)  # (K, SPAN, FBLK) np
    big = wt2[flat]  # (K, SPAN, FBLK, C_OUT)
    big = jnp.where(jnp.asarray(valid)[..., None], big, 0.0)
    # permute columns to quarter layout n' = 512p + 256h + 32fop + chp
    # (p = f-parity, h = MFM half, fop = f_out pair, chp = channel) so
    # the epilogue's 4 candidates are aligned 256-lane slices
    big = big.reshape(K, SPAN, F_OUT // NBLK, 2, 2, C_OUT // 2)
    big = big.transpose(0, 1, 3, 4, 2, 5)  # (K, SPAN, p, h, fop, chp)
    wmat = big.reshape(KDIM, NDIM)
    brow = jnp.broadcast_to(
        bias.reshape(1, 2, 1, C_OUT // 2), (2, 2, F_OUT // NBLK, C_OUT // 2)
    ).reshape(1, NDIM)
    return wmat.astype(jnp.bfloat16), brow.astype(jnp.float32)


def _planes(x: jax.Array):
    """(B, 404, 80) -> flattened f32 parity planes (B*ROWS_PAD, LANES_IN).

    Planes stay f32: mosaic rotates only handle 32-bit data; the bf16
    cast happens on the rotated values inside the kernel (numerically
    identical).
    """
    b = x.shape[0]
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, 0), (2, LANES_IN - F_IN - 2))
    )
    xe = xp[:, 0::2]  # (B, 202, LANES_IN)
    xo = xp[:, 1::2]
    pad = ((0, 0), (1, ROWS_PAD - T_OUT - 1), (0, 0))  # halo + sublane pad
    flat = lambda a: jnp.pad(a, pad).reshape(b * ROWS_PAD, LANES_IN)
    return flat(xe), flat(xo)


def _const_spec(shape):
    ndim = len(shape)
    return pl.BlockSpec(
        shape, lambda i, _n=ndim: (0,) * _n, memory_space=pltpu.VMEM
    )


def _block_spec(rows, lanes):
    return pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _rows_per_step(b: int) -> int:
    # 2 samples per grid step: bigger MXU dots + halved grid overhead;
    # the slice-quarter epilogue keeps both directions under the 16 MB
    # scoped-VMEM ceiling at r=2 (roll-based epilogues did not)
    return 2 if b % 2 == 0 else 1


def _fwd_call(xe, xo, wmat, brow, out_dtype, interpret, with_mask=False):
    rows_total = xe.shape[0]
    b = rows_total // ROWS_PAD
    r = _rows_per_step(b)
    rows = r * ROWS_PAD
    common = dict(
        grid=(b // r,),
        in_specs=[
            _block_spec(rows, LANES_IN),
            _block_spec(rows, LANES_IN),
            _const_spec(wmat.shape),
            _const_spec(brow.shape),
        ],
        scratch_shapes=[pltpu.VMEM((rows, KDIM), jnp.bfloat16)],
        interpret=interpret,
    )
    if with_mask:
        out, mask = pl.pallas_call(
            _fwd_mask_kernel,
            out_shape=[
                jax.ShapeDtypeStruct((rows_total, NOUT), out_dtype),
                jax.ShapeDtypeStruct((rows_total, NOUT), jnp.bfloat16),
            ],
            out_specs=[_block_spec(rows, NOUT), _block_spec(rows, NOUT)],
            **common,
        )(xe, xo, wmat, brow)
    else:
        out = pl.pallas_call(
            _fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((rows_total, NOUT), out_dtype),
            out_specs=_block_spec(rows, NOUT),
            **common,
        )(xe, xo, wmat, brow)
        mask = None
    out = out.reshape(b, ROWS_PAD, F_OUT, 32)[:, :T_OUT]
    return (out, mask) if with_mask else out


def _bwd_call(wt, mask, g, interpret):
    rows_total = mask.shape[0]
    b = rows_total // ROWS_PAD
    # r=4 was tried for the lighter index-driven backward (no input
    # planes) but exceeds the 16 MB scoped-VMEM ceiling by ~0.7 MB
    # in-context (the ceiling includes the XLA-placed dxe/dxo outputs)
    r = _rows_per_step(b)
    rows = r * ROWS_PAD
    gp = jnp.pad(
        g.astype(jnp.float32).reshape(b, T_OUT, NOUT),
        ((0, 0), (0, ROWS_PAD - T_OUT), (0, 0)),
    ).reshape(rows_total, NOUT)
    dxe, dxo = pl.pallas_call(
        _bwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, LANES_IN), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, LANES_IN), jnp.float32),
        ],
        grid=(b // r,),
        in_specs=[
            _const_spec((NDIM, KDIM)),
            _block_spec(rows, NOUT),
            _block_spec(rows, NOUT),
        ],
        out_specs=[
            _block_spec(rows, LANES_IN),
            _block_spec(rows, LANES_IN),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, NDIM), jnp.bfloat16),
            pltpu.VMEM((rows, LANES_IN), jnp.float32),
            pltpu.VMEM((rows, LANES_IN), jnp.float32),
        ],
        interpret=interpret,
    )(wt, mask, gp)
    return dxe.reshape(b, ROWS_PAD, LANES_IN), dxo.reshape(
        b, ROWS_PAD, LANES_IN
    )


def _reference_xla(x, w, bias):
    """XLA reference: conv 5x5 SAME + split-MFM + reshape-max pool.

    Used for dW in the VJP and as the test oracle; mirrors the module
    path in models/lcnn.py.
    """
    y = jax.lax.conv_general_dilated(
        x[..., None], w, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    a, bb = jnp.split(y, 2, axis=-1)
    y = jnp.maximum(a, bb)
    b_ = y.shape[0]
    y = y.reshape(b_, T_OUT, 2, F_OUT, 2, 32)
    return y.max(axis=(2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_conv0_mfm_pool(x, w, bias, interpret=False, need_dw=True):
    """(B, 404, 80) bf16/f32, w (5,5,1,64) HWIO, bias (64) -> (B, 202, 40, 32).

    Equals conv5x5(pad 2) + MFM + maxpool2x2 with bf16 conv compute and
    f32 accumulation. ``need_dw=False`` (attack/eval paths) returns
    zero weight cotangents instead of tracing the wgrad graph — a
    custom_vjp's bwd is traced wholesale, so XLA cannot be relied on to
    DCE an unused dW branch (it materially slowed one-shot attacks).
    """
    xe, xo = _planes(x)
    wmat, brow = _pack_weights(w, bias)
    return _fwd_call(xe, xo, wmat, brow, x.dtype, interpret)


def _fused_fwd(x, w, bias, interpret, need_dw):
    xe, xo = _planes(x)
    wmat, brow = _pack_weights(w, bias)
    out, mask = _fwd_call(xe, xo, wmat, brow, x.dtype, interpret,
                          with_mask=True)
    return out, (x, mask, w, bias)


def _fused_bwd(interpret, need_dw, res, g):
    x, mask, w, bias = res
    wmat, _ = _pack_weights(w, bias)
    dxe, dxo = _bwd_call(wmat.T, mask, g, interpret)
    # drop halo rows, interleave parities, drop f pad
    dxe = dxe[:, 1 : 1 + T_OUT]
    dxo = dxo[:, 1 : 1 + T_OUT]
    dx = jnp.stack([dxe, dxo], axis=2).reshape(
        x.shape[0], T_IN, LANES_IN
    )[:, :, 2 : 2 + F_IN]
    if not need_dw:
        # need_dw=False means the caller promised not to consume W/bias
        # cotangents (attack programs differentiate w.r.t. x only). NaN
        # rather than zero so an accidental eval-mode parameter gradient
        # fails loudly instead of silently training conv0 with dW == 0.
        return (
            dx.astype(x.dtype),
            jnp.full_like(w, jnp.nan),
            jnp.full_like(bias, jnp.nan),
        )
    # dW/dbias through the XLA reference path (training steps)
    _, vjp = jax.vjp(
        lambda ww, bb: _reference_xla(x.astype(jnp.bfloat16), ww, bb),
        w.astype(jnp.bfloat16), bias.astype(jnp.bfloat16),
    )
    dw, dbias = vjp(g.astype(jnp.bfloat16))
    return dx.astype(x.dtype), dw.astype(w.dtype), dbias.astype(bias.dtype)


fused_conv0_mfm_pool.defvjp(_fused_fwd, _fused_bwd)
