"""Space-to-depth (W->C) folding for the LCNN mid-trunk (round 5).

The LCNN mid-trunk convs present 32-64 channels to hardware whose
vector lane width is 128 and whose MXU tiles operands at 128x128: a
(1, 1, 32, 64) conv fills <= 12.5% of the systolic array's K x N face,
and the round-4 per-layer profile measured these layers at 2-20% MFU
(scripts/profiling/profile_layers_r4.json). The coefficient axis W
(40 -> 20 -> 10) is too small to help.

This module folds W into the channel axis by a factor ``f`` so the
same math runs with f-times wider operands:

  X_f[b, h, w2, c*f + p] = x[b, h, f*w2 + p, c]          (channel-major)

The channel-major ``(c, p)`` flat ordering is the load-bearing choice —
it makes the surrounding LCNN ops fold for free:

* MFM (max over channel halves, reference src/models/lcnn.py:49-95):
  the half split ``c < C/2`` maps to ``flat < C*f/2``, still one
  contiguous slice, so ``layers.max_feature_map`` applies UNCHANGED to
  folded tensors and pairs exactly the elements the unfolded MFM pairs.
* 2x2 max pool: the H reduction stays spatial; the W reduction becomes
  a max over adjacent phase PAIRS, i.e. one more axis in the same
  reshape-max that already implements mfm+pool (``mfm_pool_folded``).
  A pool therefore HALVES the fold factor: blocks cascade (A at f=4
  exits at f=2 which is exactly block B's f=2 entry) without any
  intermediate unfold transposes.
* conv: a k-wide conv on x is EXACTLY a k_f-wide conv on X_f with the
  block-structured kernel built by ``fold_kernel`` (each original tap
  (dw, po) lands at folded tap o = floor((po+dw-pad)/f), input phase
  pi = (po+dw-pad) mod f). Zero taps read only positions the original
  padding also zeroed, so boundary behavior is identical. 1x1 convs
  fold to phase-block-diagonal 1x1s.

Cost model: a folded conv runs (k_f * f / k)x the MACs (2x at f=2,
4x at f=4 for the 3x3s; fx for the 1x1s) in exchange for f-times
fuller MXU K/N faces — a win wherever the padding/tiling waste it
removes exceeds ~1/f.

MEASURED VERDICT (round 5, profile_s2d_r5.json, v5e batch 256): a
NEGATIVE result. All three variants run 2.0-2.3x slower than the
unfolded chain (f2 28.7 / f4 32.8 / f4lite 31.7 vs base 14.3 ms
fwd+bwd) — XLA's layout assignment already reorders minor dims onto
the (8,128) tiles for these convs (visible in its HLO layouts, e.g.
bf16[256,6435,1024]{2,0,1:T(8,128)(2,1)}), so there was no padding
waste to reclaim and the fold pays full MAC inflation. Kept as an
opt-in (ADAA_S2D_TRUNK in models/lcnn.py) tested negative result that
bounds this direction for future rounds.

No reference counterpart: the torch code (src/models/lcnn.py:102-243)
runs cuDNN NCHW convs; this transform exists purely for the TPU's
tiling. Output equivalence vs the unfolded trunk is pinned in
tests/test_s2d.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_w(x: jax.Array, f: int) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/f, C*f), channel-major (c, p) ordering."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    assert w % f == 0, f"W={w} not divisible by fold factor {f}"
    x = x.reshape(b, h, w // f, f, c)
    x = jnp.swapaxes(x, -1, -2)  # (..., c, p)
    return x.reshape(b, h, w // f, c * f)


def unfold_w(x: jax.Array, f: int) -> jax.Array:
    """Inverse of fold_w."""
    if f == 1:
        return x
    b, h, w2, cf = x.shape
    assert cf % f == 0
    x = x.reshape(b, h, w2, cf // f, f)
    x = jnp.swapaxes(x, -1, -2)  # (..., p, c)
    return x.reshape(b, h, w2 * f, cf // f)


def fold_kernel(kernel: jax.Array, f: int):
    """Fold an HWIO conv kernel for fold_w-folded inputs/outputs.

    Returns (kernel_f, (pad_lo, pad_hi)) where kernel_f is
    (kh, kw_f, ci*f, co*f) and the W padding is for the folded conv
    (H padding stays kh//2). Assumes the trunk's SAME-style padding
    pad = kw//2 on the original conv.
    """
    kh, kw, ci, co = kernel.shape
    if f == 1:
        return kernel, (kw // 2, kw // 2)
    pad = kw // 2
    o_min = -((pad + f - 1) // f) if pad else 0  # floor((0+0-pad)/f)
    o_max = (f - 1 + kw - 1 - pad) // f
    kwf = o_max - o_min + 1
    kf = jnp.zeros((kh, kwf, ci * f, co * f), kernel.dtype)
    for po in range(f):
        for dw in range(kw):
            q = po + dw - pad
            o, pi = q // f, q % f  # python floor-div/mod: correct for q<0
            kf = kf.at[:, o - o_min, pi::f, po::f].set(
                kernel[:, dw, :, :]
            )
    return kf, (-o_min, o_max)


def fold_bias(bias: jax.Array, f: int) -> jax.Array:
    """bias_f[c*f + p] = bias[c]."""
    return bias if f == 1 else jnp.repeat(bias, f)


def conv_folded(
    h: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    f: int,
    dtype=None,
) -> jax.Array:
    """The trunk's SAME conv + bias on a fold_w(f) tensor.

    kernel/bias are the ORIGINAL (unfolded) parameters; folding happens
    here (a trace-time scatter over k*f slices of a weight-sized
    array — negligible next to the conv itself).
    """
    kh = kernel.shape[0]
    kf, (lo, hi) = fold_kernel(kernel, f)
    if dtype is not None:
        h, kf = h.astype(dtype), kf.astype(dtype)
    y = jax.lax.conv_general_dilated(
        h, kf, (1, 1), [(kh // 2, kh // 2), (lo, hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + fold_bias(bias, f).astype(y.dtype)


def mfm_pool_folded(x: jax.Array, f: int) -> jax.Array:
    """MFM + 2x2 max pool on a fold_w(f) tensor -> fold_w(f/2) tensor.

    One reshape-max (same associativity argument as
    layers.mfm_pool_2d): reduces the H pair spatially, the MFM half and
    the adjacent phase pair on the channel axis. f=2 output is fully
    unfolded; f=4 output is the f=2 folding of the pooled block —
    exactly the next block's folded entry layout.
    """
    assert f % 2 == 0, "pool consumes one factor of 2 from the fold"
    b, h, w2, cf = x.shape
    c = cf // f  # original (pre-MFM) channel count
    assert c % 2 == 0
    x = x[:, : (h // 2) * 2]
    # flat channel = half*(C/2*f) + c'*f + p'*2 + pbit
    x = x.reshape(b, h // 2, 2, w2, 2, c // 2, f // 2, 2)
    x = x.max(axis=(2, 4, 7))  # hbit, MFM half, phase pair
    return x.reshape(b, h // 2, w2, (c // 2) * (f // 2))
