"""Closed-form box-constrained hyperplane projections for FAB.

Vectorized jnp implementations of the three projection subroutines of
the FAB attack (Croce & Hein 2019; reference:
adversarial_attacks/torchattacks/attacks/fab.py:562-717):
given points t in the [0,1]^D box and hyperplanes (w, b), compute the
minimal-(Linf|L2|L1)-norm d such that t + d stays in the box and
crosses the hyperplane.

Data-dependent row subsetting in the torch code (``d[c2] = ...``)
becomes full-batch compute + ``jnp.where`` masks, and the per-row
binary searches run a static ``ceil(log2 D)`` iterations — fully
jit-compatible with no dynamic shapes.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _take(a: jax.Array, idx: jax.Array) -> jax.Array:
    """Row-wise gather: a[i, idx[i, j]]."""
    return jnp.take_along_axis(a, idx, axis=1)


# ---------------------------------------------------------------------------
# Bisection projections (TPU fast path)
#
# The sort-based closed forms below are exact but pay a bitonic sort over
# D = 64600 columns every FAB step — the dominant cost of the attack on TPU.
# The same optima have a one-dimensional monotone characterisation: after
# sign-normalising w so the constraint reads  w·d <= c  (c <= 0), the
# minimal-norm solution moves every coordinate in direction -sign(w_i) by
#   Linf:  min(lam, p_i)              (p_i = box wall distance)
#   L2:    w_i-proportional, clipped:  |w_i| * min(alpha, p_i/|w_i|)
# and the reach  g(lam) = sum_i |w_i| * min(lam, p_i)  is concave increasing,
# so the optimal radius is found by bisection — O(iters * B * D) fused
# elementwise work instead of an O(D log^2 D) sort. Verified exactly
# equivalent to the sort-based forms in tests/test_fab_projections.py.
# ---------------------------------------------------------------------------


def _fan_search(g_of, lo, hi, bits: int, fan: int):
    """Monotone scalar search batching ``fan`` candidates per pass.

    ``g_of(mids)`` maps candidate radii (..., fan) -> constraint values
    (..., fan), nondecreasing along the last axis. Each pass reads the
    (B, D)-sized operands ONCE and narrows the bracket by a factor of
    ``fan + 1`` — log2(fan+1) bits per pass instead of the 1 bit of a
    plain bisection, so the HBM-bound search does ~4x fewer full-D
    sweeps for the same precision. Returns the upper bracket (first
    value known to satisfy the constraint, like the bisection's ``hi``).
    """
    passes = -(-bits // max(1, (fan + 1).bit_length() - 1))
    frac = jnp.arange(1, fan + 1, dtype=lo.dtype) / (fan + 1)
    for _ in range(passes):
        span = (hi - lo)[..., None]
        mids = lo[..., None] + span * frac
        ok = g_of(mids)  # (..., fan) monotone: 0...0 1...1
        m = (~ok).sum(-1).astype(lo.dtype)  # fails in [0, fan]
        step = (hi - lo) / (fan + 1)
        new_lo = lo + step * m
        hi = jnp.minimum(new_lo + step, hi)
        lo = new_lo
    return hi


def projection_linf_bisect(
    t: jax.Array, w: jax.Array, b: jax.Array, iters: int = 30
) -> jax.Array:
    d2 = projection_linf_bisect_pair(t[None], w, b[None], iters)
    return d2[0]


def projection_linf_bisect_pair(
    t2: jax.Array, w: jax.Array, b2: jax.Array, iters: int = 30,
    fan: int = 7,
) -> jax.Array:
    """Linf projection of S points per hyperplane: t2 (S, B, D), w (B, D),
    b2 (S, B) -> d (S, B, D).

    FAB projects two points (the iterate and the original) onto the SAME
    hyperplane each step (fab.py:112-115 in the reference stacks them);
    sharing the w-derived operands across the S axis keeps |w| at (B, D)
    instead of duplicating it, and the fan-search cuts the number of
    full-D sweeps ~4x. Bit-equivalent to projection_linf_bisect per row
    up to bracket-width 2^-iters (both return the bracket's top).
    """
    sign = 2.0 * ((w * t2).sum(-1) - b2 >= 0) - 1.0  # (S, B)
    s3 = sign[..., None]
    need = ((w * t2).sum(-1) - b2) * sign  # >= 0

    nz = (w != 0).astype(t2.dtype)  # (B, D)
    aw = jnp.abs(w)
    p = jnp.where(w * s3 > 0, t2, 1.0 - t2)  # (S, B, D)
    awp = aw * p * nz
    total = awp.sum(-1)
    reachable = total >= need

    def g_of(mids):  # (S, B, fan) -> (S, B, fan)
        return jnp.minimum(
            aw[None, :, :, None] * mids[:, :, None, :], awp[..., None]
        ).sum(-2) >= need[..., None]

    lam = _fan_search(g_of, jnp.zeros_like(need), jnp.ones_like(need),
                      iters, fan)[..., None]
    d = -jnp.sign(w) * s3 * jnp.where(
        reachable[..., None], jnp.minimum(lam, p), p
    )
    return d * nz


def projection_l2_bisect(
    t: jax.Array, w: jax.Array, b: jax.Array, iters: int = 40
) -> jax.Array:
    d2 = projection_l2_bisect_pair(t[None], w, b[None], iters)
    return d2[0]


def projection_l2_bisect_pair(
    t2: jax.Array, w: jax.Array, b2: jax.Array, iters: int = 40,
    fan: int = 7,
) -> jax.Array:
    """L2 projection of S points per hyperplane (see the Linf pair form).

    g(alpha) = sum_i min(alpha * w_i^2, |w_i| p_i); alpha* can span many
    orders of magnitude (r_i up to p/|w| with tiny w), so the fan search
    runs in log space between the unclipped lower bound and the largest
    breakpoint.
    """
    sign = 2.0 * ((w * t2).sum(-1) - b2 >= 0) - 1.0  # (S, B)
    s3 = sign[..., None]
    need = ((w * t2).sum(-1) - b2) * sign

    nz = (jnp.abs(w) > 1e-8).astype(t2.dtype)  # (B, D)
    aw = jnp.abs(w)
    p = jnp.where(w * s3 > 0, t2, 1.0 - t2)  # (S, B, D)
    w2 = w * w * nz  # (B, D), sign-independent
    wp = aw * p * nz  # (S, B, D)
    total = wp.sum(-1)
    reachable = total >= need

    w2sum = jnp.maximum(w2.sum(-1), 1e-30)  # (B,)
    lo = jnp.log(jnp.maximum(need, 1e-30) / w2sum)
    hi = jnp.log(
        jnp.maximum(
            jnp.max(
                jnp.where(nz > 0, p / jnp.maximum(aw, 1e-30), 0.0), axis=-1
            ),
            1e-30,
        )
    )
    hi = jnp.maximum(hi, lo + 1e-6)

    def g_of(mids):  # log-space candidates (S, B, fan)
        alpha = jnp.exp(mids)
        return jnp.minimum(
            w2[None, :, :, None] * alpha[:, :, None, :], wp[..., None]
        ).sum(-2) >= need[..., None]

    alpha = jnp.exp(_fan_search(g_of, lo, hi, iters, fan))[..., None]
    d = -jnp.sign(w) * s3 * jnp.where(
        reachable[..., None], jnp.minimum(alpha * aw, p), p
    )
    return d * nz


def projection_linf(t: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    dim = w.shape[1]
    sign = 2.0 * ((w * t).sum(1) - b >= 0) - 1.0
    w = w * sign[:, None]
    b = b * sign

    a = (w < 0).astype(t.dtype)
    d = (a - t) * (w != 0).astype(t.dtype)

    p = a - t * (2.0 * a - 1.0)

    b = b - (w * t).sum(1)
    b0 = (w * d).sum(1)

    # ONE co-sort carries w and d along with the p keys — on TPU, sorts
    # are expensive and random gathers worse; everything downstream is
    # positional in sorted order, so no take_along_axis on (B, D) arrays
    ps_asc, ws_asc, ds_asc = jax.lax.sort((p, w, d), num_keys=1)
    ws = jnp.flip(ws_asc, axis=1)  # descending-p order
    bs2 = -ws * jnp.flip(ds_asc, axis=1)

    s = jnp.cumsum(jnp.abs(ws), axis=1)
    sb = jnp.cumsum(bs2, axis=1) + b0[:, None]

    b2 = sb[:, -1] - s[:, -1] * ps_asc[:, 0]
    c_l = (b - b2) > 0
    c2 = jnp.logical_and((b - b0) > 0, jnp.logical_not(c_l))

    lb = jnp.zeros_like(b)
    ub = jnp.full_like(b, dim - 1)
    nitermax = math.ceil(math.log2(dim))
    for _ in range(nitermax):
        counter4 = jnp.floor((lb + ub) / 2)
        counter2 = counter4.astype(jnp.int32)[:, None]
        # p[indp[D-1-counter]] == the (D-1-counter)-th smallest == ps_asc col
        p_piv = _take(ps_asc, dim - 1 - counter2)
        b2i = (_take(sb, counter2) - _take(s, counter2) * p_piv)[:, 0]
        c = (b - b2i) > 0
        lb = jnp.where(c, counter4, lb)
        ub = jnp.where(c, ub, counter4)
    lb_i = lb.astype(jnp.int32)[:, None]

    # c_l rows
    lmbd_l = jnp.maximum((b - sb[:, -1]) / (-s[:, -1]), 0.0)[:, None]
    d_cl = (2.0 * a - 1.0) * lmbd_l

    # c2 rows
    lmbd_2 = jnp.maximum(
        (b[:, None] - _take(sb, lb_i)) / (-_take(s, lb_i)), 0.0
    )
    d_c2 = jnp.minimum(lmbd_2, d) * a + jnp.maximum(-lmbd_2, d) * (1.0 - a)

    d = jnp.where(c_l[:, None], d_cl, jnp.where(c2[:, None], d_c2, d))
    return d * (w != 0).astype(t.dtype)


def projection_l2(t: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    dim = w.shape[1]
    c = (w * t).sum(1) - b
    ind2 = (2.0 * (c >= 0) - 1.0)
    w = w * ind2[:, None]
    c = c * ind2

    nonzero = jnp.abs(w) > 1e-8
    w_safe = jnp.where(nonzero, w, 1.0)
    r_raw = jnp.clip(jnp.maximum(t / w_safe, (t - 1.0) / w_safe), -1e12, 1e12)
    r = jnp.where(nonzero, r_raw, 1e12)
    r = jnp.where(r == -1e12, 1e12, r)
    # co-sort w^2 with the r keys (see projection_linf for why)
    rs, w3s = jax.lax.sort((r, w * w), num_keys=1)
    rs2 = jnp.concatenate([rs[:, 1:], jnp.zeros_like(rs[:, :1])], axis=1)
    rs = jnp.where(rs == 1e12, 0.0, rs)
    rs2 = jnp.where(rs2 == 1e12, 0.0, rs2)
    w5 = w3s.sum(axis=1, keepdims=True)
    ws = w5 - jnp.cumsum(w3s, axis=1)
    d = -(r * w) * nonzero.astype(t.dtype)
    s = jnp.concatenate(
        [
            -w5 * rs[:, 0:1],
            jnp.cumsum((-rs2 + rs) * ws, axis=1) - w5 * rs[:, 0:1],
        ],
        axis=1,
    )  # (B, D+1)

    c4 = (s[:, 0] + c) < 0
    c3 = ((d * w).sum(1) + c) > 0
    c2 = jnp.logical_not(jnp.logical_or(c4, c3))

    lb = jnp.zeros_like(c)
    ub = jnp.full_like(c, dim - 1)
    nitermax = math.ceil(math.log2(dim))
    for _ in range(nitermax):
        counter4 = jnp.floor((lb + ub) / 2)
        counter2 = counter4.astype(jnp.int32)[:, None]
        c3i = (_take(s, counter2)[:, 0] + c) > 0
        lb = jnp.where(c3i, counter4, lb)
        ub = jnp.where(c3i, ub, counter4)
    lb_i = lb.astype(jnp.int32)[:, None]

    # c4 rows
    alpha4 = c / w5[:, 0]
    d_c4 = -alpha4[:, None] * w

    # c2 rows
    ws_lb = _take(ws, lb_i)[:, 0]
    alpha2 = (_take(s, lb_i)[:, 0] + c) / jnp.where(ws_lb == 0, 1.0, ws_lb) + _take(
        rs, lb_i
    )[:, 0]
    alpha2 = jnp.where(ws_lb == 0, 0.0, alpha2)
    c5 = (alpha2[:, None] > r).astype(t.dtype)
    d_c2 = d * c5 - alpha2[:, None] * w * (1.0 - c5)

    d = jnp.where(c4[:, None], d_c4, jnp.where(c2[:, None], d_c2, d))
    return d * nonzero.astype(t.dtype)


def projection_l1(t: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    dim = w.shape[1]
    c = (w * t).sum(1) - b
    ind2 = (2.0 * (c >= 0) - 1.0)
    w = w * ind2[:, None]
    c = c * ind2

    nonzero = jnp.abs(w) > 1e-8
    w_safe = jnp.where(nonzero, w, 1.0)
    r = jnp.where(nonzero, jnp.minimum(jnp.abs(1.0 / w_safe), 1e12), 1e12)
    indr = jnp.argsort(r, axis=1)
    indr_rev = jnp.argsort(indr, axis=1)

    c6 = (w < 0).astype(t.dtype)
    d = (-t + c6) * nonzero.astype(t.dtype)
    ds = _take(jnp.minimum(-w * t, w * (1.0 - t)), indr)
    ds2 = jnp.concatenate([c[:, None], ds], axis=1)
    s = jnp.cumsum(ds2, axis=1)  # (B, D+1)

    c2 = s[:, -1] < 0

    lb = jnp.zeros_like(c)
    ub = jnp.full_like(c, float(s.shape[1]))
    nitermax = math.ceil(math.log2(dim))
    for _ in range(nitermax):
        counter4 = jnp.floor((lb + ub) / 2)
        counter2 = counter4.astype(jnp.int32)[:, None]
        c3i = _take(s, counter2)[:, 0] > 0
        lb = jnp.where(c3i, counter4, lb)
        ub = jnp.where(c3i, ub, counter4)
    lb2 = lb.astype(jnp.int32)

    # c2 rows: zero out the |w|-sorted tail beyond lb, put alpha at pivot
    indr_piv = jnp.take_along_axis(indr, lb2[:, None], axis=1)  # (B, 1)
    w_piv = jnp.take_along_axis(w, indr_piv, axis=1)[:, 0]
    alpha = -jnp.take_along_axis(s, lb2[:, None], axis=1)[:, 0] / jnp.where(
        w_piv == 0, 1.0, w_piv
    )
    u2 = jnp.arange(dim, dtype=t.dtype)[None, :]
    c5 = u2 < lb[:, None]  # positions (in sorted order) kept
    u3 = jnp.take_along_axis(c5, indr_rev, axis=1)
    d_c2 = d * u3.astype(t.dtype)
    d_c2 = jnp.where(
        jnp.arange(dim)[None, :] == indr_piv, alpha[:, None], d_c2
    )

    d = jnp.where(c2[:, None], d_c2, d)
    return d * nonzero.astype(t.dtype)
