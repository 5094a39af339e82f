"""Shared flax building blocks with torch-compatible numerics.

The three detectors (LCNN / SpecRNet / RawNet3) must be importable from
torch checkpoints (BASELINE.json requirement), so every layer here
reproduces torch's exact math:

* BatchNorm: eps 1e-5, running-average momentum 0.1 (flax momentum 0.9),
  biased batch variance in normalization.
* LSTM gate order (i, f, g, o), GRU gate order (r, z, n) with the reset
  gate applied to ``W_hn h + b_hn`` (torch convention).
* Parameter init mirrors torch defaults (uniform ±1/sqrt(fan)) so
  from-scratch training behaves comparably.

RNNs are ``lax.scan`` over time with the input projection hoisted into
one big batched matmul (MXU) — the TPU-idiomatic recurrence shape.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# Initializers (torch defaults)
# ---------------------------------------------------------------------------

def uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """torch Conv default: kaiming_uniform(a=sqrt(5)) on (kh, kw, in, out)."""
    fan_in = math.prod(shape[:-1])  # kh * kw * in
    gain = math.sqrt(2.0 / (1 + 5.0))  # a = sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    """torch Linear default on (in, out) kernels."""
    fan_in = shape[0]
    gain = math.sqrt(2.0 / (1 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_init(fan_in: int) -> Callable:
    return uniform_init(1.0 / math.sqrt(fan_in))


# ---------------------------------------------------------------------------
# Elementwise / pooling
# ---------------------------------------------------------------------------

def max_feature_map(x: jax.Array, axis: int = -1) -> jax.Array:
    """MFM maxout over channel halves (reference: src/models/lcnn.py:49-95).

    Channels-last layout: max(x[..., :C/2], x[..., C/2:]).

    The equality-mask backward is the default (same rationale as
    ``_max_pool_1d_eqmask`` below: jnp.maximum's VJP splits the
    cotangent 0.5/0.5 across exact ties via an extra select chain; the
    eqmask form routes g to every tied element instead — identical
    gradients wherever the max is unique). Measured on the flagship
    A/B: 1256 -> 1380 ex/s PGD-10 @b256 together with the pooled form
    below (two-pass, logs/bench_sweep_1787206020.log;
    profile_mfmpool_r5.json has the per-layer rows).
    ``ADAA_MFM_EQMASK=0`` restores the tie-splitting VJP.
    """
    if axis == -1 and os.environ.get("ADAA_MFM_EQMASK") != "0":
        return _max_feature_map_eqmask(x)
    c = x.shape[axis]
    assert c % 2 == 0, "MFM needs an even channel count"
    a, b = jnp.split(x, 2, axis=axis)
    return jnp.maximum(a, b)


@jax.custom_vjp
def _max_feature_map_eqmask(x: jax.Array) -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.maximum(a, b)


def _mfm_eq_fwd(x):
    y = _max_feature_map_eqmask(x)
    return y, (x, y)


def _mfm_eq_bwd(res, g):
    x, y = res
    a, b = jnp.split(x, 2, axis=-1)
    da = jnp.where(a == y, g, jnp.zeros((), g.dtype))
    db = jnp.where(b == y, g, jnp.zeros((), g.dtype))
    return (jnp.concatenate([da, db], axis=-1).astype(x.dtype),)


_max_feature_map_eqmask.defvjp(_mfm_eq_fwd, _mfm_eq_bwd)


def max_pool_2d(x: jax.Array, window: int = 2, stride: int = None) -> jax.Array:
    """torch MaxPool2d with floor mode on NHWC input (discards remainder).

    Implemented as reshape + max instead of ``reduce_window``: the
    gradient of reduce_window is SelectAndScatter, which costs seconds
    per call on TPU; the reshape formulation differentiates as a cheap
    compare-and-select. Requires window == stride (all reference models
    use square non-overlapping pools).

    ``ADAA_POOL_EQMASK`` (default on — the same switch as the 1D pool)
    selects the equality-mask backward: jnp.max's VJP spends an extra
    tie-count+divide pass splitting the cotangent across exact ties;
    the eqmask form routes g to every tied element instead — identical
    gradients wherever the window max is unique (see
    ``_max_pool_1d_eqmask``). SpecRNet is the main user (4 pools on the
    attack hot path; LCNN's pools run through ``mfm_pool_2d``).
    """
    stride = stride or window
    assert window == stride, "non-overlapping pools only"
    if os.environ.get("ADAA_POOL_EQMASK") != "0":
        return _max_pool_2d_eqmask(x, window)
    b, h, w, c = x.shape
    h2, w2 = h // window, w // window
    x = x[:, : h2 * window, : w2 * window, :]
    x = x.reshape(b, h2, window, w2, window, c)
    return x.max(axis=(2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_2d_eqmask(x: jax.Array, window: int) -> jax.Array:
    b, h, w, c = x.shape
    h2, w2 = h // window, w // window
    return (x[:, : h2 * window, : w2 * window, :]
            .reshape(b, h2, window, w2, window, c).max(axis=(2, 4)))


def _eqmask2d_fwd(x, window):
    y = _max_pool_2d_eqmask(x, window)
    return y, (x, y)


def _eqmask2d_bwd(window, res, g):
    x, y = res
    b, h, w, c = x.shape
    h2, w2 = h // window, w // window
    x6 = x[:, : h2 * window, : w2 * window, :].reshape(
        b, h2, window, w2, window, c)
    dx = jnp.where(
        x6 == y[:, :, None, :, None, :],
        g[:, :, None, :, None, :],
        jnp.zeros((), g.dtype),
    ).reshape(b, h2 * window, w2 * window, c)
    if h2 * window < h or w2 * window < w:
        dx = jnp.pad(
            dx, ((0, 0), (0, h - h2 * window), (0, w - w2 * window), (0, 0)))
    return (dx.astype(x.dtype),)


_max_pool_2d_eqmask.defvjp(_eqmask2d_fwd, _eqmask2d_bwd)


def mfm_pool_2d(x: jax.Array, window: int = 2) -> jax.Array:
    """Fused MFM + non-overlapping 2D max pool: one reshape-max.

    max_pool_2d(max_feature_map(x)) computed as a SINGLE max reduce over
    (window, window, half) — max is associative, so the values are
    identical; only exact-tie gradient routing can differ (combined max
    routes once over the 8-candidate set instead of hierarchically).
    Saves the (B, H, W, C/2) MFM intermediate's HBM round-trip in both
    directions on the attack hot path.

    The equality-mask backward over the 8-candidate set is the default
    (see :func:`max_feature_map`; ``ADAA_MFM_EQMASK=0`` restores the
    tie-splitting VJP).
    """
    if window == 2 and os.environ.get("ADAA_MFM_EQMASK") != "0":
        return _mfm_pool_2d_eqmask(x)
    b, h, w, c = x.shape
    assert c % 2 == 0, "MFM needs an even channel count"
    h2, w2 = h // window, w // window
    x = x[:, : h2 * window, : w2 * window, :]
    x = x.reshape(b, h2, window, w2, window, 2, c // 2)
    return x.max(axis=(2, 4, 5))


@jax.custom_vjp
def _mfm_pool_2d_eqmask(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    assert c % 2 == 0, "MFM needs an even channel count"
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :]
    return x.reshape(b, h2, 2, w2, 2, 2, c // 2).max(axis=(2, 4, 5))


def _mfm_pool_eq_fwd(x):
    y = _mfm_pool_2d_eqmask(x)
    return y, (x, y)


def _mfm_pool_eq_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x8 = x[:, : h2 * 2, : w2 * 2, :].reshape(b, h2, 2, w2, 2, 2, c // 2)
    dx = jnp.where(
        x8 == y[:, :, None, :, None, None, :],
        g[:, :, None, :, None, None, :],
        jnp.zeros((), g.dtype),
    ).reshape(b, h2 * 2, w2 * 2, c)
    if h2 * 2 < h or w2 * 2 < w:
        dx = jnp.pad(dx, ((0, 0), (0, h - h2 * 2), (0, w - w2 * 2), (0, 0)))
    return (dx.astype(x.dtype),)


_mfm_pool_2d_eqmask.defvjp(_mfm_pool_eq_fwd, _mfm_pool_eq_bwd)


def max_pool_1d(x: jax.Array, window: int, stride: int = None) -> jax.Array:
    """torch MaxPool1d with floor mode on NLC input (reshape + max —
    see max_pool_2d for why not reduce_window).

    ``ADAA_PALLAS_POOL=1`` routes bf16 pools through the Pallas
    streaming kernel (ops/pallas_pool.py). Off by default: on the real
    v5e it measured a wash against the reshape-max at RawNet3 layer1's
    (64, 6435, 1024) — 12.81 vs 12.84 ms fwd+bwd standalone, 51.7 vs
    51.5 ms for the whole layer (profile_rawnet_r4.json) — both ~3x the
    ~4 ms HBM-traffic floor, so the cost is NOT the relayout the kernel
    removes. Kept as a measured experiment; the f32 parity path never
    uses it.
    """
    stride = stride or window
    assert window == stride, "non-overlapping pools only"
    if (x.dtype == jnp.bfloat16
            and os.environ.get("ADAA_PALLAS_POOL") == "1"
            and jax.default_backend() not in ("cpu",)):
        from adaa_tpu.ops import pallas_pool

        if pallas_pool.supported(x, window):
            return pallas_pool.max_pool_1d(x, window)
    if os.environ.get("ADAA_POOL_EQMASK") != "0":
        return _max_pool_1d_eqmask(x, window)
    b, l, c = x.shape
    l2 = l // window
    x = x[:, : l2 * window, :]
    return x.reshape(b, l2, window, c).max(axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_1d_eqmask(x: jax.Array, window: int) -> jax.Array:
    """reshape-max pool with an equality-mask backward (round 5).

    jnp.max's VJP normalizes the cotangent across exact ties (lax
    reduce-chooser rule), which costs an extra tie-count reduction +
    divide pass over the full (B, L, C) tensor; at RawNet3 layer1's
    (64, 6435, 1024) bf16 that pass is ~40% of the pool's fwd+bwd
    (13.4 -> 8.2 ms measured, profile_pool_r5.json). This backward
    routes g to every element equal to the window max WITHOUT the
    normalization — identical wherever the max is unique (ties on
    continuous activations are measure-zero; torch's MaxPool routes to
    a single argmax on ties, so neither form matches torch there).
    ADAA_POOL_EQMASK=0 restores the tie-splitting jnp.max VJP.
    """
    b, l, c = x.shape
    l2 = l // window
    return x[:, : l2 * window, :].reshape(b, l2, window, c).max(axis=2)


def _eqmask_fwd(x, window):
    y = _max_pool_1d_eqmask(x, window)
    return y, (x, y)


def _eqmask_bwd(window, res, g):
    x, y = res
    b, l, c = x.shape
    l2 = l // window
    x2 = x[:, : l2 * window, :].reshape(b, l2, window, c)
    dx = jnp.where(x2 == y[:, :, None, :], g[:, :, None, :],
                   jnp.zeros((), g.dtype)).reshape(b, l2 * window, c)
    if l2 * window < l:
        dx = jnp.pad(dx, ((0, 0), (0, l - l2 * window), (0, 0)))
    return (dx.astype(x.dtype),)


_max_pool_1d_eqmask.defvjp(_eqmask_fwd, _eqmask_bwd)


# ---------------------------------------------------------------------------
# BatchNorm (torch semantics)
# ---------------------------------------------------------------------------

def torch_batch_norm(affine: bool = True, name: str = None,
                     dtype=None) -> nn.BatchNorm:
    """BatchNorm over the last axis with torch defaults (eps 1e-5,
    running-average momentum 0.1 -> flax momentum 0.9).

    ``affine=False`` variants (LCNN uses BatchNorm2d(affine=False),
    reference src/models/lcnn.py:127-151) carry only running stats.
    Call with ``use_running_average=not train``. ``dtype`` selects the
    computation dtype (params/stats stay float32).
    """
    return nn.BatchNorm(
        use_running_average=None,
        momentum=0.9,
        epsilon=1e-5,
        use_bias=affine,
        use_scale=affine,
        dtype=dtype,
        name=name,
    )


# ---------------------------------------------------------------------------
# Recurrent layers (torch numerics)
# ---------------------------------------------------------------------------

class TorchLSTM(nn.Module):
    """Single-direction LSTM matching torch.nn.LSTM numerics.

    Input (B, T, D) -> output (B, T, H). Gate order (i, f, g, o);
    params named like torch (`weight_ih`, `weight_hh`, `bias_ih`,
    `bias_hh`) but stored transposed — (D, 4H) / (H, 4H) — for
    channels-last matmuls.
    """

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        w_ih = self.param("weight_ih", uniform_init(bound), (d, 4 * h))
        w_hh = self.param("weight_hh", uniform_init(bound), (h, 4 * h))
        b_ih = self.param("bias_ih", uniform_init(bound), (4 * h,))
        b_hh = self.param("bias_hh", uniform_init(bound), (4 * h,))

        # one big MXU matmul for the input projection
        gates_x = jnp.einsum("btd,dg->btg", x, w_ih) + b_ih + b_hh  # (B, T, 4H)
        gates_x = jnp.swapaxes(gates_x, 0, 1)  # (T, B, 4H)
        if self.reverse:
            gates_x = jnp.flip(gates_x, axis=0)

        def step(carry, gx):
            h_prev, c_prev = carry
            g = gx + h_prev @ w_hh
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            gg = jnp.tanh(gg)
            o = jax.nn.sigmoid(o)
            c = f * c_prev + i * gg
            hh = o * jnp.tanh(c)
            return (hh, c), hh

        b = x.shape[0]
        init = (
            jnp.zeros((b, h), x.dtype),
            jnp.zeros((b, h), x.dtype),
        )
        _, ys = jax.lax.scan(step, init, gates_x)
        if self.reverse:
            ys = jnp.flip(ys, axis=0)
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class _LSTMParams(nn.Module):
    """Parameter-only twin of TorchLSTM (same tree: {name}/{weight_ih,
    weight_hh, bias_ih, bias_hh}) so BiLSTM can run both directions in
    one scan without changing the checkpoint layout."""

    hidden_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        d, h = self.in_features, self.hidden_size
        bound = 1.0 / math.sqrt(h)
        return (
            self.param("weight_ih", uniform_init(bound), (d, 4 * h)),
            self.param("weight_hh", uniform_init(bound), (h, 4 * h)),
            self.param("bias_ih", uniform_init(bound), (4 * h,)),
            self.param("bias_hh", uniform_init(bound), (4 * h,)),
        )


class BiLSTM(nn.Module):
    """Bidirectional LSTM, concat outputs — torch.nn.LSTM(bidirectional=True).

    Both directions run in ONE ``lax.scan``: the recurrences share a
    block-diagonal (2H, 8H) hidden weight so each step is a single
    matmul instead of two, and the sequential step count halves — the
    recurrence is latency-bound on TPU (tiny per-step matmuls), so
    fewer, larger steps are strictly faster. The block-diagonal zero
    products add exact 0.0 terms, leaving each direction's math
    bit-identical to the separate-scan form.
    """

    hidden_size: int
    # scan unroll factor. >1 lets XLA overlap the gate elementwise with
    # the next step's matmul (the recurrence is latency-bound: tiny
    # per-step matmuls), but multiplies the differentiated program size
    # — training-path compiles blow past 20 min at 4 — so callers
    # enable it only on the eval/attack fast path. -1 = full unroll
    # (the whole recurrence becomes one straight-line program; at the
    # flagship's T=50 this measures ~2x faster fwd+bwd than unroll=4 —
    # scripts/profiling/profile_tail_r4.json head_u50 vs head_u4).
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = self.hidden_size
        wf = _LSTMParams(h, d, name="fwd")()
        wb = _LSTMParams(h, d, name="bwd")()

        # input projections: one (D, 8H) matmul for both directions
        w_ih = jnp.concatenate([wf[0], wb[0]], axis=1)
        bias = jnp.concatenate([wf[2] + wf[3], wb[2] + wb[3]])
        gx = jnp.einsum("btd,dg->btg", x, w_ih) + bias  # (B, T, 8H)
        gx = jnp.swapaxes(gx, 0, 1)  # (T, B, 8H)
        gates = jnp.concatenate(
            [gx[:, :, : 4 * h], jnp.flip(gx[:, :, 4 * h :], axis=0)],
            axis=-1,
        )

        w_hh = jnp.zeros((2 * h, 8 * h), x.dtype)
        w_hh = w_hh.at[:h, : 4 * h].set(wf[1])
        w_hh = w_hh.at[h:, 4 * h :].set(wb[1])

        b = x.shape[0]

        def step(carry, g_in):
            h_prev, c_prev = carry  # (B, 2, H) each
            g = g_in + h_prev.reshape(b, 2 * h) @ w_hh  # (B, 8H)
            gr = g.reshape(b, 2, 4, h)
            i = jax.nn.sigmoid(gr[:, :, 0])
            f = jax.nn.sigmoid(gr[:, :, 1])
            gg = jnp.tanh(gr[:, :, 2])
            o = jax.nn.sigmoid(gr[:, :, 3])
            c = f * c_prev + i * gg
            hh = o * jnp.tanh(c)
            return (hh, c), hh

        init = (
            jnp.zeros((b, 2, h), x.dtype),
            jnp.zeros((b, 2, h), x.dtype),
        )
        unroll = gates.shape[0] if self.unroll == -1 else self.unroll
        _, ys = jax.lax.scan(step, init, gates, unroll=unroll)
        out = jnp.concatenate(
            [ys[:, :, 0], jnp.flip(ys[:, :, 1], axis=0)], axis=-1
        )
        return jnp.swapaxes(out, 0, 1)  # (B, T, 2H)


class TorchGRU(nn.Module):
    """Single-direction GRU matching torch.nn.GRU numerics.

    Gate order (r, z, n); the reset gate multiplies the *hidden*
    projection of n (torch convention, different from the original
    Cho et al. formulation).
    """

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        w_ih = self.param("weight_ih", uniform_init(bound), (d, 3 * h))
        w_hh = self.param("weight_hh", uniform_init(bound), (h, 3 * h))
        b_ih = self.param("bias_ih", uniform_init(bound), (3 * h,))
        b_hh = self.param("bias_hh", uniform_init(bound), (3 * h,))

        gates_x = jnp.einsum("btd,dg->btg", x, w_ih) + b_ih  # (B, T, 3H)
        gates_x = jnp.swapaxes(gates_x, 0, 1)
        if self.reverse:
            gates_x = jnp.flip(gates_x, axis=0)

        def step(h_prev, gx):
            gh = h_prev @ w_hh + b_hh
            xr, xz, xn = jnp.split(gx, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new, h_new

        b = x.shape[0]
        _, ys = jax.lax.scan(step, jnp.zeros((b, h), x.dtype), gates_x)
        if self.reverse:
            ys = jnp.flip(ys, axis=0)
        return jnp.swapaxes(ys, 0, 1)


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU — torch.nn.GRU(num_layers, bidirectional)."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = x
        for layer in range(self.num_layers):
            fwd = TorchGRU(self.hidden_size, reverse=False, name=f"l{layer}_fwd")(out)
            bwd = TorchGRU(self.hidden_size, reverse=True, name=f"l{layer}_bwd")(out)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        return out
