"""Strided sinc-filterbank convolution with a closed-form VJP.

RawNet3's encoder is a stride-10 k=251 1->256-channel conv over the
raw 64600-sample wave (reference: src/models/rawnet3.py:27-33 via
asteroid_filterbanks ``Encoder(ParamSincFB(...))``). Its *automatic*
input gradient is an input-dilated transposed conv — the known
XLA:TPU pathology this codebase sidesteps everywhere (see
ops/stft.py) — and attacks differentiate through the encoder on every
step. So, like the STFT, the backward is closed form:

    dL/dx[m]  = sum_t G[t, m - t*hop],      G = einsum(g, filters)
    dL/dW[f,n] = sum_{b,t} g[b,t,f] * x[b, t*hop + n]

dx is one (B,T,F)x(F,K) matmul + ceil(K/hop) shifted adds; dW is
ceil(K/hop) skinny matmuls against hop-sized chunks of x. Both are
static-shaped MXU-friendly ops.

Unlike the STFT kernel the filters here are *learnable* (low_hz_ /
band_hz_), so the VJP also produces a filter cotangent — but only on
training paths: attack/eval programs pass ``need_dw=False`` and get a
NaN-filled dW so an accidental eval-mode parameter gradient fails
loudly instead of being silently wrong (same contract as
ops/pallas_layer0.fused_conv0_mfm_pool).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _sinc_conv_fn(stride: int, need_dw: bool, compute: str = "f32",
                  form: str = "conv"):
    """(B, L) x (F, K) -> (B, T, F) strided conv, custom VJP.

    ``compute="bf16"``: conv/dx-einsum inputs in bfloat16 with f32
    accumulation — the attack-surrogate fast path (f32 MXU matmuls
    cost ~6x bf16 on v5e). dW (training) always accumulates from f32
    operands.

    ``form="chunked"`` reformulates the forward on stride-sized
    chunks (same trick as ops/stft.py): x -> (B, R, stride) and the
    stride-``s`` k=251 conv becomes a stride-1 width-``ceil(K/s)``
    conv whose kernel is the (zero-tail-padded) filterbank resliced
    into stride-rows — numerically identical, but avoids the strided
    big-kernel layout XLA:TPU handles poorly. Because the filters are
    learnable the chunked kernel is rebuilt from ``filters`` each
    call (a zero-FLOP pad+transpose+reshape).
    """
    in_dtype = jnp.bfloat16 if compute == "bf16" else jnp.float32

    @jax.custom_vjp
    def sinc_conv(x, filters):
        if form == "chunked":
            b, l = x.shape
            k = filters.shape[1]
            s = stride
            c = -(-k // s)
            t = (l - k) // s + 1
            r = -(-l // s)
            kf = (jnp.pad(filters, ((0, 0), (0, c * s - k)))
                  .T.reshape(c, s, -1).astype(in_dtype))  # (C, s, F) HIO
            ch = jnp.pad(x, ((0, 0), (0, r * s - l)))
            ch = ch.reshape(b, r, s).astype(in_dtype)
            out = jax.lax.conv_general_dilated(
                ch, kf, window_strides=(1,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
            )  # (B, R - C + 1, F)
            return out[:, :t]
        out = jax.lax.conv_general_dilated(
            x[:, None, :].astype(in_dtype),
            filters[:, None, :].astype(in_dtype),  # (F, 1, K) OIH
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )  # (B, F, T)
        return jnp.swapaxes(out, 1, 2)  # (B, T, F)

    def fwd(x, filters):
        return sinc_conv(x, filters), (x, filters)

    def bwd(res, g):
        x, filters = res
        b, l = x.shape
        k = filters.shape[1]
        t = g.shape[1]
        s = stride
        c = -(-k // s)  # hop-chunks per kernel window

        # dx: frame cotangents -> overlap-add of hop-sized chunks.
        # dx[b, r*s+q] = sum_j gg[b, r-j, j, q] — a diagonal sum over
        # (t, j). The first implementation did it as c sequential
        # ``.at[j:j+t].add`` ops (c=26 full passes over a (B,T,s) f32
        # accumulator, ~8 ms of RawNet3's 10.2 ms sinc fwd+bwd); here
        # it is zero-FLOP reshapes: with the frame axis ordered
        # (b, j, t, q) row-major, element (j, t) sits at flat index
        # j*(T+c)+t after padding t to T+c, so re-slicing the merged
        # axis with row stride T+c-1 shifts row j left by j — exactly
        # the diagonal alignment — and one sum over j finishes the job.
        gg = jnp.einsum("btf,fjq->bjtq", g.astype(in_dtype),
                        jnp.pad(filters, ((0, 0), (0, c * s - k)))
                        .reshape(-1, c, s).astype(in_dtype),
                        preferred_element_type=jnp.float32)  # (B,c,T,s)
        gg = gg.astype(in_dtype)  # frame buffer stored at trunk width
        rows = t + c - 1
        gg = jnp.pad(gg, ((0, 0), (0, 0), (0, c), (0, 0)))
        gg = gg.reshape(b, c * (t + c), s)[:, : c * rows]
        dx = (gg.reshape(b, c, rows, s)
              .astype(jnp.float32).sum(axis=1))  # f32 accumulator
        dx = dx.reshape(b, rows * s)
        dx = dx[:, :l] if rows * s >= l else jnp.pad(
            dx, ((0, 0), (0, l - rows * s)))

        if not need_dw:
            return dx, jnp.full_like(filters, jnp.nan)

        # dW[f, j*s + q] = sum_{b,t} g[b,t,f] * xc[b, t + j, q]
        pad_to = (t + c - 1) * s
        xc = jnp.pad(x, ((0, 0), (0, max(0, pad_to - l))))[:, :pad_to]
        xc = xc.reshape(b, t + c - 1, s)
        parts = [
            jnp.einsum("btf,btq->fq", g, xc[:, j : j + t],
                       preferred_element_type=jnp.float32)
            for j in range(c)
        ]
        dw = jnp.concatenate(parts, axis=1)[:, :k]
        return dx, dw

    sinc_conv.defvjp(fwd, bwd)
    return sinc_conv


def sinc_conv(x: jax.Array, filters: jax.Array, stride: int,
              need_dw: bool = True, compute: str = "f32") -> jax.Array:
    """Strided filterbank conv of raw waves.

    Args:
      x: (B, L) float32 waveforms.
      filters: (F, K) filterbank kernels.
      stride: hop between frames.
      need_dw: False on eval/attack paths — the filter cotangent is
        then NaN-filled (fails loudly if consumed).
      compute: "bf16" for bfloat16 conv inputs with f32 accumulation
        (attack-surrogate fast path; CPU has no bf16 dot kernel, so
        the caller downgrades there), "f32" for the parity path.

    Returns:
      (B, T, F), T = (L - K) // stride + 1.
    """
    if compute == "bf16" and jax.default_backend() == "cpu":
        compute = "f32"
    # Chunked forward rides the bf16 fast path (measured A/B:
    # scripts/profiling/profile_sinc_r4.py); ADAA_SINC_CHUNKED=0
    # restores the strided form. The f32 parity path is unchanged.
    form = "chunked" if (
        compute == "bf16"
        and os.environ.get("ADAA_SINC_CHUNKED", "1") != "0"
    ) else "conv"
    return _sinc_conv_fn(stride, bool(need_dw), compute, form)(x, filters)
