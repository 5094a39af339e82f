"""Short-time Fourier transform with torch.stft conventions, TPU-first.

The reference's frontends are torchaudio transforms over ``torch.stft``
(reference: src/frontends.py:13-38,60-79). For bit-level convention
parity we reproduce:

* ``center=True`` reflect padding with ``n_fft // 2`` on both sides,
* window of ``win_length`` zero-padded symmetrically to ``n_fft``
  (left pad ``(n_fft - win_length) // 2``),
* onesided output with ``n_fft // 2 + 1`` bins,
* no normalization.

Design: instead of an FFT (XLA's small-size FFTs underutilize the TPU),
the windowed DFT is expressed as a single strided convolution whose
kernel is ``window * [cos | -sin]`` — one ``lax.conv_general_dilated``
that lands straight on the MXU and differentiates cleanly (attacks need
d(frontend)/d(wave)). For a 64600-sample wave this is a
(B,1,65112) x (514,1,512)/stride-160 conv -> (B,514,404).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window — matches ``torch.hann_window(periodic=True)``."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return w.astype(dtype)


def _padded_window(window: Optional[np.ndarray], n_fft: int, win_length: int) -> np.ndarray:
    """Zero-pad the window to n_fft, centered (torch.stft semantics)."""
    if window is None:
        window = np.ones(win_length, dtype=np.float32)
    assert window.shape == (win_length,)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[left : left + win_length] = window.astype(np.float64)
    return out


@functools.lru_cache(maxsize=16)
def _dft_kernel(n_fft: int, win_length: int, window_kind: str) -> np.ndarray:
    """Windowed real-DFT kernel, shape (2 * n_bins, 1, n_fft).

    Rows [0, n_bins) produce the real part, rows [n_bins, 2*n_bins) the
    imaginary part. Window is folded into the kernel.
    """
    if window_kind == "hann":
        window = hann_window(win_length)
    elif window_kind == "ones":
        window = None
    else:
        raise ValueError(f"unknown window kind {window_kind!r}")
    w = _padded_window(window, n_fft, win_length)  # (n_fft,) float64
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    f = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(f, n) / n_fft  # (n_bins, n_fft)
    real = np.cos(ang) * w[None, :]
    imag = -np.sin(ang) * w[None, :]
    kern = np.concatenate([real, imag], axis=0)[:, None, :]  # (2F, 1, n_fft)
    return kern.astype(np.float32)


def frame_count(length: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    if center:
        length = length + 2 * (n_fft // 2)
    return 1 + (length - n_fft) // hop_length


@functools.lru_cache(maxsize=16)
def _windowed_dft_fn(n_fft: int, hop_length: int, win_length: int,
                     window: str, compute: str = "f32",
                     form: str = "conv"):
    """Strided windowed-DFT (B, Lp) -> (B, 2F, T) with a custom VJP.

    Forward is one strided conv (good MXU code on TPU). The *automatic*
    backward of that conv is an input-dilated transposed conv, which
    XLA:TPU compiles and runs catastrophically slowly — so the VJP is
    closed form instead:

        dL/dxp[m] = sum_t G[t, m - t*hop],  G = einsum(g, K)

    i.e. one (B,2F,T)x(2F,n_fft) matmul followed by an overlap-add of
    hop-sized chunks implemented as ceil(n_fft/hop) shifted adds —
    all cheap, static-shaped ops.

    ``form="chunked"`` (bf16 fast-path default) reformulates both
    directions on hop-sized chunks: the wave is reshaped to
    (B, R, hop) and the stride-``hop`` big-kernel conv becomes a
    stride-1 width-``ceil(n_fft/hop)`` conv whose kernel is the DFT
    matrix resliced into hop-rows — numerically the same windowed DFT
    (the kernel tail past n_fft is zero), but XLA:TPU lays it out
    straight onto the MXU instead of relaying the strided big-kernel
    form. The backward is the mirror full-correlation width-``C``
    conv of the frame cotangents with the transposed kernel — the
    overlap-add falls out of the conv itself, no shifted adds.
    Measured A/B at batch 256 (scripts/profiling/profile_stft_r4.py):
    DFT+mag2 fwd+bwd 2.74 ms chunked-bf16 vs 5.00 ms strided-bf16.
    """
    kern_np = _dft_kernel(n_fft, win_length, window)  # (2F, 1, n_fft)
    kern2d_np = kern_np[:, 0, :]  # (2F, n_fft)
    # compute="bf16": MXU-native bf16 inputs with f32 accumulation —
    # the attack-surrogate fast path (see frontends.lfcc); "f32" is the
    # parity-exact default (HIGHEST matches torch.stft to fp32 noise).
    # CPU's dot runtime has no bf16 x bf16 -> f32 kernel, so the fast
    # path is TPU-only; the caller downgrades compute to "f32" on CPU
    # per call (keeping the backend check out of this cached closure,
    # which would otherwise go stale if the platform changed).
    bf16 = compute == "bf16"
    in_dtype = jnp.bfloat16 if bf16 else jnp.float32
    prec = None if bf16 else jax.lax.Precision.HIGHEST

    if form == "chunked":
        s = hop_length
        c = -(-n_fft // s)  # kernel width in hop-chunks
        flat = np.zeros((c * s, kern2d_np.shape[0]), np.float32)
        flat[:n_fft] = kern2d_np.T  # (C*hop, 2F), zero tail
        kf_np = flat.reshape(c, s, -1)  # (C, hop, 2F) HIO
        # backward kernel: flipped taps, (C, 2F, hop) HIO
        kb_np = np.ascontiguousarray(kf_np[::-1].transpose(0, 2, 1))

        @jax.custom_vjp
        def windowed_dft(xp):
            b, lp = xp.shape
            t = frame_count(lp, n_fft, hop_length, center=False)
            r = -(-lp // s)
            ch = jnp.pad(xp, ((0, 0), (0, r * s - lp)))
            ch = ch.reshape(b, r, s).astype(in_dtype)
            out = jax.lax.conv_general_dilated(
                ch, jnp.asarray(kf_np).astype(in_dtype),
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NCH"),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (B, 2F, R - C + 1)
            out = out[:, :, :t]
            return out.astype(in_dtype) if bf16 else out

        def fwd(xp):
            return windowed_dft(xp), (xp.shape[0], xp.shape[1])

        def bwd(res, g):
            b, lp = res
            t = g.shape[-1]
            gt = jnp.transpose(g, (0, 2, 1)).astype(in_dtype)  # (B,T,2F)
            dch = jax.lax.conv_general_dilated(
                gt, jnp.asarray(kb_np).astype(in_dtype),
                window_strides=(1,), padding=((c - 1, c - 1),),
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (B, T + C - 1, hop)
            dxp = dch.reshape(b, -1)
            if dxp.shape[1] >= lp:
                dxp = dxp[:, :lp]
            else:
                dxp = jnp.pad(dxp, ((0, 0), (0, lp - dxp.shape[1])))
            return (dxp,)

        windowed_dft.defvjp(fwd, bwd)
        return windowed_dft

    @jax.custom_vjp
    def windowed_dft(xp):
        out = jax.lax.conv_general_dilated(
            xp[:, None, :].astype(in_dtype),
            jnp.asarray(kern_np).astype(in_dtype),
            window_strides=(hop_length,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (B, 2F, T)
        # bf16 fast path: accumulate f32 but STORE bf16 (the convert
        # fuses into the conv epilogue) — downstream consumers run in
        # bf16 anyway, and the f32 (B, 514, 404) spectrum is ~213 MB of
        # HBM per batch-256 step
        return out.astype(in_dtype) if bf16 else out

    def fwd(xp):
        return windowed_dft(xp), (xp.shape[0], xp.shape[1])

    def bwd(res, g):
        b, lp = res
        t = g.shape[-1]
        s = hop_length
        c = -(-n_fft // s)  # chunks per frame
        gg = jnp.einsum(
            "bft,fn->btn", g.astype(in_dtype),
            jnp.asarray(kern2d_np).astype(in_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (B, T, n_fft)
        gg = jnp.pad(gg, ((0, 0), (0, 0), (0, c * s - n_fft)))
        gg = gg.reshape(b, t, c, s)
        rows = t + c - 1
        acc = jnp.zeros((b, rows, s), gg.dtype)
        for j in range(c):
            acc = acc.at[:, j : j + t].add(gg[:, :, j])
        dxp = acc.reshape(b, rows * s)
        if rows * s >= lp:
            dxp = dxp[:, :lp]
        else:  # pragma: no cover — rows*s >= lp by construction
            dxp = jnp.pad(dxp, ((0, 0), (0, lp - rows * s)))
        return (dxp,)

    windowed_dft.defvjp(fwd, bwd)
    return windowed_dft


def stft(
    x: jax.Array,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    compute: str = "f32",
) -> Tuple[jax.Array, jax.Array]:
    """Real STFT of a batch of waves.

    Args:
      x: (..., L) float waveforms.
      window: "hann" (torchaudio Spectrogram default) or "ones"
        (``torch.stft`` called without a window, as the reference's
        mel_spec frontend does — src/frontends.py:64-70).

    Returns:
      (real, imag), each (..., n_fft // 2 + 1, n_frames).
    """
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    x2 = x.reshape((-1, length)).astype(jnp.float32)

    if center:
        pad = n_fft // 2
        x2 = jnp.pad(x2, ((0, 0), (pad, pad)), mode=pad_mode)

    if compute == "bf16" and jax.default_backend() == "cpu":
        compute = "f32"  # no bf16 dot kernel on CPU; checked per call
    # The chunked formulation rides the bf16 fast path only: the f32
    # path is the parity-exact reference (torch.stft golden tests) and
    # is kept in the strided-conv form it was validated in.
    form = "chunked" if (
        compute == "bf16" and os.environ.get("ADAA_STFT_CHUNKED", "1") != "0"
    ) else "conv"
    out = _windowed_dft_fn(
        n_fft, hop_length, win_length, window, compute, form
    )(x2)

    n_bins = n_fft // 2 + 1
    n_frames = out.shape[-1]
    real = out[:, :n_bins, :]
    imag = out[:, n_bins:, :]
    return (
        real.reshape(batch_shape + (n_bins, n_frames)),
        imag.reshape(batch_shape + (n_bins, n_frames)),
    )


def spectrogram(
    x: jax.Array,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    power: float = 2.0,
    compute: str = "f32",
) -> jax.Array:
    """``torchaudio.transforms.Spectrogram`` equivalent (power spectrum).

    Hann window, center/reflect, no normalization. Returns
    (..., n_fft // 2 + 1, n_frames).
    """
    real, imag = stft(
        x, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window="hann", compute=compute,
    )
    if real.dtype == jnp.bfloat16:
        # square in f32, store bf16: the filterbank matmul consumes the
        # spectrum in bf16 regardless (frontends._banked_einsum), so
        # rounding here loses nothing over the f32-store + cast-at-
        # matmul it replaces, and halves the HBM traffic of this pass
        r32, i32 = real.astype(jnp.float32), imag.astype(jnp.float32)
        mag2 = (r32 * r32 + i32 * i32).astype(jnp.bfloat16)
    else:
        mag2 = real * real + imag * imag
    if power == 2.0:
        return mag2
    return jnp.power(jnp.sqrt(mag2).astype(jnp.float32), power)
