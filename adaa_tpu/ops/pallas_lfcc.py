"""Fused Pallas LFCC kernel (windowed DFT + power + linear filterbank
+ dB + DCT in one VMEM-resident pass).

The XLA path (ops/frontends.lfcc) is a strided conv + two einsums with
HBM-materialized intermediates ((B, 514, 404) DFT output, (B, 128, 404)
filterbank output) — measured ~41 ms forward for batch 64 on v5e. This
kernel computes the whole cepstral pipeline for one batch row per grid
step with all intermediates in VMEM:

  rows4 (4, 408, 160) --auto-pipelined--> VMEM
      -> MXU: y = sum_j rows4[j] @ K[j*hop : (j+1)*hop]   (== frames @ K)
      -> power (408, 257) -> MXU x fbank (257, 128) -> 10*log10
      -> MXU x DCT (128, 128-pad) -> out tile (408, 80)

Framing trick: a frame starting at t*hop spans hop-rows t..t+3, so the
(frames x 640) @ (640 x 514) DFT factorizes into four aligned
(408 x 160) @ (160 x 640) matmuls over shifted row views — mosaic
cannot address sublane-misaligned slices, so the four shifts are
materialized once in XLA (a cheap 4x wave copy) instead of sliced
in-kernel.

The backward reuses the XLA closed-form VJP (ops/stft.py) — attacks
differentiate through the same custom_vjp boundary (ops/frontends.py).
Shapes are specialized to the reference frontend (n_fft 512, hop 160,
win 400, 16 kHz, 404 frames — reference src/frontends.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaa_tpu.ops import filterbanks as fb_lib
from adaa_tpu.ops import stft as stft_ops

N_FFT = 512
HOP = 160
WIN = 400
N_BINS = 257
N_FILTER = 128
N_LFCC = 80
SR = 16_000

FRAMES_TOTAL = 404
FRAMES_PAD = 408  # 8-aligned sublane count
CHUNK = 4 * HOP  # 640
HALF = 384  # lane-aligned half-width for the (real | imag) split
KW = 2 * HALF  # 768


@functools.lru_cache(maxsize=4)
def _constants(filterbank: str = "linear"):
    kern = stft_ops._dft_kernel(N_FFT, WIN, "hann")[:, 0, :]  # (514, 512)
    # real part in lane-aligned cols [0, 384), imag in [384, 768) so the
    # power split needs no lane rotation
    kern_pad = np.zeros((CHUNK, KW), np.float32)  # (640, 768)
    kern_pad[:N_FFT, :N_BINS] = kern[:N_BINS].T
    kern_pad[:N_FFT, HALF : HALF + N_BINS] = kern[N_BINS:].T
    if filterbank == "linear":  # LFCC (torchaudio linear_fbanks)
        filt = fb_lib.linear_fbanks(N_BINS, 0.0, SR / 2, N_FILTER, SR)
    else:  # MFCC (HTK mel, norm=None)
        filt = fb_lib.melscale_fbanks(N_BINS, 0.0, SR / 2, N_FILTER, SR,
                                      norm=None, mel_scale="htk")
    filt_pad = np.zeros((HALF, N_FILTER), np.float32)
    filt_pad[:N_BINS] = filt
    dct = fb_lib.create_dct(N_LFCC, N_FILTER, "ortho")  # (128, 80)
    dct_pad = np.zeros((N_FILTER, 128), np.float32)
    dct_pad[:, :N_LFCC] = dct
    return kern_pad, filt_pad, dct_pad


ROWS_PER_STEP = 2  # batch rows fused per grid step (amortizes overhead)


def _kernel(rows4_ref, kern_ref, filt_ref, dct_ref, out_ref, *, r):
    # y = sum_j rows_j @ K[j*hop:(j+1)*hop]  ==  frames @ K
    y = jnp.zeros((r * FRAMES_PAD, KW), jnp.float32)
    for j in range(4):
        rows_j = rows4_ref[:, j].reshape(r * FRAMES_PAD, HOP)
        y = y + jnp.dot(
            rows_j,
            kern_ref[pl.ds(j * HOP, HOP), :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    real = y[:, :HALF]
    imag = y[:, HALF:]
    power = real * real + imag * imag  # (r*408, 384); cols >= 257 are zero

    banked = jnp.dot(power, filt_ref[:, :], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    db = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(banked, 1e-10))

    cep = jnp.dot(db, dct_ref[:, :], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[:, :, :] = cep[:, :N_LFCC].reshape(r, FRAMES_PAD, N_LFCC)


def _lfcc_tiles(rows4: jax.Array, interpret: bool = False,
                filterbank: str = "linear") -> jax.Array:
    """(B, 4, 408, 160) shifted hop rows -> (B, 408, 80) cepstra."""
    b = rows4.shape[0]
    kern_pad, filt, dct_pad = _constants(filterbank)

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    assert b % ROWS_PER_STEP == 0 or b < ROWS_PER_STEP, b
    r = min(ROWS_PER_STEP, b)
    return pl.pallas_call(
        functools.partial(_kernel, r=r),
        out_shape=jax.ShapeDtypeStruct((b, FRAMES_PAD, N_LFCC), jnp.float32),
        grid=(b // r,),
        in_specs=[
            pl.BlockSpec(
                (r, 4, FRAMES_PAD, HOP),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const_spec(kern_pad.shape),
            const_spec(filt.shape),
            const_spec(dct_pad.shape),
        ],
        out_specs=pl.BlockSpec(
            (r, FRAMES_PAD, N_LFCC),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        rows4,
        jnp.asarray(kern_pad),
        jnp.asarray(filt),
        jnp.asarray(dct_pad),
    )


def lfcc_pallas(x: jax.Array, interpret: bool = False,
                filterbank: str = "linear") -> jax.Array:
    """(B, 64600) wave -> (B, 80, 404) cepstra, fused Pallas forward.

    ``filterbank='linear'`` computes LFCC; ``'mel'`` computes MFCC (the
    pipelines differ only in the filterbank matrix)."""
    assert x.shape[-1] == 64_600, "kernel specialized to the canonical length"
    b = x.shape[0]
    pad = N_FFT // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")  # (B, 65112)
    rows_needed = FRAMES_PAD + 3  # shifts up to j=3
    total = rows_needed * HOP
    xp = jnp.pad(xp, ((0, 0), (0, total - xp.shape[-1])))
    rows = xp.reshape(b, rows_needed, HOP)
    # four shifted views, materialized (mosaic cannot do sublane-
    # misaligned in-kernel slicing)
    rows4 = jnp.stack(
        [rows[:, j : j + FRAMES_PAD, :] for j in range(4)], axis=1
    )  # (B, 4, 408, 160)
    cep = _lfcc_tiles(rows4, interpret=interpret, filterbank=filterbank)
    return jnp.swapaxes(cep[:, :FRAMES_TOTAL, :], 1, 2)  # (B, 80, 404)


def mfcc_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, 64600) wave -> (B, 80, 404) MFCC, fused Pallas forward."""
    return lfcc_pallas(x, interpret=interpret, filterbank="mel")
