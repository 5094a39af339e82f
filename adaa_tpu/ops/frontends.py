"""Differentiable audio frontends (LFCC / MFCC / mel_spec), TPU-native.

Functional equivalents of the reference's torchaudio transforms
(reference: src/frontends.py):

* ``lfcc``   — LFCC_FN   (src/frontends.py:24-32): n_lfcc=80, n_fft=512,
  win 400, hop 160, 128 linear filters, dB scale, ortho DCT.
* ``mfcc``   — MFCC_FN   (src/frontends.py:13-21): n_mfcc=80, 128 HTK mel
  filters (norm=None), dB scale, ortho DCT.
* ``mel_spec`` — prepare_mel_scale_vector (src/frontends.py:53-79):
  rectangular-window STFT (torch.stft called with no window), 80-bin
  MelScale applied separately to real/imag, stacked (abs, angle)
  2-channel feature.

Everything is jnp + one strided conv -> 2-3 matmuls; XLA fuses the
elementwise tail. All functions map (B, 64600) -> (B, [C,] n_coeff, T)
with T = 404 frames and differentiate w.r.t. the waveform (attacks
backprop through the frontend).
"""
from __future__ import annotations

import os
from typing import Callable, List

import jax
import jax.numpy as jnp

from adaa_tpu.ops import filterbanks as fb
from adaa_tpu.ops import stft as stft_ops


@jax.custom_vjp
def _lfcc_pallas_grad(x: jax.Array) -> jax.Array:
    from adaa_tpu.ops.pallas_lfcc import lfcc_pallas

    return lfcc_pallas(x)


def _lfcc_pallas_fwd(x):
    return _lfcc_pallas_grad(x), x


def _lfcc_pallas_bwd(x, g):
    # gradients recompute through the XLA path (shares the closed-form
    # STFT VJP); value identical to the Pallas forward within fp32 noise
    _, vjp_fn = jax.vjp(lambda xx: _lfcc_xla(xx), x)
    (dx,) = vjp_fn(g)
    return (dx,)


_lfcc_pallas_grad.defvjp(_lfcc_pallas_fwd, _lfcc_pallas_bwd)

SAMPLING_RATE = 16_000
WIN_LENGTH = 400  # 25 ms  (src/frontends.py:8)
HOP_LENGTH = 160  # 10 ms  (src/frontends.py:9)
N_FFT = 512


def lfcc(x: jax.Array, n_lfcc: int = 80, n_filter: int = 128,
         compute: str = "f32") -> jax.Array:
    """(..., L) -> (..., n_lfcc, T). torchaudio.transforms.LFCC equivalent.

    With ``ADAA_PALLAS_FRONTEND=1`` (TPU, canonical 64600-sample input,
    default coefficients) the forward runs the fused Pallas kernel
    (ops/pallas_lfcc.py); gradients recompute through the XLA path via
    custom_vjp, so attacks keep working unchanged.
    """
    if (
        n_lfcc == 80
        and n_filter == 128
        and x.ndim == 2
        and x.shape[-1] == 64_600
        and os.environ.get("ADAA_PALLAS_FRONTEND") == "1"
    ):
        return _lfcc_pallas_grad(x)
    return _lfcc_xla(x, n_lfcc, n_filter, compute)


def _lfcc_xla(x: jax.Array, n_lfcc: int = 80, n_filter: int = 128,
              compute: str = "f32") -> jax.Array:
    spec = stft_ops.spectrogram(
        x, n_fft=N_FFT, hop_length=HOP_LENGTH, win_length=WIN_LENGTH,
        power=2.0, compute=compute,
    )  # (..., F, T)
    filt = jnp.asarray(
        fb.linear_fbanks(
            n_freqs=N_FFT // 2 + 1,
            f_min=0.0,
            f_max=SAMPLING_RATE / 2,
            n_filter=n_filter,
            sample_rate=SAMPLING_RATE,
        )
    )  # (F, n_filter)
    banked = _banked_einsum(spec, filt, compute)
    banked_db = fb.amplitude_to_db_power(banked)
    dct = jnp.asarray(fb.create_dct(n_lfcc, n_filter, norm="ortho"))  # (n_filter, n_lfcc)
    return _dct_einsum(banked_db, dct, compute)


def mfcc(x: jax.Array, n_mfcc: int = 80, n_mels: int = 128,
         compute: str = "f32") -> jax.Array:
    """(..., L) -> (..., n_mfcc, T). torchaudio.transforms.MFCC equivalent."""
    spec = stft_ops.spectrogram(
        x, n_fft=N_FFT, hop_length=HOP_LENGTH, win_length=WIN_LENGTH,
        power=2.0, compute=compute,
    )
    filt = jnp.asarray(
        fb.melscale_fbanks(
            n_freqs=N_FFT // 2 + 1,
            f_min=0.0,
            f_max=SAMPLING_RATE / 2,
            n_mels=n_mels,
            sample_rate=SAMPLING_RATE,
            norm=None,
            mel_scale="htk",
        )
    )
    banked = _banked_einsum(spec, filt, compute)
    banked_db = fb.amplitude_to_db_power(banked)
    dct = jnp.asarray(fb.create_dct(n_mfcc, n_mels, norm="ortho"))
    return _dct_einsum(banked_db, dct, compute)


def _dct_einsum(banked_db, dct, compute):
    """Cepstral DCT; bf16 on the attack-surrogate fast path (the dB
    values are O(10-100), so bf16's ~3 decimal digits keep the logit
    shift within the BENCH_EFFECTIVENESS tolerance), HIGHEST f32 on the
    parity path."""
    if compute == "bf16" and jax.default_backend() != "cpu":
        return jnp.einsum(
            "...mt,mc->...ct", banked_db.astype(jnp.bfloat16),
            dct.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        "...mt,mc->...ct", banked_db, dct, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _banked_einsum(spec, filt, compute):
    """Filterbank projection; bf16 inputs + f32 accumulation in the
    attack-surrogate fast path, HIGHEST-precision f32 otherwise."""
    if compute == "bf16" and jax.default_backend() != "cpu":
        return jnp.einsum(
            "...ft,fm->...mt", spec.astype(jnp.bfloat16),
            filt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        "...ft,fm->...mt", spec, filt, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def prepare_stft_features(x: jax.Array, n_mels: int = 80):
    """Mel-projected complex STFT -> (abs, angle) (src/frontends.py:60-79).

    Note the reference calls ``torch.stft`` *without* a window, i.e. a
    rectangular window of win_length samples — reproduced here.
    """
    real, imag = stft_ops.stft(
        x,
        n_fft=N_FFT,
        hop_length=HOP_LENGTH,
        win_length=WIN_LENGTH,
        window="ones",
    )
    filt = jnp.asarray(
        fb.melscale_fbanks(
            n_freqs=N_FFT // 2 + 1,
            f_min=0.0,
            f_max=SAMPLING_RATE / 2,
            n_mels=n_mels,
            sample_rate=SAMPLING_RATE,
            norm=None,
            mel_scale="htk",
        )
    )
    real_mel = jnp.einsum("...ft,fm->...mt", real, filt, preferred_element_type=jnp.float32)
    imag_mel = jnp.einsum("...ft,fm->...mt", imag, filt, preferred_element_type=jnp.float32)
    abs_mel = jnp.sqrt(real_mel * real_mel + imag_mel * imag_mel)
    angle_mel = jnp.arctan2(imag_mel, real_mel)
    return abs_mel, angle_mel


def mel_spec(x: jax.Array) -> jax.Array:
    """(..., L) -> (..., 2, n_mels, T): stacked (abs, angle) channels."""
    abs_mel, angle_mel = prepare_stft_features(x)
    return jnp.stack([abs_mel, angle_mel], axis=-3)


_FRONTENDS = {
    "lfcc": lfcc,
    "mfcc": mfcc,
    "mel_spec": mel_spec,
}


def get_frontend(
    frontends: List[str], compute: str = "f32"
) -> Callable[[jax.Array], jax.Array]:
    """Dispatch mirroring the reference (src/frontends.py:41-50).

    ``compute="bf16"`` selects the bf16-MXU fast path for the cepstral
    frontends (attack surrogates only — the f32 default is the
    torch.stft-parity path used by evaluations). mel_spec is always
    f32 (abs/angle channels are cheap and phase is rounding-sensitive).
    """
    import functools as _ft

    if "mfcc" in frontends:
        return _ft.partial(mfcc, compute=compute)
    elif "lfcc" in frontends:
        return _ft.partial(lfcc, compute=compute)
    elif "mel_spec" in frontends:
        return mel_spec
    raise ValueError(f"{frontends} frontend is not supported!")
