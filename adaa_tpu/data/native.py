"""ctypes binding for the native host-DSP library (native/adaa_dsp.cpp).

Auto-builds the shared library on first use when a compiler is present
(``make -C native``); every entry point has a numpy fallback, so the
data layer works without the native build. The semantics intentionally
match adaa_tpu.data.base's numpy implementations (tested equal in
tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

LOGGER = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libadaa_dsp.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception as e:  # pragma: no cover
            LOGGER.info("native DSP build unavailable (%s); using numpy", e)
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:  # pragma: no cover
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.adaa_normalize_i16.argtypes = [i16p, f32p, ctypes.c_int64]
    lib.adaa_sox_silence.argtypes = [
        f32p, ctypes.c_int64, f32p,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int64,
    ]
    lib.adaa_sox_silence.restype = ctypes.c_int64
    lib.adaa_repeat_pad.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def normalize_i16(pcm: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, np.int16)
    out = np.empty(pcm.shape, np.float32)
    lib.adaa_normalize_i16(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.size,
    )
    return out


def sox_silence(
    x: np.ndarray,
    sample_rate: int,
    start_periods: int = 1,
    start_duration_s: float = 0.2,
    start_threshold: float = 0.01,
    stop_periods: int = -1,
    stop_duration_s: float = 0.2,
    stop_threshold: float = 0.01,
) -> Optional[np.ndarray]:
    """Native sox `silence` effect (exact silence.c state machine); see
    adaa_tpu.data.base.sox_silence for the semantics/python twin."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    out = np.empty_like(x)
    kept = lib.adaa_sox_silence(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        start_periods,
        int(start_duration_s * sample_rate + 0.5),
        start_threshold,
        stop_periods,
        int(stop_duration_s * sample_rate + 0.5),
        stop_threshold,
        sample_rate // 50,
    )
    return out[:kept].copy()


def gsm_roundtrip(x: np.ndarray, sample_rate: int) -> Optional[np.ndarray]:
    """GSM 06.10 encode+decode round trip via the native library;
    None when the library (or the symbol, for older builds) is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "adaa_gsm_roundtrip"):
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.adaa_gsm_roundtrip.argtypes = [f32p, ctypes.c_int64, f32p]
    lib.adaa_gsm_roundtrip.restype = ctypes.c_int64
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    # GSM operates on whole 160-sample frames; sox/ffmpeg zero-pad the
    # final partial frame, so the output is padded up to a multiple
    n_out = -(-x.size // 160) * 160
    out = np.zeros(n_out, np.float32)
    wrote = lib.adaa_gsm_roundtrip(
        x.ctypes.data_as(f32p), x.size, out.ctypes.data_as(f32p)
    )
    if wrote < 0:  # pragma: no cover
        return None
    return out[:wrote].copy()


def flac_decode(path_or_bytes) -> Optional[tuple]:
    """Decode a FLAC file/buffer via the native decoder.

    Returns (float32 (C, T) in [-1, 1], sample_rate) like
    base.load_audio, or None when the library (or symbol) is absent or
    the stream cannot be parsed. Reference decode site:
    src/datasets/base_dataset.py:165 (torchaudio.load on ASVspoof2021-DF
    flac files).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "adaa_flac_decode"):
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        raw = Path(path_or_bytes).read_bytes()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.adaa_flac_decode.argtypes = [
        u8p, ctypes.c_int64, i32p, ctypes.c_int64, i64p,
    ]
    lib.adaa_flac_decode.restype = ctypes.c_int64
    buf = np.frombuffer(raw, np.uint8)
    meta = np.zeros(4, np.int64)
    total = lib.adaa_flac_decode(
        buf.ctypes.data_as(u8p), buf.size, None, 0,
        meta.ctypes.data_as(i64p),
    )
    if total < 0:
        return None
    channels, srate, bps = int(meta[0]), int(meta[1]), int(meta[2])
    # The metadata pass returns an exact per-channel sample count even
    # when STREAMINFO omits total_samples (the C decoder walks the frame
    # chain in counting-only mode), so the capacity is never a guess.
    cap = int(total)
    out = np.empty(cap * channels, np.int32)
    n = lib.adaa_flac_decode(
        buf.ctypes.data_as(u8p), buf.size,
        out.ctypes.data_as(i32p), out.size,
        meta.ctypes.data_as(i64p),
    )
    if n < 0:
        return None
    pcm = out[: n * channels].reshape(-1, channels).T
    scale = np.float32(1 << (bps - 1))
    return (pcm.astype(np.float32) / scale, srate)


def repeat_pad(x: np.ndarray, cut: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    out = np.empty(cut, np.float32)
    lib.adaa_repeat_pad(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cut,
    )
    return out
