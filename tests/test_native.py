"""Native C DSP vs numpy reference equivalence."""
import numpy as np
import pytest

from adaa_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native DSP library not built"
)


def test_normalize_i16():
    pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
    out = native.normalize_i16(pcm)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)


def test_repeat_pad_matches_numpy():
    rng = np.random.default_rng(0)
    for n, cut in [(3, 8), (100, 50), (64600, 64600), (30000, 64600)]:
        x = rng.standard_normal(n).astype(np.float32)
        ref = np.tile(x, int(cut / n) + 1)[:cut] if n < cut else x[:cut]
        out = native.repeat_pad(x, cut)
        np.testing.assert_array_equal(out, ref)


def test_sox_silence_native_matches_python_twin():
    """Native sox-silence state machine must be bit-equal to the pure
    python twin on representative and adversarial audio."""
    from adaa_tpu.data import base

    sr = 16000
    rng = np.random.default_rng(1)
    t = np.arange(sr, dtype=np.float32) / sr
    loud = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    cases = [
        loud,
        np.concatenate([np.zeros(sr, np.float32), loud]),
        np.concatenate([loud[: sr // 2], np.zeros(sr, np.float32),
                        loud[: sr // 2]]),
        np.zeros(sr, np.float32),
        (rng.standard_normal(sr) * 0.2).astype(np.float32),
    ]
    # random multi-segment signals with amplitudes straddling the 1%
    # threshold (exercise restarts, holdoff flushes, window drain)
    for _ in range(10):
        segs = [
            (rng.standard_normal(int(rng.integers(100, 9000)))
             * rng.choice([0.0, 0.003, 0.01, 0.05, 0.4])).astype(np.float32)
            for _ in range(6)
        ]
        cases.append(np.concatenate(segs))

    for x in cases:
        nat = native.sox_silence(x, sr)
        py = base._sox_silence_py(x, sr, 1, 0.2, 0.01, -1, 0.2, 0.01)
        np.testing.assert_array_equal(nat, py)


def test_gsm_roundtrip_properties():
    """GSM 06.10 round trip: frame padding, zero->zero, unity gain and
    high correlation on tonal content, lossy (not identity)."""
    sr = 8000
    t = np.arange(2 * sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 150 * t)
         + 0.2 * np.sin(2 * np.pi * 450 * t)).astype(np.float32)
    y = native.gsm_roundtrip(x, sr)
    assert y.shape[0] == x.shape[0]  # multiple of 160 already
    corr = np.corrcoef(x, y[: x.shape[0]])[0, 1]
    assert corr > 0.98
    gain = np.sqrt(np.mean(y**2) / np.mean(x**2))
    assert 0.8 < gain < 1.2
    assert not np.array_equal(x, y)  # lossy codec

    # zero in -> (near) zero out
    z = native.gsm_roundtrip(np.zeros(400, np.float32), sr)
    assert z.shape[0] == 480  # padded to frame multiple
    assert np.abs(z).max() < 1e-3

    # full phone-call pipeline end-to-end with the codec
    from adaa_tpu.data import base as dsp

    t16 = np.arange(16000) / 16000
    wave = (0.5 * np.sin(2 * np.pi * 220 * t16)).astype(np.float32)[None, :]
    out, out_sr = dsp.process_phone_call(wave, 16000)
    assert out_sr == 8000
    assert out.shape[-1] >= 8000
    assert 0.0 < np.abs(out).max() <= 1.0
