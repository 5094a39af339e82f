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


def test_trim_matches_numpy_reference():
    """Native trim must equal the numpy gate on representative audio."""
    import importlib

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
    for x in cases:
        nat = native.trim_silence(x, sr)
        # numpy path: temporarily force fallback by calling the pure
        # implementation body via monkeypatched availability
        orig = native.available
        try:
            native.available = lambda: False
            ref, _ = base.apply_trim(x[None, :], sr)
        finally:
            native.available = orig
        np.testing.assert_array_equal(nat, ref[0])
