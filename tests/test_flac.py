"""Native FLAC decoder (native/adaa_dsp.cpp) round-trip tests.

Streams are produced by the spec-conformant test encoder
(tests/oracles/flac_writer.py) covering every subframe type, residual
coding mode, and stereo decorrelation the decoder supports; decode must
reproduce the PCM exactly. End-to-end: data/base.load_audio decodes a
.flac from disk (the ASVspoof2021-DF decode path, reference
src/datasets/base_dataset.py:165).
"""
import numpy as np
import pytest

from adaa_tpu.data import native
from tests.oracles.flac_writer import encode_flac

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _pcm(rng, n=5000, amp=3000):
    # correlated signal so fixed/LPC predictors get realistic residuals
    x = np.cumsum(rng.standard_normal(n))
    x = (x / np.abs(x).max() * amp).astype(np.int64)
    return x


def _roundtrip(pcm, **kw):
    stream = encode_flac(pcm, **kw)
    got = native.flac_decode(stream)
    assert got is not None
    audio, sr = got
    bps = kw.get("bps", 16)
    scale = float(1 << (bps - 1))
    want = np.asarray(pcm, np.float32) / scale
    if want.ndim == 1:
        want = want[None, :]
    else:
        want = want.T
    np.testing.assert_array_equal(audio, want.astype(np.float32))
    assert sr == kw.get("sample_rate", 16000)


class TestSubframes:
    def test_verbatim(self, rng):
        _roundtrip(_pcm(rng), kind="verbatim")

    def test_constant(self, rng):
        _roundtrip(np.full(4000, -123, np.int64), kind="constant")

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, rng, order):
        _roundtrip(_pcm(rng), kind="fixed", order=order)

    def test_fixed_partitions(self, rng):
        _roundtrip(_pcm(rng, n=8192), kind="fixed", order=2,
                   partition_order=3, blocksize=4096)

    def test_rice2(self, rng):
        _roundtrip(_pcm(rng), kind="fixed", order=1, rice2=True)

    def test_escape_partition(self, rng):
        _roundtrip(_pcm(rng, n=4096), kind="fixed", order=2,
                   partition_order=2, escape_part=1, blocksize=4096)

    def test_lpc(self, rng):
        _roundtrip(_pcm(rng), kind="lpc", lpc_coefs=[60, -30, 2],
                   lpc_shift=5)

    def test_multi_frame(self, rng):
        _roundtrip(_pcm(rng, n=10000), kind="fixed", order=2,
                   blocksize=1024)

    def test_8bit(self, rng):
        _roundtrip(_pcm(rng, amp=100), kind="verbatim", bps=8)


class TestStereo:
    def _stereo(self, rng, n=4000):
        l = _pcm(rng, n)
        r = (l * 0.7).astype(np.int64) + rng.integers(-50, 50, n)
        return np.stack([l, r], axis=1)

    def test_independent(self, rng):
        _roundtrip(self._stereo(rng), kind="fixed", order=2)

    def test_left_side(self, rng):
        _roundtrip(self._stereo(rng), kind="fixed", order=2,
                   stereo_mode="left-side")

    def test_mid_side(self, rng):
        _roundtrip(self._stereo(rng), kind="fixed", order=2,
                   stereo_mode="mid-side")


class TestLoadAudio:
    def test_load_audio_flac(self, rng, tmp_path):
        from adaa_tpu.data import base

        pcm = _pcm(rng, n=16000)
        path = tmp_path / "sample.flac"
        path.write_bytes(encode_flac(pcm, kind="lpc",
                                     lpc_coefs=[50, -20], lpc_shift=5))
        audio, sr = base.load_audio(path)
        assert sr == 16000
        assert audio.shape == (1, 16000)
        np.testing.assert_array_equal(
            audio[0], (pcm / 32768.0).astype(np.float32))

    def test_garbage_rejected(self):
        assert native.flac_decode(b"fLaCgarbage") is None
        assert native.flac_decode(b"not flac at all") is None

    def test_omitted_total_samples(self, rng):
        # STREAMINFO total_samples == 0 is legal ("unknown"); the
        # metadata pass must count frames so capacity is exact.
        pcm = _pcm(rng, n=9000)
        stream = encode_flac(pcm, kind="fixed", order=2,
                             blocksize=1024, omit_total=True)
        got = native.flac_decode(stream)
        assert got is not None
        audio, sr = got
        np.testing.assert_array_equal(
            audio[0], (pcm / 32768.0).astype(np.float32))

    def test_constant_silence_omitted_total(self):
        # Constant subframes compress far past any fixed ratio guess;
        # with total unknown this used to overflow the capacity
        # heuristic and surface as "cannot decode".
        pcm = np.zeros(500_000, np.int64)
        stream = encode_flac(pcm, kind="constant", blocksize=4096,
                             omit_total=True)
        got = native.flac_decode(stream)
        assert got is not None
        assert got[0].shape == (1, 500_000)
        assert np.all(got[0] == 0.0)

    def test_multichannel_rejected(self, rng):
        # The decoder implements mono/stereo only; a stream whose
        # STREAMINFO claims 3 channels must be rejected up front, not
        # decoded into an unallocated second channel buffer.
        pcm = _pcm(rng, n=2000)
        stream = bytearray(encode_flac(pcm, kind="verbatim"))
        # STREAMINFO body starts at byte 8; channels-1 is the 3 bits
        # at bit offset 100 (bits 4-6 of body byte 12 = file byte 20).
        assert (stream[20] >> 1) & 0x7 == 0  # mono encoded
        stream[20] |= 0x2 << 1  # claim channels-1 == 2
        assert native.flac_decode(bytes(stream)) is None
