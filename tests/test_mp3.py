"""MP3 decode path (adaa_tpu/data/mp3.py, system libmpg123/libmp3lame).

Round-trip fixtures are real MP3 streams produced by libmp3lame, so
the decoder is exercised against an independent encoder. End-to-end:
the FakeAVCeleb mini-corpus (reference
src/datasets/fakeavceleb_dataset.py:16-93 decodes .mp3 at
base_dataset.py:165) loads through the manifest + canonical
preprocessing with no optional Python dependency.
"""
import numpy as np
import pytest

from adaa_tpu.data import mp3

pytestmark = pytest.mark.skipif(
    not mp3.available() or mp3._load_lame() is None,
    reason="system mp3 codec libraries unavailable",
)

SR = 16_000


def _sine(freq=440.0, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


class TestRoundTrip:
    def test_mono_sine(self):
        wave = _sine(440.0)
        stream = mp3.mp3_encode(wave, SR)
        assert stream is not None and len(stream) > 1000
        got = mp3.mp3_decode(stream)
        assert got is not None
        audio, sr = got
        assert sr == SR
        assert audio.shape[0] == 1
        # mp3 is lossy and adds encoder/decoder delay; length within
        # a few frames and the dominant tone preserved
        assert abs(audio.shape[1] - wave.size) < 4 * 1152
        assert abs(_dominant_freq(audio[0], sr) - 440.0) < 5.0
        assert 0.3 < np.abs(audio).max() < 0.7

    def test_stereo(self):
        left = _sine(300.0)
        right = _sine(600.0)
        stream = mp3.mp3_encode(np.stack([left, right]), SR)
        got = mp3.mp3_decode(stream)
        assert got is not None
        audio, sr = got
        assert audio.shape[0] == 2
        assert abs(_dominant_freq(audio[0], sr) - 300.0) < 5.0
        assert abs(_dominant_freq(audio[1], sr) - 600.0) < 5.0

    def test_waveform_correlation(self):
        rng = np.random.default_rng(0)
        wave = np.convolve(rng.standard_normal(SR), np.ones(8) / 8.0,
                           "same").astype(np.float32) * 0.2
        stream = mp3.mp3_encode(wave, SR, bitrate_kbps=192)
        audio, sr = mp3.mp3_decode(stream)
        dec = audio[0]
        # align by cross-correlation (codec delay), then require high
        # correlation over the overlap
        n = min(len(dec), wave.size)
        lags = range(0, 4000)
        best = max(
            lags,
            key=lambda l: np.dot(dec[l:l + SR // 2], wave[: SR // 2]),
        )
        a = dec[best:best + SR // 2]
        b = wave[: SR // 2]
        r = np.corrcoef(a, b)[0, 1]
        assert r > 0.9, f"aligned correlation {r:.3f} (lag {best}, n={n})"

    def test_garbage_rejected(self):
        assert mp3.mp3_decode(b"not an mp3 stream at all" * 10) is None

    def test_file_path_decode(self, tmp_path):
        wave = _sine(500.0)
        p = tmp_path / "a.mp3"
        p.write_bytes(mp3.mp3_encode(wave, SR))
        audio, sr = mp3.mp3_decode(p)
        assert sr == SR and audio.shape[0] == 1


@pytest.fixture(scope="module")
def fakeavceleb_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("FakeAVCeleb_v1.2")
    audio_root = root / "FakeAVCeleb-audio"
    rows = ["source,target1,method,category,type,race,gender,filename,path"]
    rng = np.random.default_rng(3)
    for i in range(6):
        sub = f"RealVideo-FakeAudio/African/men/id{i:05d}"
        path = audio_root / sub
        path.mkdir(parents=True, exist_ok=True)
        wave = _sine(200.0 + 40 * i, seconds=0.6)
        wave = wave + 0.01 * rng.standard_normal(wave.size).astype(np.float32)
        (path / f"fake_{i}.mp3").write_bytes(mp3.mp3_encode(wave, SR))
        rows.append(
            f"id{i:05d},id{i + 1:05d},rtvc,C,RealVideo-FakeAudio,African,"
            f"men,fake_{i}.mp4,FakeAVCeleb/{sub}"
        )
    for i in range(6):
        sub = f"RealVideo-RealAudio/African/men/id{i:05d}"
        path = audio_root / sub
        path.mkdir(parents=True, exist_ok=True)
        wave = _sine(800.0 + 40 * i, seconds=0.6)
        (path / f"real_{i}.mp3").write_bytes(mp3.mp3_encode(wave, SR))
        rows.append(
            f"id{i:05d},-,real,A,RealVideo-RealAudio,African,"
            f"men,real_{i}.mp4,FakeAVCeleb/{sub}"
        )
    (audio_root / "meta_data.csv").write_text("\n".join(rows) + "\n")
    return root


class TestFakeAVCelebEndToEnd:
    def test_decode_through_dataset(self, fakeavceleb_root):
        from adaa_tpu.data.datasets import FakeAVCelebDataset

        ds = FakeAVCelebDataset(fakeavceleb_root, subset="train")
        assert len(ds) > 0
        wave, sr, label = ds[0][:3]
        wave = np.asarray(wave)
        assert sr == SR
        assert wave.ndim >= 1 and np.isfinite(wave).all()
        assert np.abs(wave).max() > 0.01  # decoded real audio, not silence

    def test_loader_end_to_end(self, fakeavceleb_root):
        from adaa_tpu.data.datasets import FakeAVCelebDataset
        from adaa_tpu.data.loader import DataLoader

        ds = FakeAVCelebDataset(fakeavceleb_root, subset="train")
        loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)
        batch = next(iter(loader))
        assert batch[0].shape[0] == 2
        assert np.isfinite(np.asarray(batch[0])).all()
