"""Integration tests for the real dataset manifests over a generated
mini-corpus (the reference assumes the full ASVspoof/WaveFake/
FakeAVCeleb trees; here we synthesize directory structures).

WaveFake uses wav and ASVspoof2021-DF flac — both decodable natively
(flac via native/adaa_dsp.cpp, streams generated with the test encoder
in tests/oracles/flac_writer.py). FakeAVCeleb decode-level coverage
lives in tests/test_mp3.py (system libmpg123 via adaa_tpu/data/mp3.py).
"""
import numpy as np
import pytest
from scipy.io import wavfile

from adaa_tpu.data.datasets import (
    DeepFakeASVSpoofDataset,
    FakeAVCelebDataset,
    WaveFakeDataset,
)
from adaa_tpu.data.detection import DetectionDataset
from adaa_tpu.data.loader import DataLoader

SR = 16_000


def _write_wav(path, seconds=0.5, freq=220.0, seed=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    wave = 0.4 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(len(t))
    wavfile.write(path, SR, (wave * 32767).astype(np.int16))


@pytest.fixture(scope="module")
def wavefake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("WaveFake")
    # two vocoder dirs + both real sources; more spoof than bonafide,
    # like the real corpus (oversample assumes it — detection.py mirrors
    # the reference's NotImplementedError otherwise)
    for i in range(12):
        _write_wav(root / "generated_audio" / "ljspeech_melgan" /
                   f"LJ0{i:02d}_gen.wav", seed=i)
        _write_wav(root / "generated_audio" / "ljspeech_hifiGAN" /
                   f"LJ1{i:02d}_gen.wav", seed=100 + i)
    for i in range(8):
        _write_wav(root / "real_audio" / "jsut_ver1.1" / "basic5000" / "wav" /
                   f"JSUT{i}.wav", seed=200 + i)
        _write_wav(root / "real_audio" / "LJSpeech-1.1" / "wavs" /
                   f"LJR{i}.wav", seed=300 + i)
    return root


@pytest.fixture(scope="module")
def asvspoof_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ASVspoofDF")
    flac_dir = (root / "ASVspoof2021_DF_eval_part00" / "ASVspoof2021_DF_eval"
                / "flac")
    flac_dir.mkdir(parents=True)
    from adaa_tpu.data import native
    from tests.oracles.flac_writer import encode_flac

    rng = np.random.default_rng(7)
    lines = []
    for i in range(20):
        name = f"DF_E_{i:07d}"
        if native.available():
            pcm = np.cumsum(rng.standard_normal(SR // 2))
            pcm = (pcm / np.abs(pcm).max() * 3000).astype(np.int64)
            (flac_dir / f"{name}.flac").write_bytes(
                encode_flac(pcm, sample_rate=SR, kind="fixed", order=2))
        else:  # pragma: no cover - manifest-only fallback
            (flac_dir / f"{name}.flac").write_bytes(b"fLaC-placeholder")
        label = "bonafide" if i % 2 else "spoof"
        lines.append(f"LA_0001 {name} nocodec asvspoof A00 {label} notrim eval")
    keys = root / "keys" / "CM"
    keys.mkdir(parents=True)
    (keys / "trial_metadata.txt").write_text("\n".join(lines) + "\n")
    return root


class TestWaveFakeReal:
    def test_manifest_and_splits(self, wavefake_root):
        subsets = {s: WaveFakeDataset(wavefake_root, subset=s)
                   for s in ("train", "test", "val")}
        all_paths = set()
        for s, ds in subsets.items():
            paths = set(str(p) for p in ds.samples["path"])
            assert not paths & all_paths, "split overlap"
            all_paths |= paths
            assert set(ds.samples["label"]) <= {"bonafide", "spoof"}
        assert len(all_paths) == 24 + 16

    def test_attack_types_from_dirs(self, wavefake_root):
        ds = WaveFakeDataset(wavefake_root, subset="train")
        fake = ds.samples[ds.samples["label"] == "spoof"]
        assert set(fake["attack_type"]) <= {"melgan", "hifiGAN"}

    def test_decode_and_preprocess(self, wavefake_root):
        ds = WaveFakeDataset(wavefake_root, subset="train")
        wave, sr, label = ds[0]
        assert wave.shape == (64_600,)
        assert sr == SR
        assert label in (0, 1)

    def test_loader_end_to_end(self, wavefake_root):
        ds = WaveFakeDataset(wavefake_root, subset="train")
        ds.return_meta = True
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=2, seed=0)
        batch = next(iter(loader))
        assert batch[0].shape == (4, 64_600)
        assert len(batch[3][1]) == 4  # meta paths

    def test_deterministic_splits_across_instances(self, wavefake_root):
        a = WaveFakeDataset(wavefake_root, subset="val")
        b = WaveFakeDataset(wavefake_root, subset="val")
        assert list(map(str, a.samples["path"])) == \
            list(map(str, b.samples["path"]))


class TestASVSpoofManifest:
    def test_protocol_parse_and_split(self, asvspoof_root):
        subsets = {s: DeepFakeASVSpoofDataset(asvspoof_root, subset=s)
                   for s in ("train", "test", "val")}
        all_names = set()
        for ds in subsets.values():
            names = set(ds.samples["sample_name"])
            assert not names & all_names
            all_names |= names
        assert len(all_names) == 20

    def test_labels(self, asvspoof_root):
        ds = DeepFakeASVSpoofDataset(asvspoof_root, subset="train")
        assert set(ds.samples["label"]) == {"bonafide", "spoof"}

    def test_flac_decode_end_to_end(self, asvspoof_root):
        from adaa_tpu.data import native

        if not native.available():
            pytest.skip("native library unavailable")
        ds = DeepFakeASVSpoofDataset(asvspoof_root, subset="train")
        wave, sr, label = ds[0]
        assert wave.shape == (64_600,)
        assert sr == SR
        assert np.isfinite(wave).all() and np.abs(wave).max() > 0


class TestDetectionUnion:
    def test_union_and_oversample(self, wavefake_root):
        ds = DetectionDataset(
            wavefake_path=wavefake_root, subset="train", oversample=True
        )
        counts = ds.samples["label"].value_counts()
        assert counts["bonafide"] == counts["spoof"], \
            "oversampling must balance classes"

    def test_reduced_number(self, wavefake_root):
        ds = DetectionDataset(
            wavefake_path=wavefake_root, subset="train", reduced_number=5
        )
        assert len(ds) == 5

    def test_undersample(self, wavefake_root):
        ds = DetectionDataset(
            wavefake_path=wavefake_root, subset="train",
            oversample=False, undersample=True,
        )
        counts = ds.samples["label"].value_counts()
        assert counts["bonafide"] == counts["spoof"]

    def test_bonafide_spoof_filters(self, wavefake_root):
        ds = DetectionDataset(wavefake_path=wavefake_root, subset="train")
        ds.get_bonafide_only()
        assert set(ds.samples["label"]) == {"bonafide"}
        ds2 = DetectionDataset(wavefake_path=wavefake_root, subset="train")
        ds2.get_spoof_only()
        assert set(ds2.samples["label"]) == {"spoof"}
