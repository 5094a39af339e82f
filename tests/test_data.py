"""Data-layer tests: preprocessing, splits, loader.

Replicates the reference's dataset integrity __main__ asserts
(SURVEY §4: split disjointness/determinism) as a real suite.
"""
import numpy as np
import pandas as pd
import pytest

from adaa_tpu.data import base as dsp
from adaa_tpu.data.datasets import SimpleAudioFakeDataset
from adaa_tpu.data.loader import DataLoader
from adaa_tpu.data.synthetic import SyntheticDataset


class TestPad:
    def test_cut_long(self):
        w = np.arange(100, dtype=np.float32)
        out = dsp.apply_pad(w, 50)
        np.testing.assert_array_equal(out, w[:50])

    def test_repeat_pad_short(self):
        w = np.array([1.0, 2.0, 3.0], np.float32)
        out = dsp.apply_pad(w, 8)
        np.testing.assert_array_equal(out, [1, 2, 3, 1, 2, 3, 1, 2])

    def test_canonical_length(self):
        w = np.random.default_rng(0).standard_normal(30_000).astype(np.float32)
        out, sr = dsp.wavefake_preprocessing(w[None, :], 16000,
                                             wave_fake_trim=False)
        assert out.shape == (64_600,)
        assert sr == 16000


class TestTrim:
    def test_keeps_loud_audio(self):
        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        loud = 0.5 * np.sin(2 * np.pi * 220 * t)
        out, _ = dsp.apply_trim(loud[None, :], sr)
        assert out.shape[-1] == pytest.approx(sr, rel=0.05)

    def test_removes_leading_silence(self):
        sr = 16000
        silence = np.zeros(sr, np.float32)
        t = np.arange(sr, dtype=np.float32) / sr
        loud = 0.5 * np.sin(2 * np.pi * 220 * t)
        x = np.concatenate([silence, loud])
        out, _ = dsp.apply_trim(x[None, :], sr)
        # leading second of silence should be gone
        assert out.shape[-1] < 1.2 * sr

    def test_removes_long_interior_silence(self):
        sr = 16000
        t = np.arange(sr // 2, dtype=np.float32) / sr
        loud = 0.5 * np.sin(2 * np.pi * 220 * t)
        x = np.concatenate([loud, np.zeros(sr, np.float32), loud])
        out, _ = dsp.apply_trim(x[None, :], sr)
        assert out.shape[-1] < 1.5 * sr

    def test_all_silence_returns_original(self):
        sr = 16000
        x = np.zeros((1, sr), np.float32)
        out, _ = dsp.apply_trim(x, sr)
        assert out.shape[-1] == sr  # reference keeps original


class TestResample:
    def test_downsample_halves_length(self):
        x = np.random.default_rng(0).standard_normal((1, 32000)).astype(np.float32)
        out, sr = dsp.resample_wave(x, 32000, 16000)
        assert sr == 16000
        assert abs(out.shape[-1] - 16000) <= 2

    def test_noop(self):
        x = np.zeros((1, 100), np.float32)
        out, sr = dsp.resample_wave(x, 16000, 16000)
        assert out is x


def _make_ds(subset):
    ds = SimpleAudioFakeDataset(subset)
    ds.partition_ratio = [0.7, 0.15]
    ds.seed = 45
    return ds


class TestSplits:
    def test_list_split_disjoint_and_exhaustive(self):
        items = [f"file_{i:04d}.wav" for i in range(1000)]
        subsets = {s: set(_make_ds(s).split_samples(list(items)))
                   for s in ("train", "test", "val")}
        assert len(subsets["train"]) == 700
        assert len(subsets["test"]) == 150
        assert len(subsets["val"]) == 150
        assert not subsets["train"] & subsets["test"]
        assert not subsets["train"] & subsets["val"]
        assert not subsets["test"] & subsets["val"]
        assert subsets["train"] | subsets["test"] | subsets["val"] == set(items)

    def test_list_split_deterministic(self):
        items = [f"f{i}" for i in range(100)]
        a = _make_ds("train").split_samples(list(items))
        b = _make_ds("train").split_samples(list(reversed(items)))
        assert a == b  # sorted before shuffling

    def test_df_split_disjoint(self):
        df = pd.DataFrame({
            "path": [f"p{i}" for i in range(200)],
            "label": ["bonafide" if i % 2 else "spoof" for i in range(200)],
        })
        parts = {s: _make_ds(s).split_samples(df) for s in ("train", "test", "val")}
        all_paths = set()
        for p in parts.values():
            paths = set(p["path"])
            assert not paths & all_paths
            all_paths |= paths
        assert len(all_paths) == 200


class TestLoader:
    def test_batching_and_drop_last(self):
        ds = SyntheticDataset(n=70, wave_length=1000)
        loader = DataLoader(ds, batch_size=32, shuffle=True, drop_last=True,
                            num_workers=2, seed=0)
        batches = list(loader)
        assert len(batches) == 2 == len(loader)
        waves, srs, labels = batches[0][:3]
        assert waves.shape == (32, 1000)
        assert waves.dtype == np.float32
        assert labels.shape == (32,)

    def test_meta_collation(self):
        ds = SyntheticDataset(n=8, wave_length=100, return_meta=True)
        loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
        batch = next(iter(loader))
        assert len(batch) == 4
        attack_types, paths, subsets, lens = batch[3]
        assert len(paths) == 4

    def test_deterministic_with_seed(self):
        ds = SyntheticDataset(n=64, wave_length=100)
        a = next(iter(DataLoader(ds, 16, seed=5)))[0]
        b = next(iter(DataLoader(ds, 16, seed=5)))[0]
        np.testing.assert_array_equal(a, b)


class TestSynthetic:
    def test_deterministic_items(self):
        ds = SyntheticDataset(n=10, wave_length=500)
        a = ds[3][0]
        b = ds[3][0]
        np.testing.assert_array_equal(a, b)

    def test_labels_alternate(self):
        ds = SyntheticDataset(n=10, wave_length=100)
        assert [ds[i][2] for i in range(4)] == [0, 1, 0, 1]


class TestAudioAndPadDatasets:
    def test_audio_dataset_walks_and_trims(self, tmp_path):
        from scipy.io import wavfile

        from adaa_tpu.data.base import AudioDataset, PadDataset, find_wav_files

        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        loud = 0.5 * np.sin(2 * np.pi * 220 * t)
        for i in range(3):
            sub = tmp_path / f"d{i}"
            sub.mkdir()
            wavfile.write(sub / f"f{i}.wav", sr,
                          (loud * 32767).astype(np.int16))

        found = find_wav_files(tmp_path)
        assert len(found) == 3
        assert find_wav_files(tmp_path / "d0" / "empty_nonexistent"
                              if False else tmp_path / "d0") is not None

        ds = AudioDataset(tmp_path)
        assert len(ds) == 3
        wave, got_sr = ds[0]
        assert got_sr == sr

        padded = PadDataset(ds, cut=64_600, label=1)
        w, s, label = padded[0]
        assert w.shape == (64_600,)
        assert label == 1

    def test_audio_dataset_errors(self, tmp_path):
        from adaa_tpu.data.base import AudioDataset

        with pytest.raises(IOError):
            AudioDataset(tmp_path / "missing")
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(IOError):
            AudioDataset(empty)
        with pytest.raises(TypeError):
            AudioDataset(12345)
