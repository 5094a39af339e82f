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


class TestSoxSilenceSemantics:
    """Hand-derived goldens for the exact sox silence.c state machine
    (``silence 1 0.2 1% -1 0.2 1%``), derivable in closed form for
    constant-amplitude steps: activity = 20 ms (320-sample) trailing
    RMS >= 0.01; with a 0.5 step the RMS crosses the threshold at the
    first loud sample, and after a loud->silent edge it stays above for
    exactly 319 silent samples (0.25*(320-k)/320 >= 1e-4 until k=320)
    — the distinctive sox "window drain leak" the previous approximate
    gate could not produce."""

    SR = 16000  # -> window 320, durations 3200 samples

    def _run(self, x):
        return dsp.sox_silence(np.asarray(x, np.float32), self.SR)

    def test_leading_silence_cut_at_first_loud_sample(self):
        x = np.concatenate([np.zeros(8000), 0.5 * np.ones(12800)])
        out = self._run(x)
        np.testing.assert_array_equal(out, x[8000:].astype(np.float32))

    def test_interior_long_silence_removed_with_window_leak(self):
        x = np.concatenate(
            [0.5 * np.ones(8000), np.zeros(8000), 0.5 * np.ones(8000)]
        )
        out = self._run(x)
        # 8000 loud + 319 leaked silent samples + 8000 loud
        assert out.shape[0] == 8000 + 319 + 8000
        np.testing.assert_array_equal(out[8000:8319], np.zeros(319, np.float32))

    def test_interior_short_silence_kept(self):
        # below-run = 3000 - 319 = 2681 < 3200 -> holdoff flushed
        x = np.concatenate(
            [0.5 * np.ones(8000), np.zeros(3000), 0.5 * np.ones(8000)]
        )
        out = self._run(x)
        np.testing.assert_array_equal(out, x.astype(np.float32))

    def test_trailing_long_silence_removed(self):
        x = np.concatenate([0.5 * np.ones(8000), np.zeros(8000)])
        out = self._run(x)
        assert out.shape[0] == 8000 + 319

    def test_trailing_short_silence_kept_by_drain(self):
        x = np.concatenate([0.5 * np.ones(8000), np.zeros(2000)])
        out = self._run(x)
        np.testing.assert_array_equal(out, x.astype(np.float32))

    def test_sound_shorter_than_period_is_dropped(self):
        # a 0.1 s blip never completes the 0.2 s trigger period ->
        # SILENCE_TRIM holds it at EOF and drain discards it
        x = np.concatenate([np.zeros(8000), 0.5 * np.ones(1600)])
        out = self._run(x)
        assert out.shape[0] == 0

    def test_stop_periods_positive_truncates_at_first_silence(self):
        # non-restart mode: processing stops at the first full silence
        x = np.concatenate(
            [0.5 * np.ones(8000), np.zeros(4000), 0.5 * np.ones(8000)]
        )
        out = dsp.sox_silence(
            np.asarray(x, np.float32), self.SR, stop_periods=1
        )
        assert out.shape[0] == 8000 + 319  # rest of the file dropped


class TestOnBatchRepreprocess:
    """The raw-mode post-attack re-preprocess must match a torch
    replication of the reference loop
    (evaluate_models_on_adversarial_attacks.py:229-234 ->
    base_dataset.py:122-148): per sample, canonical preprocessing with
    DEFAULT args — i.e. silence trim IS applied — then torch-tile
    repeat-pad/cut (base_dataset.py:343-355), then restack."""

    def _torch_oracle(self, batch, srs, cut=64_600):
        import torch

        waves = []
        for w, sr in zip(batch, srs):
            t = torch.as_tensor(np.asarray(w, np.float32)).unsqueeze(0)
            # resample is a no-op at 16 kHz; trim via the shared sox
            # silence.c port (real sox is unavailable in this image —
            # the gate itself is golden-tested in TestSoxSilenceSemantics)
            trimmed = dsp.sox_silence(t.numpy()[0], int(sr))
            if trimmed.shape[0] > 0:  # reference apply_trim fallback
                t = torch.as_tensor(trimmed).unsqueeze(0)
            # PadDataset.apply_pad, verbatim torch semantics
            wv = t.squeeze(0)
            if wv.shape[0] >= cut:
                wv = wv[:cut]
            else:
                num_repeats = int(cut / wv.shape[0]) + 1
                wv = torch.tile(wv, (1, num_repeats))[:, :cut][0]
            waves.append(wv)
        return torch.stack(waves).numpy()

    def test_matches_torch_oracle_on_silence_bearing_batch(self):
        sr = 16000
        rng = np.random.default_rng(7)
        batch = np.stack([
            np.concatenate([np.zeros(20000), 0.5 * np.ones(44600)]),
            np.concatenate([0.4 * np.ones(30000), np.zeros(10000),
                            0.4 * np.ones(24600)]),
            (rng.standard_normal(64600) * 0.2),
            np.concatenate([0.3 * np.ones(60000), np.zeros(4600)]),
        ]).astype(np.float32)
        srs = np.full(4, sr, np.int32)

        ours, out_srs = dsp.wavefake_preprocessing_on_batch(batch, srs)
        oracle = self._torch_oracle(batch, srs)
        assert ours.shape == (4, 64_600)
        np.testing.assert_array_equal(ours, oracle)
        assert (out_srs == sr).all()

    def test_trim_actually_changes_silence_bearing_waves(self):
        # guard against regressing to the identity shortcut: a wave with
        # a long leading silence must come back different
        x = np.concatenate([np.zeros(20000), 0.5 * np.ones(44600)]).astype(
            np.float32
        )[None, :]
        out, _ = dsp.wavefake_preprocessing_on_batch(x, np.array([16000]))
        assert not np.array_equal(out[0], x[0])
        assert out[0, 0] == 0.5  # leading silence gone


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


class TestPhoneCall:
    """Phone-call simulation (reference base_dataset.py:303-322):
    lowpass 4000 -> compand -> rate 8000 -> (GSM, gated)."""

    def test_lowpass_minus3db_at_cutoff(self):
        sr, f = 16000, 4000.0
        t = np.arange(4 * sr) / sr
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        y = dsp.lowpass_biquad(x, sr, f)
        # steady-state RMS ratio at the cutoff ~ 1/sqrt(2) (Butterworth)
        ratio = np.sqrt(np.mean(y[sr:] ** 2) / np.mean(x[sr:] ** 2))
        assert ratio == pytest.approx(1 / np.sqrt(2), rel=0.02)

    def test_lowpass_passband_flat_stopband_falls(self):
        sr = 16000
        t = np.arange(2 * sr) / sr
        low = np.sin(2 * np.pi * 500 * t).astype(np.float32)
        high = np.sin(2 * np.pi * 7500 * t).astype(np.float32)
        g_low = np.abs(dsp.lowpass_biquad(low, sr, 4000)[sr:]).max()
        g_high = np.abs(dsp.lowpass_biquad(high, sr, 4000)[sr:]).max()
        assert g_low == pytest.approx(1.0, rel=0.02)
        assert g_high < 0.15  # ~ -24 dB/oct beyond cutoff

    def test_compand_steady_state_gain_from_transfer_curve(self):
        # constant |x| = 0.1 = -20 dBFS; curve point (-20,-8) plus the
        # -8 dB makeup gain -> out -16 dB -> gain = 10^(4/20)
        sr = 16000
        x = np.full(3 * sr, 0.1, np.float32)
        y = dsp.compand(x, sr)
        expected = 0.1 * 10 ** (4.0 / 20.0)
        assert y.shape == x.shape  # delay buffer flushed at EOF
        np.testing.assert_allclose(y[-sr:], expected, rtol=1e-3)

    def test_compand_full_scale_hits_appended_zero_point(self):
        # sox appends (0,0): at |x| = 1.0 the output gain is just the
        # -8 dB makeup gain
        sr = 16000
        x = np.ones(2 * sr, np.float32)
        y = dsp.compand(x, sr)
        np.testing.assert_allclose(y[-sr:], 10 ** (-8.0 / 20.0), rtol=1e-3)

    def test_compand_quiet_slope_one_extension(self):
        # below the first point (-60,-60): constant gain out1-in1 = 0 dB
        # then the -8 dB makeup -> gain = 10^(-8/20)
        sr = 16000
        x = np.full(2 * sr, 10 ** (-70 / 20.0), np.float32)
        y = dsp.compand(x, sr)
        np.testing.assert_allclose(
            y[-sr:], x[-sr:] * 10 ** (-8.0 / 20.0), rtol=1e-3
        )

    def test_process_phone_call_resamples_to_8k(self):
        sr = 16000
        t = np.arange(sr) / sr
        x = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None, :]
        out, out_sr = dsp.process_phone_call(x, sr, codec=None)
        assert out_sr == 8000
        assert out.shape[-1] == sr // 2
        assert np.abs(out).max() <= 1.0

    def test_preprocessing_cell_phone_path_runs(self):
        sr = 16000
        t = np.arange(2 * sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None, :]
        out, out_sr = dsp.wavefake_preprocessing(
            x, sr, wave_fake_cell_phone=True, wave_fake_trim=False,
            wave_fake_cut=16000,
        )
        # quirk preserved: output stays at 8 kHz, padded to cut
        assert out_sr == 8000
        assert out.shape == (16000,)
