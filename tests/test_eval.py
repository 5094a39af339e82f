"""Eval loop tests: clean + adversarial + qualitative, on synthetic data."""
import numpy as np
import pytest

import jax

from adaa_tpu import models
from adaa_tpu.data.synthetic import SyntheticDataset
from adaa_tpu.eval.adv_evaluation import generate_attacks
from adaa_tpu.eval.evaluation import evaluate_nn
from adaa_tpu.eval.qualitative import AttackAnalyser

WAVE_LEN = 8_000


@pytest.fixture(scope="module")
def lcnn():
    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(0), wave_length=WAVE_LEN
    )
    return module, variables


def test_evaluate_nn_report(lcnn):
    module, variables = lcnn
    ds = SyntheticDataset(n=48, subset="val", wave_length=WAVE_LEN)
    report = evaluate_nn(module, variables, ds, batch_size=16)
    for k in ["eer", "accuracy", "precision", "recall", "f1_score", "auc"]:
        assert k in report
    assert 0 <= report["accuracy"] <= 100


def test_evaluate_nn_too_few_samples_raises(lcnn):
    module, variables = lcnn
    ds = SyntheticDataset(n=4, subset="val", wave_length=WAVE_LEN)
    with pytest.raises(ValueError, match="no full batches"):
        evaluate_nn(module, variables, ds, batch_size=16)


def test_generate_attacks_whitebox(lcnn):
    module, variables = lcnn
    ds = SyntheticDataset(n=32, subset="val", wave_length=WAVE_LEN,
                          return_meta=True)
    report = generate_attacks(
        victim_module=module,
        victim_variables=variables,
        dataset=ds,
        attack_name="FGSM_eps001",
        attack_module=module,
        attack_variables=variables,
        batch_size=16,
    )
    assert "eer" in report


def test_generate_attacks_no_attack(lcnn):
    module, variables = lcnn
    ds = SyntheticDataset(n=32, subset="val", wave_length=WAVE_LEN,
                          return_meta=True)
    report = generate_attacks(
        victim_module=module,
        victim_variables=variables,
        dataset=ds,
        attack_name="NO_ATTACK",
        batch_size=16,
    )
    assert 0 <= report["accuracy"] <= 100


class _ProbeModule:
    """Victim whose logit reveals what audio it was shown: looks only
    at the first second — silence-leading raw waves score negative,
    trimmed-and-repadded ones positive."""

    def apply(self, variables, x, train=False):
        return ((x[:, :16000].mean(axis=1) - 0.15) * 100.0)[:, None]


class _RawSilenceDataset:
    """Raw-mode batch source: every wave starts with 2 s of silence
    (return_raw semantics: loaded untrimmed, padded to 64_600)."""

    def __init__(self, n=8):
        wave = np.concatenate(
            [np.zeros(32000), 0.3 * np.ones(32600)]
        ).astype(np.float32)
        self.items = [
            (wave, 16000, i % 2, ("N/A", f"p{i}", "val", 4.0))
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_generate_attacks_raw_mode_repreprocesses_attacked_audio():
    """--raw_from_dataset parity (VERDICT item 1): the attacked audio
    must be silence-trimmed + re-padded with DEFAULT preprocessing args
    before the victim sees it (reference
    evaluate_models_on_adversarial_attacks.py:229-234). The probe's
    logit on the raw wave is (0 - 0.15)*100 < 0 -> pred ~0; on the
    trimmed+re-padded wave (constant 0.3 everywhere after repeat-pad)
    it is (0.3 - 0.15)*100 > 0 -> pred ~1."""
    probe = _ProbeModule()
    ds = _RawSilenceDataset(n=8)

    captured = {}

    def cb(**kw):
        captured.update(kw)

    report_raw = generate_attacks(
        victim_module=probe,
        victim_variables={},
        dataset=ds,
        attack_name="NO_ATTACK",
        batch_size=4,
        raw_sample_from_dataset=True,
        on_attack_end_callback=cb,
    )
    # victim saw the re-preprocessed audio -> all preds ~1
    assert report_raw["accuracy"] in (0.0, 50.0, 100.0)
    assert captured["batch_preds"].min() > 0.99
    # the no-attack predictions are re-preprocessed too (reference :240-246)
    assert captured["batch_preds_noattack"].min() > 0.99
    # but the qualitative callback receives the UNprocessed waveforms
    assert captured["batch_x"][0, 0] == 0.0
    assert captured["batch_x_attacked"][0, 0] == 0.0

    # without the raw flag nothing is re-preprocessed: preds ~0
    report_clean = generate_attacks(
        victim_module=probe,
        victim_variables={},
        dataset=ds,
        attack_name="NO_ATTACK",
        batch_size=4,
        raw_sample_from_dataset=False,
        on_attack_end_callback=cb,
    )
    assert captured["batch_preds"].max() < 0.01
    del report_clean


def test_qualitative_callback(lcnn, tmp_path):
    module, variables = lcnn
    ds = SyntheticDataset(n=32, subset="val", wave_length=WAVE_LEN,
                          return_meta=True)
    analyser = AttackAnalyser(tmp_path / "qual")
    generate_attacks(
        victim_module=module,
        victim_variables=variables,
        dataset=ds,
        attack_name="PGD_eps001",
        attack_module=module,
        attack_variables=variables,
        batch_size=16,
        on_attack_end_callback=analyser.analyse,
    )
    assert (tmp_path / "qual").exists()


def test_postanalysis_mcd(tmp_path):
    """MCD of a wave vs itself is ~0; vs a perturbed copy is > 0."""
    from scipy.io import wavfile

    from adaa_tpu.eval.postanalysis import AttackPostAnalyser

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wave = 0.4 * np.sin(2 * np.pi * 220 * t)
    noisy = wave + 0.05 * rng.standard_normal(sr).astype(np.float32)

    d = tmp_path / "pairs"
    d.mkdir()
    wavfile.write(d / "a__orig.wav", sr, (wave * 32767).astype(np.int16))
    wavfile.write(d / "a__attacked.wav", sr, (noisy * 32767).astype(np.int16))
    wavfile.write(d / "b__orig.wav", sr, (wave * 32767).astype(np.int16))
    wavfile.write(d / "b__attacked.wav", sr, (wave * 32767).astype(np.int16))

    analyser = AttackPostAnalyser(d)
    results = analyser.read_waves_and_calc_metrics()
    assert len(results) == 2
    by_name = {r["name"]: r["mcd"] for _, r in results.iterrows()}
    assert by_name["b"] < 1e-6  # identical pair
    assert by_name["a"] > by_name["b"]  # noise raises MCD
    assert (d / "mcd_metrics.csv").exists()


def test_mcd_formula_constants():
    """Pin the package-parity constants of the MCD pipeline
    (mel_cepstral_distance semantics, see eval/postanalysis.py):

    * cepstra are log10 mel energies through the PLAIN cosine
      transform c_i = sum_k logmel_k cos(pi i (k+.5)/K), i=1..16
    * MCD = mean euclidean frame distance (no dB scaling)
    * penalty = 2 - (n1+n2)/aligned_frames
    """
    from adaa_tpu.eval import postanalysis as pa

    # constructed log-mel input: bypass the wave path and check the
    # cosine transform exactly
    n_mels, n_mfcc = 20, 16
    k = np.arange(n_mels)
    logmel = np.zeros((3, n_mels))
    logmel[1] = np.cos(np.pi * 5 * (k + 0.5) / n_mels)  # pure c_5 mode
    i = np.arange(1, n_mfcc + 1)[None, :]
    cos_tab = np.cos(np.pi * i / n_mels * (k[:, None] + 0.5))
    c = logmel @ cos_tab
    # orthogonality: frame 1 projects onto coefficient 5 only (= K/2)
    assert abs(c[1, 4] - n_mels / 2) < 1e-9
    assert np.abs(np.delete(c[1], 4)).max() < 1e-9

    # DTW identity path on equal-length inputs: MCD is the plain mean,
    # penalty exactly 0
    d = np.zeros((4, 4)) + 7.0
    np.fill_diagonal(d, 1.0)
    cost, path_len = pa._dtw_path_cost(d)
    assert path_len == 4 and abs(cost - 4.0) < 1e-12

    # penalty formula: aligning 3 vs 5 frames takes >= 5 path steps
    c1 = np.arange(3, dtype=np.float64)[:, None] * np.ones((1, 16))
    c2 = np.arange(5, dtype=np.float64)[:, None] * np.ones((1, 16))
    diff = c1[:, None, :] - c2[None, :, :]
    dd = np.sqrt((diff * diff).sum(-1))
    _, plen = pa._dtw_path_cost(dd)
    assert plen >= 5
    penalty = 2.0 - (3 + 5) / plen
    assert 0.0 <= penalty < 1.0


def test_mcd_resamples_to_package_rate():
    """librosa.load (inside the package) resamples to 22 050 Hz; the
    native pipeline must do the same so frame counts match."""
    from adaa_tpu.eval import postanalysis as pa

    sr = 16_000
    t = np.arange(sr) / sr
    wave = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    c = pa.mel_cepstra(wave, sr)
    # 1 s at 22050 with n_fft 1024 hop 256 center=False
    expected = 1 + (22_050 - 1024) // 256
    assert abs(c.shape[0] - expected) <= 1  # resampler edge tolerance
    assert c.shape[1] == 16
