"""Offline post-analysis of saved attack wav pairs: plots + MCD.

Behavioral equivalent of the reference's AttackPostAnalyser (reference:
src/aa/qualitative/attacks_postanalysis.py:15-128): waveform overlay
plots of original vs attacked segments, and mel-cepstral distance
statistics (mean/std/min/max) exported to csv.

MCD here is a native reimplementation of the ``mel_cepstral_distance``
package's pipeline (the reference imports it at
attacks_postanalysis.py:7,108), matching its defaults step for step:

* audio loaded mono and resampled to 22 050 Hz (librosa.load default)
* STFT n_fft=1024, hop=256, periodic hamming window, center=False
* power mel spectrogram, 20 htk-scale mels, no filter normalization
* log10(mel + float64 eps), then the plain cosine transform
  ``c_i(m) = sum_k logmel_k(m) * cos(pi * i / K * (k + 0.5))``
  keeping coefficients i = 1..16 (c0 omitted; no dB scaling — the
  package reports the raw log10-cepstral distance)
* DTW alignment (euclidean frame distance, steps (1,1)/(1,0)/(0,1)
  of weight 1), MCD = mean frame distance along the optimal path,
  ``penalty = 2 - (frames_1 + frames_2) / aligned_frames``

The formula constants are pinned by tests/test_eval.py on constructed
mel inputs. Remaining caveat (package not installable in this image):
its exact DTW tie-breaking order is unverified here; ties between
equal-cost paths are measure-zero for real audio.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import pandas as pd

LOGGER = logging.getLogger(__name__)


_PKG_SR = 22_050  # librosa.load's default resample rate


def mel_cepstra(
    wave: np.ndarray,
    sr: int = 16_000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 20,
    n_mfcc: int = 16,
) -> np.ndarray:
    """Host-side mel cepstra (frames, n_mfcc) — the package's features.

    Returns coefficients c_1..c_{n_mfcc} per frame (c0 omitted, as in
    ``mel_cepstral_distance.get_mfccs_of_mel_spectogram``).
    """
    import sys as _sys

    from adaa_tpu.ops.filterbanks import melscale_fbanks

    wave = np.asarray(wave)
    if wave.dtype.kind == "i":
        wave = wave.astype(np.float64) / np.iinfo(wave.dtype).max
    wave = np.asarray(wave, np.float64)
    if wave.ndim > 1:
        wave = wave.mean(axis=0)
    if sr != _PKG_SR:
        from adaa_tpu.data.base import resample_wave

        resampled, _ = resample_wave(
            wave[None].astype(np.float32), sr, _PKG_SR
        )
        wave = np.asarray(resampled[0], np.float64)
        sr = _PKG_SR

    # center=False framing with a periodic hamming window of n_fft
    n_frames = max(1 + (len(wave) - n_fft) // hop, 0)
    if n_frames == 0:
        return np.zeros((0, n_mfcc))
    n = np.arange(n_fft)
    window = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / n_fft)
    idx = np.arange(n_frames)[:, None] * hop + n[None, :]
    frames = wave[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # power, (T, F)
    fb = melscale_fbanks(
        n_fft // 2 + 1, 0.0, sr / 2, n_mels, sr, mel_scale="htk", norm=None
    ).astype(np.float64)
    logmel = np.log10(spec @ fb + _sys.float_info.epsilon)  # (T, n_mels)
    # plain cosine transform, coefficients 1..n_mfcc
    i = np.arange(1, n_mfcc + 1)[None, :]
    k = np.arange(n_mels)[:, None]
    cos_tab = np.cos(np.pi * i / n_mels * (k + 0.5))  # (n_mels, n_mfcc)
    return logmel @ cos_tab  # (T, n_mfcc)


def _dtw_path_cost(d: np.ndarray) -> Tuple[float, int]:
    """DTW over a frame-distance matrix; returns (total cost, path len)."""
    t1, t2 = d.shape
    acc = np.full((t1 + 1, t2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        j_lo, j_hi = 1, t2 + 1
        prev = acc[i - 1]
        cur = acc[i]
        for j in range(j_lo, j_hi):
            cur[j] = d[i - 1, j - 1] + min(prev[j - 1], prev[j], cur[j - 1])
    # path length via backtrack
    i, j, steps = t1, t2, 0
    while i > 1 or j > 1:
        moves = [(acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1)]
        _, i, j = min(moves)
        steps += 1
    return float(acc[t1, t2]), steps + 1


def mel_cepstral_distance(
    wave1: np.ndarray, wave2: np.ndarray, sr: int = 16_000
) -> Tuple[float, float, int]:
    """(mcd, penalty, frames) between two waves — semantics of
    ``mel_cepstral_distance.get_metrics_wavs``: MCD is the mean
    euclidean distance of the c_1..c_16 log10 mel cepstra along the
    DTW path; ``penalty = 2 - (n1 + n2) / aligned_frames``."""
    c1 = mel_cepstra(wave1, sr)
    c2 = mel_cepstra(wave2, sr)
    if len(c1) == 0 or len(c2) == 0:
        return float("nan"), float("nan"), 0
    diff = c1[:, None, :] - c2[None, :, :]
    d = np.sqrt((diff * diff).sum(-1))  # pairwise frame distances
    cost, path_len = _dtw_path_cost(d)
    frames = path_len
    penalty = 2.0 - (len(c1) + len(c2)) / frames
    return cost / frames, penalty, frames


class AttackPostAnalyser:
    """Mirror of the reference class (attacks_postanalysis.py:15-128)."""

    def __init__(self, result_dst):
        self.result_dst = Path(result_dst)
        self.result_dst.mkdir(parents=True, exist_ok=True)

    def save_plot(self, file_name, xo, xa, rang=(1100, 1200)):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.rcParams["figure.figsize"] = [12.0, 4.0]
        s, e = rang
        xo = np.asarray(xo, np.float64)
        xa = np.asarray(xa, np.float64)
        plt.plot(xo[s:e], "--", color="steelblue")
        plt.plot(xa[s:e], "-", color="yellow")
        plt.plot(xo[s:e] - xa[s:e], color="lightcoral")
        plt.savefig(self.result_dst / f"{file_name}_plot.png")
        plt.clf()

    def _wav_pairs(self, path: Optional[Path] = None):
        from scipy.io import wavfile

        path = Path(path) if path else self.result_dst
        # our analyser writes *__orig.wav / *__attacked.wav pairs
        for orig in sorted(path.glob("**/*__orig.wav")):
            att = orig.parent / orig.name.replace("__orig.wav", "__attacked.wav")
            if not att.exists():
                continue
            _, org_wav = wavfile.read(orig)
            _, att_wav = wavfile.read(att)
            yield orig.stem.replace("__orig", ""), org_wav, att_wav

    def read_waves_and_plot(self, path=None):
        for stem, org, att in self._wav_pairs(path):
            self.save_plot(stem, org, att, (1100, 1300))

    def read_waves_and_calc_metrics(self, path=None) -> pd.DataFrame:
        rows = []
        mcds = []
        for stem, org, att in self._wav_pairs(path):
            try:
                distance, penalty, frames = mel_cepstral_distance(org, att)
            except Exception:  # mirror the reference's blanket skip
                LOGGER.info("ERROR")
                continue
            mcds.append(distance)
            rows.append({"name": stem, "mcd": distance,
                         "penalty": penalty, "frames": frames})

        results = pd.DataFrame(rows).reset_index(drop=True)
        results.to_csv(self.result_dst / "metrics.csv")

        if mcds:
            arr = np.asarray(mcds)
            stats = pd.DataFrame(
                [[arr.mean(), arr.std(), arr.min(), arr.max()]],
                columns=["mean", "std", "min", "max"],
            )
            stats.to_csv(self.result_dst / "mcd_metrics.csv")
            LOGGER.info(
                "MCD: %s, %s, %s, %s", arr.mean(), arr.std(), arr.min(), arr.max()
            )
        return results
