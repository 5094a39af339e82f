"""Offline post-analysis of saved attack wav pairs: plots + MCD.

Behavioral equivalent of the reference's AttackPostAnalyser (reference:
src/aa/qualitative/attacks_postanalysis.py:15-128): waveform overlay
plots of original vs attacked segments, and mel-cepstral distance
statistics (mean/std/min/max) exported to csv.

MCD here is a native implementation (the reference imports the
``mel_cepstral_distance`` package): mel cepstra from our own
STFT/mel/DCT pipeline on host, DTW-aligned, with the standard
Kubichek formula ``(10 / ln 10) * sqrt(2 * sum_k (c1_k - c2_k)^2)``
averaged over aligned frames, skipping c0. Absolute values can differ
slightly from the reference package (different mel/window defaults);
relative comparisons across attacks are preserved.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import pandas as pd

LOGGER = logging.getLogger(__name__)


def mel_cepstra(
    wave: np.ndarray,
    sr: int = 16_000,
    n_fft: int = 512,
    hop: int = 160,
    win: int = 400,
    n_mels: int = 20,
) -> np.ndarray:
    """Host-side mel cepstra (frames, n_mels) for MCD."""
    from adaa_tpu.ops.filterbanks import create_dct, melscale_fbanks
    from adaa_tpu.ops.stft import hann_window

    wave = np.asarray(wave, np.float64)
    if wave.dtype.kind == "i":
        wave = wave / np.iinfo(wave.dtype).max
    pad = n_fft // 2
    x = np.pad(wave, pad, mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    window = np.zeros(n_fft)
    left = (n_fft - win) // 2
    window[left : left + win] = hann_window(win).astype(np.float64)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (T, F)
    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, sr / 2, 80, sr).astype(np.float64)
    mel = np.log10(np.maximum(spec @ fb, 1e-10))
    dct = create_dct(n_mels, 80, norm="ortho").astype(np.float64)
    return mel @ dct  # (T, n_mels)


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
    """(mcd, penalty, frames) between two waves — API shape of
    ``mel_cepstral_distance.get_metrics_wavs``."""
    c1 = mel_cepstra(wave1, sr)[:, 1:]  # skip c0
    c2 = mel_cepstra(wave2, sr)[:, 1:]
    const = 10.0 / np.log(10.0) * np.sqrt(2.0)
    # pairwise frame distances
    diff = c1[:, None, :] - c2[None, :, :]
    d = const * np.sqrt((diff * diff).sum(-1))
    cost, path_len = _dtw_path_cost(d)
    frames = path_len
    penalty = 1.0 - (min(len(c1), len(c2)) / frames if frames else 0.0)
    return cost / max(frames, 1), penalty, frames


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
