"""Independent torch implementations of torchaudio's filterbank/DCT
constructors, written from their published definitions (torchaudio
``functional.linear_fbanks`` / ``melscale_fbanks`` / ``create_dct``)
with a deliberately different code structure (explicit per-filter
triangle evaluation instead of the vectorized slope trick) so that a
bug in adaa_tpu.ops.filterbanks cannot be mirrored here by shared code.

These serve as the parity oracle for tests/test_frontends.py since a
real torchaudio install is unavailable in this image; analytic
spot-values in the tests anchor both implementations to hand-computed
numbers derived from the definitions.
"""
import math

import torch


def linear_fbanks(n_freqs, f_min, f_max, n_filter, sample_rate):
    """(n_freqs, n_filter) triangular filters with peaks at
    linspace(f_min, f_max, n_filter+2)[1:-1]."""
    freqs = torch.linspace(0.0, sample_rate // 2, n_freqs, dtype=torch.float64)
    pts = torch.linspace(f_min, f_max, n_filter + 2, dtype=torch.float64)
    cols = []
    for m in range(n_filter):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        rising = (freqs - lo) / (c - lo)
        falling = (hi - freqs) / (hi - c)
        cols.append(torch.clamp(torch.minimum(rising, falling), min=0.0))
    return torch.stack(cols, dim=1).to(torch.float32)


def _hz2mel(f):
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel2hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                    norm=None, mel_scale="htk"):
    assert mel_scale == "htk"
    freqs = torch.linspace(0.0, sample_rate // 2, n_freqs, dtype=torch.float64)
    m_lo, m_hi = _hz2mel(f_min), _hz2mel(f_max)
    pts = torch.tensor(
        [_mel2hz(m_lo + (m_hi - m_lo) * i / (n_mels + 1))
         for i in range(n_mels + 2)],
        dtype=torch.float64,
    )
    cols = []
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        rising = (freqs - lo) / (c - lo)
        falling = (hi - freqs) / (hi - c)
        tri = torch.clamp(torch.minimum(rising, falling), min=0.0)
        if norm == "slaney":
            tri = tri * (2.0 / (hi - lo))
        cols.append(tri)
    return torch.stack(cols, dim=1).to(torch.float32)


def create_dct(n_mfcc, n_mels, norm="ortho"):
    """(n_mels, n_mfcc) DCT-II matrix applied as ``banked.T @ dct``."""
    rows = []
    for n in range(n_mels):
        row = []
        for k in range(n_mfcc):
            v = math.cos(math.pi * k * (2 * n + 1) / (2.0 * n_mels))
            if norm == "ortho":
                v *= math.sqrt(1.0 / n_mels) if k == 0 \
                    else math.sqrt(2.0 / n_mels)
            else:
                v *= 2.0
            row.append(v)
        rows.append(row)
    return torch.tensor(rows, dtype=torch.float32)
