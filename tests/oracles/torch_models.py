"""Independent torch-CPU oracles for logit-parity testing.

These are compact reimplementations of the published detector
architectures (ASVspoof2021 LFCC-LCNN baseline; piotrkawa/specrnet) in
plain torch, written from the architecture spec. They serve two
purposes: (1) parity targets for the JAX models + torch-checkpoint
importer, and (2) the torch-CPU reference throughput baseline in
bench.py. torchaudio is unavailable in this image, so the LFCC frontend
is built from torch.stft + the same filterbank/DCT matrices the JAX
side uses (cross-validated in tests/test_frontends.py).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from adaa_tpu.ops.filterbanks import create_dct, linear_fbanks


# ---------------------------------------------------------------------------
# LFCC frontend (torchaudio.transforms.LFCC equivalent in torch core)
# ---------------------------------------------------------------------------

class TorchLFCC(nn.Module):
    def __init__(self, n_lfcc=80, n_filter=128, n_fft=512, win=400, hop=160,
                 sr=16000):
        super().__init__()
        self.n_fft, self.win, self.hop = n_fft, win, hop
        self.register_buffer("window", torch.hann_window(win))
        self.register_buffer(
            "fb", torch.from_numpy(linear_fbanks(n_fft // 2 + 1, 0.0, sr / 2,
                                                 n_filter, sr))
        )
        self.register_buffer(
            "dct", torch.from_numpy(create_dct(n_lfcc, n_filter, "ortho"))
        )

    def forward(self, x):  # (B, L) -> (B, n_lfcc, T)
        spec = torch.stft(
            x, self.n_fft, self.hop, self.win, self.window, return_complex=True
        ).abs() ** 2
        banked = torch.matmul(spec.transpose(-2, -1), self.fb)
        db = 10.0 * torch.log10(torch.clamp(banked, min=1e-10))
        return torch.matmul(db, self.dct).transpose(-2, -1)


# ---------------------------------------------------------------------------
# LCNN oracle
# ---------------------------------------------------------------------------

class _MFM(nn.Module):
    def forward(self, x):
        a, b = x.chunk(2, dim=1)
        return torch.max(a, b)


class TorchLCNN(nn.Module):
    """LFCC-LCNN baseline topology; state_dict keys follow the reference
    layout (m_transform.<i>, m_before_pooling.<j>.l_blstm, m_output_act)
    so the JAX importer can be tested against real-shaped checkpoints."""

    def __init__(self, input_channels=1, num_coefficients=80, with_frontend=True):
        super().__init__()
        c = num_coefficients
        bn = lambda ch: nn.BatchNorm2d(ch, affine=False)
        self.frontend = TorchLFCC(n_lfcc=c) if with_frontend else None
        self.m_transform = nn.Sequential(
            nn.Conv2d(input_channels, 64, 5, 1, padding=2), _MFM(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(32, 64, 1, 1, padding=0), _MFM(), bn(32),
            nn.Conv2d(32, 96, 3, 1, padding=1), _MFM(),
            nn.MaxPool2d(2, 2), bn(48),
            nn.Conv2d(48, 96, 1, 1, padding=0), _MFM(), bn(48),
            nn.Conv2d(48, 128, 3, 1, padding=1), _MFM(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 1, 1, padding=0), _MFM(), bn(64),
            nn.Conv2d(64, 64, 3, 1, padding=1), _MFM(), bn(32),
            nn.Conv2d(32, 64, 1, 1, padding=0), _MFM(), bn(32),
            nn.Conv2d(32, 64, 3, 1, padding=1), _MFM(),
            nn.MaxPool2d(2, 2),
            nn.Dropout(0.7),
        )

        class _BLSTM(nn.Module):
            def __init__(self, dim):
                super().__init__()
                self.l_blstm = nn.LSTM(dim, dim // 2, bidirectional=True)

            def forward(self, x):
                out, _ = self.l_blstm(x.permute(1, 0, 2))
                return out.permute(1, 0, 2)

        dim = (c // 16) * 32
        self.m_before_pooling = nn.Sequential(_BLSTM(dim), _BLSTM(dim))
        self.m_output_act = nn.Linear(dim, 1)

    def forward(self, x):
        if self.frontend is not None and x.dim() == 2:
            x = self.frontend(x).unsqueeze(1)  # (B, 1, coeff, T)
        b = x.shape[0]
        h = self.m_transform(x.permute(0, 1, 3, 2))
        h = h.permute(0, 2, 1, 3).contiguous().view(b, h.shape[2], -1)
        h2 = self.m_before_pooling(h)
        return self.m_output_act((h2 + h).mean(1))


# ---------------------------------------------------------------------------
# SpecRNet oracle
# ---------------------------------------------------------------------------

class _ResBlock2D(nn.Module):
    def __init__(self, cin, cout, first=False):
        super().__init__()
        self.first = first
        if not first:
            self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, padding=1)
        self.bn2 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, padding=1)
        self.downsample = cin != cout
        if self.downsample:
            self.conv_downsample = nn.Conv2d(cin, cout, 1, 1, padding=0)
        self.lrelu = nn.LeakyReLU(0.3)
        self.mp = nn.MaxPool2d(2)

    def forward(self, x):
        identity = x
        if not self.first:
            _ = self.lrelu(self.bn1(x))  # computed-and-discarded (ref quirk)
        out = self.conv1(x)
        out = self.lrelu(self.bn2(out))
        out = self.conv2(out)
        if self.downsample:
            identity = self.conv_downsample(identity)
        return self.mp(out + identity)


class TorchSpecRNet(nn.Module):
    def __init__(self, input_channels=1, with_frontend=True):
        super().__init__()
        self.frontend = TorchLFCC() if with_frontend else None
        self.first_bn = nn.BatchNorm2d(input_channels)
        self.selu = nn.SELU(inplace=True)
        self.block0 = nn.Sequential(_ResBlock2D(input_channels, 20, first=True))
        self.block2 = nn.Sequential(_ResBlock2D(20, 64))
        self.block4 = nn.Sequential(_ResBlock2D(64, 64))
        self.fc_attention0 = nn.Sequential(nn.Linear(20, 20))
        self.fc_attention2 = nn.Sequential(nn.Linear(64, 64))
        self.fc_attention4 = nn.Sequential(nn.Linear(64, 64))
        self.bn_before_gru = nn.BatchNorm2d(64)
        self.gru = nn.GRU(64, 64, num_layers=2, batch_first=True,
                          bidirectional=True)
        self.fc1_gru = nn.Linear(128, 128)
        self.fc2_gru = nn.Linear(128, 1)
        self.mp = nn.MaxPool2d(2)

    def _gate(self, x, fc):
        y = torch.sigmoid(fc(x.mean(dim=(2, 3))))[:, :, None, None]
        return x * y + y

    def forward(self, x):
        if self.frontend is not None and x.dim() == 2:
            x = self.frontend(x).unsqueeze(1)
        h = self.selu(self.first_bn(x))
        h = self.mp(self._gate(self.block0(h), self.fc_attention0))
        h = self.mp(self._gate(self.block2(h), self.fc_attention2))
        h = self.mp(self._gate(self.block4(h), self.fc_attention4))
        h = self.selu(self.bn_before_gru(h))
        h = h.squeeze(-2).permute(0, 2, 1)
        h, _ = self.gru(h)
        return self.fc2_gru(self.fc1_gru(h[:, -1, :]))
