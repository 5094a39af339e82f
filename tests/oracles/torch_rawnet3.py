"""Torch-CPU RawNet3 oracle for importer/logit parity.

Compact reimplementation of the RawNet3 topology (Jung et al.;
ECAPA-style Res2Net + attentive stats pooling) with state_dict keys
matching the reference layout (preprocess.1, conv1.filterbank.*,
layer1..4, attention.{0,2,3}, bn5, fc6) so the JAX importer is
exercised against realistically-shaped checkpoints. The parametric
sinc filterbank follows the asteroid_filterbanks ParamSincFB
construction (cos+sin half-banks, half-Hamming window, mel-spaced
init, sample_rate default 8000).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn


class _SincFB(nn.Module):
    def __init__(self, n_filters=256, kernel_size=251, stride=10,
                 sample_rate=8000.0, min_low_hz=50.0, min_band_hz=50.0):
        super().__init__()
        self.stride = stride
        self.kernel_size = kernel_size
        self.sample_rate = sample_rate
        self.min_low_hz, self.min_band_hz = min_low_hz, min_band_hz
        cutoff = n_filters // 2
        to_mel = lambda hz: 2595.0 * np.log10(1.0 + hz / 700.0)
        to_hz = lambda mel: 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
        low_hz, high_hz = 30.0, sample_rate / 2 - (min_low_hz + min_band_hz)
        mel = np.linspace(to_mel(low_hz), to_mel(high_hz), cutoff + 1)
        hz = to_hz(mel)
        self.low_hz_ = nn.Parameter(
            torch.from_numpy(hz[:-1].astype(np.float32)).view(-1, 1))
        self.band_hz_ = nn.Parameter(
            torch.from_numpy(np.diff(hz).astype(np.float32)).view(-1, 1))
        half = kernel_size // 2
        self.register_buffer(
            "window_",
            torch.from_numpy(np.hamming(kernel_size)[:half].astype(np.float32)))
        self.register_buffer(
            "n_",
            torch.from_numpy(
                (2 * math.pi * np.arange(-half, 0.0) / sample_rate
                 ).astype(np.float32)).view(1, -1))

    def filters(self):
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(low + self.min_band_hz + torch.abs(self.band_hz_),
                           self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]
        ftl, fth = low @ self.n_, high @ self.n_
        cos_l = ((torch.sin(fth) - torch.sin(ftl)) / (self.n_ / 2)) * self.window_
        cos = torch.cat([cos_l, 2 * band.view(-1, 1), cos_l.flip(1)], 1)
        sin_l = ((torch.cos(ftl) - torch.cos(fth)) / (self.n_ / 2)) * self.window_
        sin = torch.cat([sin_l, torch.zeros_like(band).view(-1, 1),
                         -sin_l.flip(1)], 1)
        filt = torch.cat([cos, sin], 0) / (
            2 * torch.cat([band, band], 0)[:, None])
        return filt.view(-1, 1, self.kernel_size)

    def forward(self, x):  # (B, 1, L)
        return torch.nn.functional.conv1d(x, self.filters(), stride=self.stride)


class _Encoder(nn.Module):
    """asteroid Encoder wrapper: holds .filterbank for key layout."""

    def __init__(self, fb):
        super().__init__()
        self.filterbank = fb

    def forward(self, x):
        return self.filterbank(x)


class _AFMS(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones((dim, 1)))
        self.fc = nn.Linear(dim, dim)

    def forward(self, x):  # (B, C, T)
        y = torch.sigmoid(self.fc(x.mean(-1))).unsqueeze(-1)
        return (x + self.alpha) * y


class _Bottle2neck(nn.Module):
    def __init__(self, cin, cout, k=3, dilation=1, scale=8, pool=0):
        super().__init__()
        width = cout // scale
        self.width, self.nums = width, scale - 1
        self.conv1 = nn.Conv1d(cin, width * scale, 1)
        self.bn1 = nn.BatchNorm1d(width * scale)
        pad = (k // 2) * dilation
        self.convs = nn.ModuleList(
            [nn.Conv1d(width, width, k, dilation=dilation, padding=pad)
             for _ in range(self.nums)])
        self.bns = nn.ModuleList(
            [nn.BatchNorm1d(width) for _ in range(self.nums)])
        self.conv3 = nn.Conv1d(width * scale, cout, 1)
        self.bn3 = nn.BatchNorm1d(cout)
        self.residual = (nn.Sequential(nn.Conv1d(cin, cout, 1, bias=False))
                         if cin != cout else nn.Identity())
        self.mp = nn.MaxPool1d(pool) if pool else None
        self.afms = _AFMS(cout)

    def forward(self, x):
        res = self.residual(x)
        out = self.bn1(torch.relu(self.conv1(x)))
        spx = torch.split(out, self.width, 1)
        sp = None
        outs = []
        for i in range(self.nums):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = self.bns[i](torch.relu(self.convs[i](sp)))
            outs.append(sp)
        outs.append(spx[self.nums])
        out = self.bn3(torch.relu(self.conv3(torch.cat(outs, 1))))
        out = out + res
        if self.mp is not None:
            out = self.mp(out)
        return self.afms(out)


class TorchRawNet3(nn.Module):
    def __init__(self, C=1024):
        super().__init__()

        class _PreEmph(nn.Module):
            def forward(self, x):  # (B, 1, L)
                xp = torch.nn.functional.pad(x, (1, 0), "reflect")
                return xp[:, :, 1:] - 0.97 * xp[:, :, :-1]

        self.preprocess = nn.Sequential(
            _PreEmph(), nn.InstanceNorm1d(1, eps=1e-4, affine=True))
        self.conv1 = _Encoder(_SincFB(C // 4, 251, stride=10))
        self.layer1 = _Bottle2neck(C // 4, C, 3, 2, 8, pool=5)
        self.layer2 = _Bottle2neck(C, C, 3, 3, 8, pool=3)
        self.layer3 = _Bottle2neck(C, C, 3, 4, 8)
        self.layer4 = nn.Conv1d(3 * C, 1536, 1)
        self.attention = nn.Sequential(
            nn.Conv1d(1536 * 3, 128, 1), nn.ReLU(), nn.BatchNorm1d(128),
            nn.Conv1d(128, 1536, 1), nn.Softmax(dim=2))
        self.bn5 = nn.BatchNorm1d(3072)
        self.fc6 = nn.Linear(3072, 1)
        self.bn6 = nn.BatchNorm1d(1)  # present in ckpts; unused (out_bn=False)
        self.mp3 = nn.MaxPool1d(3)

    def forward(self, x):  # (B, L)
        h = self.preprocess(x.unsqueeze(1))
        h = torch.abs(self.conv1(h))
        h = torch.log(h + 1e-6)
        h = h - h.mean(dim=-1, keepdim=True)

        x1 = self.layer1(h)
        x2 = self.layer2(x1)
        x3 = self.layer3(self.mp3(x1) + x2)
        h = torch.relu(self.layer4(torch.cat((self.mp3(x1), x2, x3), 1)))

        t = h.shape[-1]
        gx = torch.cat(
            (h,
             h.mean(2, keepdim=True).repeat(1, 1, t),
             torch.sqrt(h.var(2, keepdim=True).clamp(1e-4, 1e4)
                        ).repeat(1, 1, t)), 1)
        w = self.attention(gx)
        mu = (h * w).sum(2)
        sg = torch.sqrt(((h * h) * w).sum(2).sub(mu * mu).clamp(1e-4, 1e4))
        out = self.bn5(torch.cat((mu, sg), 1))
        return self.fc6(out)
