"""Minimal FLAC encoder used as a test oracle for the native decoder.

Produces spec-conformant streams (correct CRC-8/CRC-16, UTF-8 frame
numbers, STREAMINFO) covering the subframe types and stereo modes the
decoder in native/adaa_dsp.cpp must handle: CONSTANT, VERBATIM,
FIXED(0-4) and LPC subframes, rice/rice2 residual partitions with
escape codes, independent / left-side / mid-side stereo.

This is test infrastructure, not a production encoder — it picks the
strategy the caller asks for rather than searching for the best one.
"""
from __future__ import annotations

import numpy as np


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        assert 0 <= value < (1 << nbits) or nbits == 0, (value, nbits)
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes_.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes_)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF & ~(1 << (7 - nbytes))
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v * 2, -2 * v - 1).astype(np.int64)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_residual(bw: _BitWriter, resid: np.ndarray, blocksize: int,
                    pred_order: int, partition_order: int,
                    rice2: bool = False, escape_part: int = -1):
    method = 1 if rice2 else 0
    plen = 5 if rice2 else 4
    escape = 0x1F if rice2 else 0xF
    bw.write(method, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        cnt = blocksize >> partition_order
        if p == 0:
            cnt -= pred_order
        part = resid[idx : idx + cnt]
        idx += cnt
        if p == escape_part:
            raw = max(1, int(np.abs(part).max()).bit_length() + 1) \
                if len(part) else 1
            bw.write(escape, plen)
            bw.write(raw, 5)
            for v in part:
                bw.write_signed(int(v), raw)
            continue
        zz = _zigzag(part)
        # smallest adequate rice parameter
        param = 0
        while param < escape - 1 and len(zz) and (zz >> param).max() > 30:
            param += 1
        bw.write(param, plen)
        for v in zz:
            bw.write_unary(int(v) >> param)
            bw.write(int(v) & ((1 << param) - 1), param)


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int, kind: str,
                    order: int = 2, partition_order: int = 0,
                    lpc_coefs=None, lpc_shift: int = 5,
                    rice2: bool = False, escape_part: int = -1):
    x = np.asarray(x, np.int64)
    blocksize = len(x)
    bw.write(0, 1)  # padding
    if kind == "constant":
        assert (x == x[0]).all()
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif kind == "fixed":
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        coefs = _FIXED_COEFS[order]
        resid = x[order:].copy()
        for j, c in enumerate(coefs):
            resid -= c * x[order - 1 - j : blocksize - 1 - j]
        _write_residual(bw, resid, blocksize, order, partition_order,
                        rice2, escape_part)
    elif kind == "lpc":
        coefs = [int(c) for c in lpc_coefs]
        order = len(coefs)
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        precision = 12
        bw.write(precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        pred = np.zeros(blocksize - order, np.int64)
        for j, c in enumerate(coefs):
            pred += c * x[order - 1 - j : blocksize - 1 - j]
        resid = x[order:] - (pred >> lpc_shift)
        _write_residual(bw, resid, blocksize, order, partition_order,
                        rice2, escape_part)
    else:
        raise ValueError(kind)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 4096,
    kind: str = "fixed",
    order: int = 2,
    partition_order: int = 0,
    lpc_coefs=None,
    lpc_shift: int = 5,
    stereo_mode: str = "independent",
    rice2: bool = False,
    escape_part: int = -1,
    omit_total: bool = False,
) -> bytes:
    """Encode int PCM (T,) or (T, 2) to a FLAC stream."""
    pcm = np.asarray(pcm, np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    total, channels = pcm.shape
    assert channels in (1, 2)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(0 if omit_total else total, 36)
    body = si.data() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        block = pcm[pos : pos + n]
        hdr = bytearray()
        hdr += b"\xff\xf8"  # sync + fixed blocksize strategy
        ch_code = channels - 1
        sub_bps = [bps] * channels
        blocks = [block[:, c] for c in range(channels)]
        if channels == 2 and stereo_mode == "left-side":
            ch_code = 8
            side = block[:, 0] - block[:, 1]
            blocks = [block[:, 0], side]
            sub_bps = [bps, bps + 1]
        elif channels == 2 and stereo_mode == "mid-side":
            ch_code = 10
            mid = (block[:, 0] + block[:, 1]) >> 1
            side = block[:, 0] - block[:, 1]
            blocks = [mid, side]
            sub_bps = [bps, bps + 1]
        # blocksize code 7 = 16-bit at end; sample rate code 0 (from
        # STREAMINFO); sample size code 4 (16-bit) or 0
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps, 0)
        hdr.append((7 << 4) | 0)
        hdr.append((ch_code << 4) | (ss_code << 1))
        hdr += _utf8_number(frame_no)
        hdr += (n - 1).to_bytes(2, "big")
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitWriter()
        for c in range(channels):
            _write_subframe(bw, blocks[c], sub_bps[c], kind, order,
                            partition_order, lpc_coefs, lpc_shift,
                            rice2=rice2, escape_part=escape_part)
        bw.align()
        frame = bytes(hdr) + bw.data()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        pos += n
        frame_no += 1
    return bytes(out)
