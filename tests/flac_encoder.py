"""Minimal FLAC *encoder* for test fixtures (verbatim/constant subframes).

There is no FLAC encoder in the image (no soundfile/torchaudio/flac CLI), so
tests generate their own streams to exercise the decoders.  Verbatim frames
are bit-exact PCM; a hand-built FIXED+rice frame covers the predictor and
rice-decoding paths.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: list = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    n_bytes = 2
    while n >= (1 << (6 - n_bytes + 5 * n_bytes)):  # crude but fine for small n
        n_bytes += 1
    payload = []
    for _ in range(n_bytes - 1):
        payload.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - n_bytes)) & 0xFF | n
    out = [lead] + payload[::-1]
    return bytes(out)


def _streaminfo(block_size: int, sr: int, channels: int, bps: int, total: int) -> bytes:
    w = BitWriter()
    w.write(block_size, 16)
    w.write(block_size, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    w.align()
    return w.tobytes() + b"\x00" * 16  # md5 unset


def _frame_header(frame_no: int, block_size: int, channels: int) -> bytes:
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocksize stream
    w.write(7, 4)  # block size: 16-bit field at end
    w.write(0, 4)  # sample rate: from STREAMINFO
    w.write(channels - 1, 4)  # independent channels
    w.write(0, 3)  # sample size: from STREAMINFO
    w.write(0, 1)  # reserved
    header = w.tobytes() + _utf8_number(frame_no)
    w2 = BitWriter()
    w2.write(block_size - 1, 16)
    header += w2.tobytes()
    return header + bytes([crc8(header)])


def encode_flac_verbatim(samples: np.ndarray, sr: int, bps: int = 16,
                         block_size: int = 4096) -> bytes:
    """samples: (n,) or (n, channels) int array; verbatim subframes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    out = b"fLaC"
    si = _streaminfo(block_size, sr, channels, bps, n)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bs = len(blk)
        header = _frame_header(frame_no, bs, channels)
        w = BitWriter()
        for c in range(channels):
            col = blk[:, c]
            if np.all(col == col[0]):
                w.write(0, 1); w.write(0, 6); w.write(0, 1)  # CONSTANT
                w.write_signed(int(col[0]), bps)
            else:
                w.write(0, 1); w.write(1, 6); w.write(0, 1)  # VERBATIM
                for v in col:
                    w.write_signed(int(v), bps)
        w.align()
        body = w.tobytes()
        frame = header + body
        out += frame + crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return out


def encode_flac_fixed_order1(samples: np.ndarray, sr: int, rice_param: int,
                             bps: int = 16) -> bytes:
    """Single-frame mono FLAC with a FIXED order-1 subframe + one rice
    partition — exercises predictor reconstruction and rice decoding."""
    n = len(samples)
    out = b"fLaC"
    si = _streaminfo(n, sr, 1, bps, n)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    header = _frame_header(0, n, 1)
    w = BitWriter()
    w.write(0, 1); w.write(8 + 1, 6); w.write(0, 1)  # FIXED order 1
    w.write_signed(int(samples[0]), bps)  # warmup
    w.write(0, 2)   # residual method: rice 4-bit
    w.write(0, 4)   # partition order 0
    w.write(rice_param, 4)
    for i in range(1, n):
        res = int(samples[i]) - int(samples[i - 1])
        zz = (abs(res) << 1) - 1 if res < 0 else res << 1  # zigzag
        w.write_unary(zz >> rice_param)
        if rice_param:
            w.write(zz & ((1 << rice_param) - 1), rice_param)
    w.align()
    frame = header + w.tobytes()
    return out + frame + crc16(frame).to_bytes(2, "big")
