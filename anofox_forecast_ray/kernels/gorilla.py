"""Gorilla time-series compression: delta-of-delta timestamps + XOR floats.

Implements the encoding from the public paper "Gorilla: A Fast, Scalable,
In-Memory Time Series Database" (Pelkonen et al., VLDB 2015), §4.1:

Timestamps (delta-of-delta D, stored two's-complement so the ranges are
the symmetric [-2^(b-1), 2^(b-1)-1] variants of the paper's buckets):
  D == 0                  -> '0'
  D in [-64, 63]          -> '10'   + 7-bit value
  D in [-256, 255]        -> '110'  + 9-bit value
  D in [-2048, 2047]      -> '1110' + 12-bit value
  else                    -> '1111' + 64-bit value (we widen the paper's 32
                             bits to 64 for int64 window ids)

Values (XOR with previous):
  xor == 0                -> '0'
  else '1' +
    control '0' (meaningful bits fit inside previous leading/length block)
      -> meaningful bits using previous block position
    control '1' -> 5-bit leading-zero count + 6-bit meaningful-bit length
      (64 stored as 0) + meaningful bits

First timestamp and first value are stored raw (64 bits each), preceded by
a 32-bit point count. Round-trip is bitwise exact for every f64 bit
pattern including NaN payloads, infinities and signed zeros.

There is nothing to port here — the reference has no compression; this is
the north rule's storage format. Encode/decode are pure Python over a
bytearray bit cursor; per-series blobs are small (one per (doc, tier)).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining > 0:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


_TS_RANGES = (
    (7, -64, 63, 0b10, 2),
    (9, -256, 255, 0b110, 3),
    (12, -2048, 2047, 0b1110, 4),
)


def gorilla_encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    if ts.size != vals.size:
        raise ValueError("length mismatch")
    n = ts.size
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.finish()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    bits0 = int(np.float64(vals[0]).view(np.int64)) & ((1 << 64) - 1)
    w.write(bits0, 64)

    prev_ts = int(ts[0])
    prev_delta = 0
    prev_bits = bits0
    prev_leading = -1  # no previous block
    prev_mean_len = 0

    for i in range(1, n):
        t = int(ts[i])
        delta = t - prev_ts
        dod = delta - prev_delta
        prev_ts, prev_delta = t, delta
        if dod == 0:
            w.write(0, 1)
        else:
            for bits, lo, hi, prefix, plen in _TS_RANGES:
                if lo <= dod <= hi:
                    w.write(prefix, plen)
                    w.write(dod & ((1 << bits) - 1), bits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(dod & ((1 << 64) - 1), 64)

        vb = int(np.float64(vals[i]).view(np.int64)) & ((1 << 64) - 1)
        xor = vb ^ prev_bits
        prev_bits = vb
        if xor == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        leading = 64 - xor.bit_length()
        trailing = (xor & -xor).bit_length() - 1
        if leading > 31:
            leading = 31  # 5-bit field cap (paper's control block)
        if (
            prev_leading != -1
            and leading >= prev_leading
            and trailing >= 64 - prev_leading - prev_mean_len
        ):
            w.write(0, 1)
            shift = 64 - prev_leading - prev_mean_len
            w.write(xor >> shift, prev_mean_len)
        else:
            mean_len = 64 - leading - trailing
            w.write(1, 1)
            w.write(leading, 5)
            w.write(mean_len & 0x3F, 6)  # 64 encodes as 0
            w.write(xor >> trailing, mean_len)
            prev_leading, prev_mean_len = leading, mean_len
    return w.finish()


def gorilla_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    r = _BitReader(blob)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    bits0 = r.read(64)
    vals[0] = np.int64(bits0 - (1 << 64) if bits0 >= 1 << 63 else bits0).view(
        np.float64
    )
    prev_ts = t0
    prev_delta = 0
    prev_bits = bits0
    prev_leading = -1
    prev_mean_len = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                nbits = 7
            elif r.read(1) == 0:
                nbits = 9
            elif r.read(1) == 0:
                nbits = 12
            else:
                nbits = 64
            raw = r.read(nbits)
            if raw >= 1 << (nbits - 1):
                raw -= 1 << nbits
            dod = raw
        delta = prev_delta + dod
        prev_ts = prev_ts + delta
        prev_delta = delta
        ts[i] = prev_ts

        if r.read(1) == 0:
            xor = 0
        elif r.read(1) == 0:
            shift = 64 - prev_leading - prev_mean_len
            xor = r.read(prev_mean_len) << shift
        else:
            leading = r.read(5)
            mean_len = r.read(6)
            if mean_len == 0:
                mean_len = 64
            trailing = 64 - leading - mean_len
            xor = r.read(mean_len) << trailing
            prev_leading, prev_mean_len = leading, mean_len
        prev_bits ^= xor
        b = prev_bits
        vals[i] = np.int64(b - (1 << 64) if b >= 1 << 63 else b).view(np.float64)
    return ts, vals
