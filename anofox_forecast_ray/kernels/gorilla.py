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


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x > 0)."""
    # smear the highest bit downward, then popcount via the bit trick
    y = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    # popcount of y == bit_length of x
    y = y - ((y >> np.uint64(1)) & np.uint64(0x5555555555555555))
    y = (y & np.uint64(0x3333333333333333)) + (
        (y >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    y = (y + (y >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    bitlen = (y * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return (np.uint64(64) - bitlen).astype(np.uint64)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x > 0)."""
    low = x & (~x + np.uint64(1))  # isolate lowest set bit (power of two)
    # log2 of an exact power of two is exact in float64 for bits 0..63
    return np.log2(low.astype(np.float64)).astype(np.uint64)


def _pack_bits_msb(codes: np.ndarray, bits: np.ndarray) -> bytes:
    """Pack variable-length MSB-first codes (each <= 64 bits) into bytes.

    Vectorized: each code contributes to at most two 64-bit big-endian
    words; contributions are in word order, so per-word OR-reduction is a
    ``np.bitwise_or.reduceat`` over segment boundaries.
    """
    codes = codes.astype(np.uint64)
    bits = bits.astype(np.int64)
    keep = bits > 0
    codes, bits = codes[keep], bits[keep]
    if codes.size == 0:
        return b""
    end = np.cumsum(bits)
    start = end - bits
    total_bits = int(end[-1])
    n_words = (total_bits + 63) // 64
    word0 = start >> 6
    rel = (start & 63).astype(np.int64)          # bit offset within word
    avail = 64 - rel                              # bits available in word0
    fits = bits <= avail
    # word0 contribution
    lsh = np.where(fits, avail - bits, 0).astype(np.uint64)
    rsh = np.where(fits, 0, bits - avail).astype(np.uint64)
    c0 = np.where(fits, codes << lsh, codes >> rsh)
    # word1 contribution (only when spilling)
    spill = ~fits
    c1 = np.zeros_like(codes)
    if spill.any():
        sh1 = (np.uint64(64) - rsh[spill].astype(np.uint64)) & np.uint64(63)
        c1[spill] = codes[spill] << sh1
    # merge (word_index, contribution) pairs, already sorted by word
    widx = np.empty(codes.size * 2, dtype=np.int64)
    wval = np.empty(codes.size * 2, dtype=np.uint64)
    widx[0::2] = word0
    widx[1::2] = word0 + 1
    wval[0::2] = c0
    wval[1::2] = np.where(spill, c1, np.uint64(0))
    live = wval != 0
    # always keep word0 entries so every word with content survives
    live[0::2] = True
    widx, wval = widx[live], wval[live]
    out = np.zeros(n_words, dtype=np.uint64)
    seg = np.flatnonzero(np.concatenate(([True], widx[1:] != widx[:-1])))
    out[widx[seg]] = np.bitwise_or.reduceat(wval, seg)
    return out.byteswap().tobytes()[: (total_bits + 7) // 8]


_PREFIX = {7: (0b10, 2), 9: (0b110, 3), 12: (0b1110, 4), 64: (0b1111, 4)}


def gorilla_encode_fast(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Vectorized encoder producing the same decodable format.

    Trades the paper's previous-block reuse path for vectorizability: every
    non-zero XOR is written with a fresh control block ('1'+'1'+5-bit
    leading+6-bit length+meaningful bits), which removes the sequential
    control-state dependency. ``gorilla_decode`` reads both forms; blobs
    are <= ~11 bits/point larger than the sequential encoder's.
    """
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = ts.size
    if n < 2:
        return gorilla_encode(ts, vals)

    # --- timestamp codes ---
    delta = np.diff(ts)
    dod = np.diff(np.concatenate(([0], delta)))
    u = dod.astype(np.uint64)
    codes_ts = np.zeros((n - 1, 2), dtype=np.uint64)   # prefix, payload
    bits_ts = np.zeros((n - 1, 2), dtype=np.int64)
    zero = dod == 0
    bits_ts[zero, 0] = 1   # code 0
    for b, lo, hi, prefix, plen in _TS_RANGES:
        m = (~zero) & (dod >= lo) & (dod <= hi) & (bits_ts[:, 0] == 0)
        codes_ts[m, 0] = prefix
        bits_ts[m, 0] = plen
        codes_ts[m, 1] = u[m] & np.uint64((1 << b) - 1)
        bits_ts[m, 1] = b
    rest = (~zero) & (bits_ts[:, 0] == 0)
    codes_ts[rest, 0] = 0b1111
    bits_ts[rest, 0] = 4
    codes_ts[rest, 1] = u[rest]
    bits_ts[rest, 1] = 64

    # --- value codes ---
    bits_v = vals.view(np.uint64)
    xor = bits_v[1:] ^ bits_v[:-1]
    nz = xor != 0
    codes_val = np.zeros((n - 1, 2), dtype=np.uint64)  # header, payload
    bits_val = np.zeros((n - 1, 2), dtype=np.int64)
    bits_val[~nz, 0] = 1   # code 0
    if nz.any():
        x = xor[nz]
        lead = np.minimum(_clz64(x), np.uint64(31))
        trail = _ctz64(x)
        mean_len = (np.uint64(64) - lead - trail).astype(np.uint64)
        # header: '1'(changed) '1'(new block) + 5b leading + 6b (len & 63)
        header = (
            (np.uint64(0b11) << np.uint64(11))
            | (lead << np.uint64(6))
            | (mean_len & np.uint64(63))
        )
        codes_val[nz, 0] = header
        bits_val[nz, 0] = 13
        codes_val[nz, 1] = x >> trail
        bits_val[nz, 1] = mean_len.astype(np.int64)

    # interleave per point: ts prefix, ts payload, val header, val payload
    codes = np.empty((n - 1, 4), dtype=np.uint64)
    bits = np.empty((n - 1, 4), dtype=np.int64)
    codes[:, 0:2] = codes_ts
    bits[:, 0:2] = bits_ts
    codes[:, 2:4] = codes_val
    bits[:, 2:4] = bits_val

    # header: 32-bit count, 64-bit ts0, 64-bit val0 — via the bit writer
    w = _BitWriter()
    w.write(n, 32)
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    w.write(int(bits_v[0]), 64)
    head = w.finish()
    # the header is whole bytes (160 bits), so the packed stream appends
    body = _pack_bits_msb(codes.ravel(), bits.ravel())
    return head + body


_R16 = np.arange(16, dtype=np.int64)
_PREFIX_LEN = np.array(
    [1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 4, 4], dtype=np.int64
)
_PAYLOAD_LEN = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 7, 7, 7, 7, 9, 9, 12, 64], dtype=np.int64
)


def gorilla_decode_many(
    blobs,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lockstep-vectorized decode of MANY blobs at once.

    The Gorilla stream is inherently sequential *within* a blob (every XOR
    block chains on the previous value), so per-blob decode can't be
    vectorized — but a batch holds one blob per (doc, tier), and decoding
    K blobs in lockstep turns the per-bit Python interpreter work into
    numpy ops over K-wide state arrays. Blobs are processed sorted by
    point count ascending, so at step ``i`` the active lanes are a
    contiguous SUFFIX of the state arrays — plain slices, no masks or
    gathers. Bit windows are fetched as one 16-byte gather viewed as two
    big-endian u64 words (a 64-bit read at any bit offset).

    Bitwise-identical to ``gorilla_decode`` per blob (both encoder forms).

    Lockstep only pays while many lanes are active (each step costs a
    fixed ~25 numpy dispatches regardless of width), so blobs long enough
    to outlive the crowd — those still running once fewer than
    ``min_lanes`` lanes remain — are decoded by the sequential scalar
    decoder instead; measured crossover is ~64 active lanes.

    Returns ``(offsets, window_ids, values)`` where ``offsets`` is
    ``int64[K+1]`` into the flat ``window_ids:int64`` / ``values:float64``
    arrays (blob k decodes to ``[offsets[k], offsets[k+1])``).
    """
    K = len(blobs)
    if K == 0:
        z = np.zeros(0, dtype=np.int64)
        return np.zeros(1, dtype=np.int64), z, z.view(np.float64)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=K)
    starts = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    buf = np.frombuffer(b"".join(blobs) + b"\x00" * 16, dtype=np.uint8)

    def peek64(pos: np.ndarray) -> np.ndarray:
        """64 bits starting at each (absolute) bit offset, MSB-aligned."""
        byte = pos >> 3
        w = buf[byte[:, None] + _R16].view(">u8").astype(np.uint64)
        hi, lo = w[:, 0], w[:, 1]
        r = (pos & 7).astype(np.uint64)
        spill = np.where(
            r == 0, np.uint64(0), lo >> (np.uint64(64) - r)
        )
        return (hi << r) | spill

    pos0 = starts[:K] * 8
    n = (peek64(pos0) >> np.uint64(32)).astype(np.int64)
    total = int(n.sum())
    offsets = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(n, out=offsets[1:])
    ts_flat = np.empty(total, dtype=np.int64)
    val_bits = np.empty(total, dtype=np.uint64)

    # Split lanes: the j longest blobs decode sequentially when the
    # lockstep loop's fixed per-step dispatch cost over their solo tail
    # exceeds scalar decode of the whole blob. Costs are measured on this
    # host (fixed ~75us/step, ~0.21us/lane-step, scalar ~0.9us/point);
    # only the ratios matter, and the argmin is exact for this model.
    ord_asc = np.argsort(n, kind="stable")
    n_sorted = n[ord_asc]
    csum = np.concatenate(([0], np.cumsum(n_sorted)))
    total_pts = csum[-1]
    j = np.arange(K + 1)
    nmax_rem = np.concatenate(([0], n_sorted))[K - j]
    pts_seq = total_pts - csum[K - j]
    cost = 75.0 * nmax_rem + 0.21 * (total_pts - pts_seq) + 0.9 * pts_seq
    jbest = int(np.argmin(cost))
    for k in ord_asc[K - jbest:] if jbest else ():
        b = blobs[k]
        t, v = gorilla_decode(b if isinstance(b, bytes) else bytes(b))
        ts_flat[offsets[k]:offsets[k + 1]] = t
        val_bits[offsets[k]:offsets[k + 1]] = v.view(np.uint64)

    sub = ord_asc[:K - jbest]
    M = sub.size
    n_s = n[sub]
    pos = pos0[sub] + 160
    out_base = offsets[:K][sub]
    ts0 = peek64(pos0[sub] + 32).view(np.int64)
    v0 = peek64(pos0[sub] + 96)
    have = n_s >= 1
    ts_flat[out_base[have]] = ts0[have]
    val_bits[out_base[have]] = v0[have]
    prev_ts = ts0.copy()
    prev_delta = np.zeros(M, dtype=np.int64)
    prev_bits = v0.copy()
    prev_lead = np.zeros(M, dtype=np.int64)
    prev_mlen = np.zeros(M, dtype=np.int64)

    n_max = int(n_s[-1]) if M else 0
    c64 = np.uint64(64)
    for i in range(1, n_max):
        s = int(np.searchsorted(n_s, i, side="right"))
        p = pos[s:]
        w = peek64(p)

        # --- timestamp: 4-bit prefix class lookup, payload in-window ---
        top = (w >> np.uint64(60)).astype(np.int64)
        pre = _PREFIX_LEN[top]
        pl = _PAYLOAD_LEN[top]
        payload = (w << pre.astype(np.uint64)) >> (
            c64 - np.maximum(pl, 1).astype(np.uint64)
        )
        big = pl == 64
        if big.any():
            payload[big] = peek64(p[big] + 4)
        sh = (c64 - np.maximum(pl, 1).astype(np.uint64))
        dod = (payload << sh).view(np.int64) >> sh.astype(np.int64)
        dod[pl == 0] = 0
        d = prev_delta[s:]
        d += dod
        t = prev_ts[s:]
        t += d
        ts_flat[out_base[s:] + i] = t
        p = p + pre + pl

        # --- value: control bits, optional 11-bit header, payload ---
        w2 = peek64(p)
        changed = (w2 >> np.uint64(63)).astype(bool)
        newblk = changed & (((w2 >> np.uint64(62)) & np.uint64(1)) == 1)
        hdr = ((w2 >> np.uint64(51)) & np.uint64(0x7FF)).astype(np.int64)
        lead_new = hdr >> 6
        ml_new = hdr & 63
        ml_new[ml_new == 0] = 64
        lead = np.where(newblk, lead_new, prev_lead[s:])
        mlen_state = np.where(newblk, ml_new, prev_mlen[s:])
        prev_lead[s:] = lead
        prev_mlen[s:] = mlen_state
        consumed = np.where(changed, np.where(newblk, 13, 2), 1)
        mlen = np.where(changed, mlen_state, 0)
        wp = peek64(p + consumed)
        # shift counts are only valid on `changed` lanes; others are
        # masked out by the where (numpy shifts never raise)
        pay = wp >> (c64 - np.maximum(mlen, 1).astype(np.uint64))
        vshift = (
            c64
            - np.minimum(lead + mlen_state, 64).astype(np.uint64)
        )
        prev_bits[s:] ^= np.where(changed, pay << vshift, np.uint64(0))
        val_bits[out_base[s:] + i] = prev_bits[s:]
        pos[s:] = p + consumed + mlen

    return offsets, ts_flat, val_bits.view(np.float64)


def gorilla_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Bitwise-exact inverse of ``gorilla_encode``.

    The bit cursor is inlined as a local big-int accumulator (no per-bit
    divmod / method dispatch; the stream itself is inherently sequential:
    every XOR block chains on the previous value). Refills pull EIGHT
    bytes at a time via int.from_bytes on a zero-padded copy — one
    interpreter op loads 64 bits, so the refill while-loops run at most
    once per field instead of once per byte (~1.5x over the per-byte
    cursor; padding past the end is never consumed as data because every
    field length is read from the stream itself). Stale high bits are
    masked once per refill, not after every field read — each extract is
    a single shift+mask."""
    nbytes = len(blob)
    data = memoryview(blob + b"\x00" * 8)
    acc = 0       # right-aligned unread bits
    nacc = 0      # number of unread bits in acc
    bytepos = 0

    def _read(bits):
        nonlocal acc, nacc, bytepos
        while nacc < bits:
            acc = ((acc & ((1 << nacc) - 1)) << 64) | int.from_bytes(
                data[bytepos:bytepos + 8], "big")
            bytepos += 8
            nacc += 64
        nacc -= bits
        return (acc >> nacc) & ((1 << bits) - 1)

    n = _read(32)
    ts = np.empty(n, dtype=np.int64)
    vals_bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals_bits.view(np.float64)
    t0 = _read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    bits0 = _read(64)
    vals_bits[0] = bits0
    prev_ts = t0
    prev_delta = 0
    prev_bits = bits0
    prev_leading = -1
    prev_mean_len = 0
    # hot loop: the bit cursor is inlined as plain locals (acc/nacc);
    # single-bit control reads cost a shift+mask, multi-bit payloads one
    # refill loop — no function calls, no divmod
    for i in range(1, n):
        if nacc == 0:
            acc = int.from_bytes(data[bytepos:bytepos + 8], "big")
            bytepos += 8
            nacc = 64
        nacc -= 1
        bit = (acc >> nacc) & 1
        if bit == 0:
            dod = 0
        else:
            nbits = 0
            for cand in (7, 9, 12):
                if nacc == 0:
                    acc = int.from_bytes(data[bytepos:bytepos + 8], "big")
                    bytepos += 8
                    nacc = 64
                nacc -= 1
                bit = (acc >> nacc) & 1
                if bit == 0:
                    nbits = cand
                    break
            if nbits == 0:
                nbits = 64
            while nacc < nbits:
                acc = ((acc & ((1 << nacc) - 1)) << 64) \
                    | int.from_bytes(data[bytepos:bytepos + 8], "big")
                bytepos += 8
                nacc += 64
            nacc -= nbits
            raw = (acc >> nacc) & ((1 << nbits) - 1)
            if raw >= 1 << (nbits - 1):
                raw -= 1 << nbits
            dod = raw
        delta = prev_delta + dod
        prev_ts = prev_ts + delta
        prev_delta = delta
        ts[i] = prev_ts

        if nacc == 0:
            acc = int.from_bytes(data[bytepos:bytepos + 8], "big")
            bytepos += 8
            nacc = 64
        nacc -= 1
        bit = (acc >> nacc) & 1
        if bit == 0:
            pass  # xor == 0: value repeats
        else:
            if nacc == 0:
                acc = int.from_bytes(data[bytepos:bytepos + 8], "big")
                bytepos += 8
                nacc = 64
            nacc -= 1
            bit = (acc >> nacc) & 1
            if bit == 0:
                shift = 64 - prev_leading - prev_mean_len
                mlen = prev_mean_len
            else:
                while nacc < 11:
                    acc = ((acc & ((1 << nacc) - 1)) << 64) \
                        | int.from_bytes(data[bytepos:bytepos + 8], "big")
                    bytepos += 8
                    nacc += 64
                nacc -= 11
                hdr = (acc >> nacc) & 0x7FF
                leading = hdr >> 6
                mean_len = hdr & 0x3F
                if mean_len == 0:
                    mean_len = 64
                shift = 64 - leading - mean_len
                mlen = mean_len
                prev_leading, prev_mean_len = leading, mean_len
            while nacc < mlen:
                acc = ((acc & ((1 << nacc) - 1)) << 64) \
                    | int.from_bytes(data[bytepos:bytepos + 8], "big")
                bytepos += 8
                nacc += 64
            nacc -= mlen
            prev_bits ^= ((acc >> nacc) & ((1 << mlen) - 1)) << shift
        vals_bits[i] = prev_bits
    assert bytepos * 8 - nacc <= (nbytes + 8) * 8
    return ts, vals_bits.view(np.float64)


def gorilla_encode_many(
    timestamps: np.ndarray,
    values: np.ndarray,
    offsets: np.ndarray,
):
    """Lockstep-vectorized PAPER-EXACT encode of MANY blobs at once.

    Input is the flat lane-major layout (lane k's points occupy
    ``[offsets[k], offsets[k+1])``); returns a ``pyarrow.BinaryArray`` of
    K blobs, each byte-identical to ``gorilla_encode`` on that lane.

    Everything per-point is state-free and computes flat-vectorized
    (delta-of-delta classes, XOR lead/trail); only the paper's
    control-block reuse decision chains on per-lane state, so that chain
    runs lockstep over TIME STEPS with the active lanes as a suffix of
    the length-sorted lane list (the ``gorilla_decode_many`` trick) —
    per-step work is ~10 numpy ops on gather/scatter index vectors, no
    2D padding, so one huge lane cannot blow up memory. Lanes long
    enough to outlive the crowd are routed to the scalar encoder by the
    same measured-cost argmin as the decoder (bytes identical either
    way — both are the paper algorithm).

    All emissions land in a flat (4N + 4K)-slot (code, bits) table laid
    out lane-major: [count, ts0, v0] header slots, 4 slots per point
    (ts prefix, ts payload, value control(+block header), value
    payload), and one byte-align pad slot per lane — packed by a single
    ``_pack_bits_msb`` call; per-lane byte ranges become the arrow
    binary column zero-copy.
    """
    import pyarrow as pa

    ts = np.ascontiguousarray(timestamps, dtype=np.int64)
    vals = np.ascontiguousarray(values, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    K = offsets.size - 1
    N = ts.size
    n = np.diff(offsets)
    if K == 0:
        return pa.array([], type=pa.binary())

    vbits = vals.view(np.uint64)
    is_first = np.zeros(N, dtype=bool)
    is_first[offsets[:-1][n > 0]] = True

    # ---- timestamps: dod per point (state-free), then class codes ----
    dod = np.zeros(N, dtype=np.int64)
    if N > 1:
        dod[1:] = ts[1:] - 2 * ts[:-1]
        dod[2:] += ts[:-2]
    # pos==1 points: dod = ts[i] - ts[i-1] (prev_delta = 0)
    second = np.zeros(N, dtype=bool)
    sec_idx = offsets[:-1][n > 1] + 1
    second[sec_idx] = True
    dod[sec_idx] = ts[sec_idx] - ts[sec_idx - 1]
    dod[is_first] = 0

    codes = np.zeros((N, 4), dtype=np.uint64)
    bits = np.zeros((N, 4), dtype=np.int64)
    body = ~is_first
    zero_d = body & (dod == 0)
    bits[zero_d, 0] = 1  # code '0'
    assigned = zero_d
    u = dod.astype(np.uint64)
    for b, lo_, hi_, prefix, plen in _TS_RANGES:
        m = body & ~assigned & (dod >= lo_) & (dod <= hi_)
        codes[m, 0] = prefix
        bits[m, 0] = plen
        codes[m, 1] = u[m] & np.uint64((1 << b) - 1)
        bits[m, 1] = b
        assigned |= m
    rest = body & ~assigned
    codes[rest, 0] = 0b1111
    bits[rest, 0] = 4
    codes[rest, 1] = u[rest]
    bits[rest, 1] = 64

    # ---- values: xor geometry per point (state-free) ----
    xor = np.zeros(N, dtype=np.uint64)
    if N > 1:
        xor[1:] = vbits[1:] ^ vbits[:-1]
    xor[is_first] = 0
    nz = body & (xor != 0)
    lead = np.zeros(N, dtype=np.int64)
    trail = np.zeros(N, dtype=np.int64)
    if nz.any():
        lead[nz] = np.minimum(_clz64(xor[nz]), np.uint64(31)).astype(np.int64)
        trail[nz] = _ctz64(xor[nz]).astype(np.int64)
    bits[body & ~nz, 2] = 1  # code '0': value repeats

    # ---- control-state chain: lockstep over steps, cost-split tail ----
    ord_asc = np.argsort(n, kind="stable")
    n_sorted = n[ord_asc]
    csum = np.concatenate(([0], np.cumsum(n_sorted)))
    total_pts = csum[-1]
    j = np.arange(K + 1)
    nmax_rem = np.concatenate(([0], n_sorted))[K - j]
    pts_seq = total_pts - csum[K - j]
    cost = 15.0 * nmax_rem + 0.2 * (total_pts - pts_seq) + 6.0 * pts_seq
    jbest = int(np.argmin(cost))
    seq_lanes = ord_asc[K - jbest:] if jbest else np.zeros(0, dtype=np.int64)
    sub = ord_asc[: K - jbest]
    sub = sub[n[sub] > 1]

    off_s = offsets[:-1][sub]
    n_s = n[sub]
    M = sub.size
    st_have = np.zeros(M, dtype=bool)
    st_lead = np.zeros(M, dtype=np.int64)
    st_mlen = np.zeros(M, dtype=np.int64)
    n_max = int(n_s[-1]) if M else 0
    # The loop records only the per-point reuse DECISION (and the state it
    # reused); code emission happens vectorized afterwards — 3 scatters
    # per step instead of 10 (2.5x on skewed lanes).
    reuse_flag = np.zeros(N, dtype=bool)
    use_pl = np.zeros(N, dtype=np.int64)
    use_pm = np.zeros(N, dtype=np.int64)
    if n_max > 1:
        s_of_t = np.searchsorted(n_s, np.arange(1, n_max), side="right")
        for t in range(1, n_max):
            s = int(s_of_t[t - 1])
            idx = off_s[s:] + t
            ch = nz[idx]
            ld = lead[idx]
            tr = trail[idx]
            pl = st_lead[s:]
            pm = st_mlen[s:]
            reuse = ch & st_have[s:] & (ld >= pl) & (tr >= 64 - pl - pm)
            newblk = ch & ~reuse
            reuse_flag[idx] = reuse
            use_pl[idx] = pl
            use_pm[idx] = pm
            st_lead[s:] = np.where(newblk, ld, pl)
            st_mlen[s:] = np.where(newblk, 64 - ld - tr, pm)
            st_have[s:] |= newblk
    # vectorized emission (seq-fallback lanes emit too but their slots are
    # zeroed below before packing)
    rs = nz & reuse_flag
    codes[rs, 2] = 0b10
    bits[rs, 2] = 2
    codes[rs, 3] = xor[rs] >> (64 - use_pl[rs] - use_pm[rs]).astype(
        np.uint64
    )
    bits[rs, 3] = use_pm[rs]
    nb = nz & ~reuse_flag
    ml = 64 - lead[nb] - trail[nb]
    codes[nb, 2] = (
        (np.uint64(0b11) << np.uint64(11))
        | (lead[nb].astype(np.uint64) << np.uint64(6))
        | (ml.astype(np.uint64) & np.uint64(63))
    )
    bits[nb, 2] = 13
    codes[nb, 3] = xor[nb] >> trail[nb].astype(np.uint64)
    bits[nb, 3] = ml

    # scalar fallback for the few longest lanes (byte-identical algorithm)
    seq_blobs = {}
    for k in seq_lanes:
        a, b2 = offsets[k], offsets[k + 1]
        seq_blobs[int(k)] = gorilla_encode(ts[a:b2], vals[a:b2])

    # ---- assemble lane-major slot table: headers + points + pad ----
    # lane k's slots start at 4*offsets[k] + 4*k
    lane_start_slot = 4 * offsets[:-1] + 4 * np.arange(K)
    total_slots = 4 * N + 4 * K
    fc = np.zeros(total_slots, dtype=np.uint64)
    fb = np.zeros(total_slots, dtype=np.int64)
    # headers
    fc[lane_start_slot] = n.astype(np.uint64)
    fb[lane_start_slot] = 32
    first_idx = offsets[:-1].copy()
    has_pts = n > 0
    fi = first_idx[has_pts]
    fc[lane_start_slot[has_pts] + 1] = ts[fi].astype(np.uint64)
    fb[lane_start_slot[has_pts] + 1] = 64
    fc[lane_start_slot[has_pts] + 2] = vbits[fi]
    fb[lane_start_slot[has_pts] + 2] = 64
    # point slots: flat point i of lane k -> slots lane_start_slot[k] + 3
    # + 4*(i - offsets[k]) .. +3
    lane_of_pt = np.repeat(np.arange(K), n)
    pt_slot = lane_start_slot[lane_of_pt] + 3 + 4 * (
        np.arange(N) - offsets[:-1][lane_of_pt]
    )
    for c in range(4):
        fc[pt_slot + c] = codes[:, c]
        fb[pt_slot + c] = bits[:, c]
    # pad slots close each lane to a byte boundary
    lane_bits = np.zeros(K, dtype=np.int64)
    if N:
        lane_bits = np.add.reduceat(
            bits.sum(axis=1), offsets[:-1].clip(max=N - 1)
        ) * (n > 0)
    lane_bits = lane_bits + 32 + np.where(n > 0, 128, 0)
    pad = (-lane_bits) % 8
    fc[lane_start_slot + 3 + 4 * n] = 0
    fb[lane_start_slot + 3 + 4 * n] = pad
    # lanes encoded by the scalar fallback contribute no packed slots
    if jbest:
        for k in seq_lanes:
            s0 = lane_start_slot[k]
            s1 = s0 + 4 + 4 * n[k]
            fb[s0:s1] = 0

    packed = _pack_bits_msb(fc, fb)
    lane_nbytes = (lane_bits + pad) // 8
    if jbest:
        lane_nbytes[seq_lanes] = [len(seq_blobs[int(k)]) for k in seq_lanes]
    out_off = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(lane_nbytes, out=out_off[1:])
    if jbest:
        # splice scalar blobs into the byte stream at their lane positions
        buf = bytearray(int(out_off[-1]))
        src = memoryview(packed)
        spos = 0
        seq_set = set(int(k) for k in seq_lanes)
        for k in range(K):
            a, b2 = int(out_off[k]), int(out_off[k + 1])
            if k in seq_set:
                buf[a:b2] = seq_blobs[k]
            else:
                m = b2 - a
                buf[a:b2] = src[spos:spos + m]
                spos += m
        data = bytes(buf)
    else:
        data = packed
    return pa.Array.from_buffers(
        pa.binary(), K,
        [None, pa.py_buffer(out_off.astype(np.int32).tobytes()),
         pa.py_buffer(data)],
    )
