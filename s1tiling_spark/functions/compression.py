"""Gorilla XOR float compression + delta-of-delta timestamp encoding.

Public algorithms from the Gorilla paper (Pelkonen et al., "Gorilla: A
Fast, Scalable, In-Memory Time Series Database", VLDB 2015):

- floats: XOR against the previous value; '0' bit for identical, '10' +
  meaningful bits when the XOR fits the previous leading/trailing-zero
  window, '11' + 5-bit leading-zero count + 6-bit significant-bit length
  + bits otherwise.
- timestamps: delta-of-delta with variable-width buckets
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b).

These are *bit-pattern* codecs — deterministic regardless of execution
order or parallelism (SURVEY §7 "What's hard" #1). The reference's
analog is its on-disk codec choice DEFLATE+PREDICTOR=3 for float32
rasters (`/root/reference/s1tiling/libs/configuration.py:759-813`).

The numpy kernels below run inside ``applyInPandas`` groups (see
:mod:`s1tiling_spark.operators.compress`): Arrow moves whole column
batches, the driver never sees a row, and there is no per-Spark-row
Python. XOR/leading-zero analysis is vectorized with numpy; only the
final bit-emit walks values (bounded by the block size, which the
grouping keys cap).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, width: int) -> int:
        out = 0
        remaining = width
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 → 64)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # float64 exponent trick is unsafe near 2^64; use bit_length via log2 on hi/lo halves
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi_nz = hi != 0
    bl_hi = np.zeros(x.shape, dtype=np.int64)
    bl_lo = np.zeros(x.shape, dtype=np.int64)
    with np.errstate(divide="ignore"):
        bl_hi[hi_nz] = np.floor(np.log2(hi[hi_nz].astype(np.float64))).astype(np.int64) + 1
        lo_nz = (~hi_nz) & (lo != 0)
        bl_lo[lo_nz] = np.floor(np.log2(lo[lo_nz].astype(np.float64))).astype(np.int64) + 1
    bits = np.where(hi_nz, 32 + bl_hi, bl_lo)
    out[nz] = 64 - bits[nz]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 → 64)."""
    lowbit = x & (~x + np.uint64(1))
    return np.where(x == 0, 64, 64 - _clz64(lowbit) - 1)


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 series. Header: uint32 count + first value raw."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    bits = v.view(np.uint64)
    n = len(v)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(bits[0]), 64)
    if n > 1:
        xors = bits[1:] ^ bits[:-1]
        lead = np.minimum(_clz64(xors), 31)  # 5-bit field
        trail = _ctz64(xors)
        prev_lead, prev_trail = 65, 65  # invalid → force '11' first time
        for i in range(n - 1):
            x = int(xors[i])
            if x == 0:
                w.write(0, 1)
                continue
            l, t = int(lead[i]), int(trail[i])
            if prev_lead <= 64 and l >= prev_lead and t >= prev_trail:
                meaningful = 64 - prev_lead - prev_trail
                w.write(0b10, 2)
                w.write(x >> prev_trail, meaningful)
            else:
                meaningful = 64 - l - t
                w.write(0b11, 2)
                w.write(l, 5)
                w.write(meaningful - 1, 6)  # 1..64 stored as 0..63
                w.write(x >> t, meaningful)
                prev_lead, prev_trail = l, t
    return w.bytes()


def gorilla_decode(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = r.read(64)
    out[0] = cur
    lead = trail = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:  # '10': reuse window
            meaningful = 64 - lead - trail
            x = r.read(meaningful) << trail
        else:  # '11': new window
            lead = r.read(5)
            meaningful = r.read(6) + 1
            trail = 64 - lead - meaningful
            x = r.read(meaningful) << trail
        cur ^= x
        out[i] = cur
    return out.view(np.float64)


_DOD_BUCKETS = (
    (63, 0b10, 2, 7),
    (255, 0b110, 3, 9),
    (2047, 0b1110, 4, 12),
)


def dod_encode(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (any unit, e.g. epoch
    seconds). Header: uint32 count + first ts 64b + first delta 64b."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(t[0]), 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(t)
    w.write(int(deltas[0]), 64)
    dods = np.diff(deltas)
    for d in dods:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        for lim, prefix, pw, bw in _DOD_BUCKETS:
            if -lim - 1 <= d <= lim:
                w.write(prefix, pw)
                w.write(d, bw)
                break
        else:
            w.write(0b1111, 4)
            w.write(d, 64)
    return w.bytes()


def _wrap64(v: int) -> int:
    """Wrap to signed int64 (numpy's diff wraps mod 2^64; mirror it)."""
    return ((v + (1 << 63)) & ((1 << 64) - 1)) - (1 << 63)


def dod_decode(data: bytes) -> np.ndarray:
    def _signed(v: int, width: int) -> int:
        return v - (1 << width) if v >= (1 << (width - 1)) else v

    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = _signed(r.read(64), 64)
    if n == 1:
        return out
    delta = _signed(r.read(64), 64)
    out[1] = _wrap64(int(out[0]) + delta)
    for i in range(2, n):
        if r.read(1) == 0:
            pass
        elif r.read(1) == 0:
            delta = _wrap64(delta + _signed(r.read(7), 7))
        elif r.read(1) == 0:
            delta = _wrap64(delta + _signed(r.read(9), 9))
        elif r.read(1) == 0:
            delta = _wrap64(delta + _signed(r.read(12), 12))
        else:
            delta = _wrap64(delta + _signed(r.read(64), 64))
        out[i] = _wrap64(int(out[i - 1]) + delta)
    return out
