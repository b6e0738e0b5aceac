"""Time-series compression codecs: Gorilla XOR (float64) and
delta-of-delta (int64 timestamps).

Public algorithms from the Gorilla paper (Pelkonen et al., "Gorilla: A
Fast, Scalable, In-Memory Time Series Database", VLDB 2015) — see also
Chimp (VLDB'22) in PAPERS.md for context. Implemented from the paper's
description; no reference-repo analog exists (the reference compresses
with netCDF zlib, /root/reference/src/smos/interface.py:376 — Gorilla
is this engine's own payload codec per the north rule).

Encoding layout (bit-exact, little-endian bit order within our own
stream; self-contained):

Gorilla XOR values:
  [u64 count][u64 raw first value bits] then per value:
    xor == 0        → '0'
    reuse window    → '10' + meaningful bits (prev leading/length window)
    new window      → '11' + 5b leading + 6b (sig_len - 1) + sig bits
  NaNs roundtrip bit-exactly (we compare/store raw u64 bit patterns).

Delta-of-delta timestamps (µs precision, so the escape bucket is 64-bit
instead of the paper's 32-bit seconds):
  [u64 count][i64 first ts][i64 first delta] then per ts, dod =
    0                → '0'
    [-63, 64]        → '10'   + 7b  zigzag
    [-255, 256]      → '110'  + 9b  zigzag
    [-2047, 2048]    → '1110' + 12b zigzag
    else             → '1111' + 64b raw

These run inside Arrow-batched pandas UDFs / grouped-map kernels — the
Python loop is per *group* (one conversation's series), parallelized
across executors; no per-row Python crosses the JVM boundary.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "gorilla_encode",
    "gorilla_decode",
    "dod_encode",
    "dod_decode",
]


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        """Append the low `nbits` of value, MSB-first."""
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(nbits):
            byte = data[pos >> 3]
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    if x == 0:
        return 64
    return (x & -x).bit_length() - 1


def gorilla_encode(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode a float64 array → bytes. Bit-exact roundtrip
    (including NaN payloads)."""
    vals = np.asarray(values, dtype=np.float64)
    n = len(vals)
    bits = vals.view(np.uint64)
    w = _BitWriter()
    header = struct.pack("<Q", n)
    if n == 0:
        return header
    prev = int(bits[0])
    # leading cap 31 so it fits 5 bits (paper convention)
    prev_lead, prev_sig = 65, 0  # invalid window → first xor forces '11'
    out = [header, struct.pack("<Q", prev)]
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        if xor == 0:
            w.write(0, 1)
        else:
            lead = min(_clz64(xor), 31)
            trail = _ctz64(xor)
            sig = 64 - lead - trail
            if prev_lead <= lead and (64 - prev_lead - prev_sig) <= trail:
                # fits the previous window → '10' + prev_sig bits
                w.write(0b10, 2)
                w.write(xor >> (64 - prev_lead - prev_sig), prev_sig)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(sig - 1, 6)
                w.write(xor >> trail, sig)
                prev_lead, prev_sig = lead, sig
        prev = cur
    out.append(w.getvalue())
    return b"".join(out)


def gorilla_decode(blob: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<Q", blob, 0)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    (first,) = struct.unpack_from("<Q", blob, 8)
    out[0] = first
    r = _BitReader(blob[16:])
    prev = first
    lead, sig = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            xor = r.read(sig) << (64 - lead - sig)
        else:  # '11' new window
            lead = r.read(5)
            sig = r.read(6) + 1
            xor = r.read(sig) << (64 - lead - sig)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


_DOD_BUCKETS = (  # (max_abs_zigzag_bits, prefix, prefix_len)
    (7, 0b10, 2),
    (9, 0b110, 3),
    (12, 0b1110, 4),
)


def dod_encode(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 (µs) timestamp array → bytes."""
    t = np.asarray(ts, dtype=np.int64)
    n = len(t)
    header = struct.pack("<Q", n)
    if n == 0:
        return header
    if n == 1:
        return header + struct.pack("<q", int(t[0]))
    first_delta = int(t[1]) - int(t[0])
    out = [header, struct.pack("<qq", int(t[0]), first_delta)]
    deltas = np.diff(t)  # int64; timestamp deltas cannot overflow
    w = _BitWriter()
    prev_delta = first_delta
    for i in range(1, len(deltas)):
        d = int(deltas[i])
        dod = d - prev_delta
        prev_delta = d
        if dod == 0:
            w.write(0, 1)
            continue
        z = _zigzag(dod)
        for nbits, prefix, plen in _DOD_BUCKETS:
            if z < (1 << nbits):
                w.write(prefix, plen)
                w.write(z, nbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    out.append(w.getvalue())
    return b"".join(out)


def dod_decode(blob: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<Q", blob, 0)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    if n == 1:
        (out[0],) = struct.unpack_from("<q", blob, 8)
        return out
    first, first_delta = struct.unpack_from("<qq", blob, 8)
    out[0] = first
    out[1] = first + first_delta
    r = _BitReader(blob[24:])
    delta = first_delta
    cur = int(out[1])
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            matched = False
            for nbits, prefix, plen in _DOD_BUCKETS:
                if r.read(1) == 0:  # next prefix bit 0 terminates
                    dod = _unzigzag(r.read(nbits))
                    matched = True
                    break
            if not matched:
                raw = r.read(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        cur += delta
        out[i] = cur
    return out
