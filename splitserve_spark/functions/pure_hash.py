"""Pure-Python reimplementations of Spark's partition-hash functions,
from the published algorithms — the independent second entry that lets
`fn_hash_partitioning` carry an exact cross-checked oracle instead of a
rows-only count.

Spark's `hash()` is Murmur3_x86_32 (Austin Appleby's public MurmurHash3,
via Guava) with Spark's byte-wise tail: trailing non-aligned bytes are
SIGN-EXTENDED and each run through a full mixK1/mixH1 round (reference
`common/unsafe/.../Murmur3_x86_32.java:63-73` hashUnsafeBytes;
`catalyst/expressions/hash.scala:521`).  For 4-byte-aligned input the
variant coincides with canonical MurmurHash3, so the published SMHasher
verification vectors apply (tested).

Spark's `xxhash64()` is Yann Collet's canonical xxHash64 (public spec,
github.com/Cyan4973/xxHash) — 32-byte stripes, 8/4-byte then byte-wise
tail, all unsigned (reference `catalyst/expressions/XXH64.java:88-106`;
`hash.scala:552`).  The canonical empty-input vector applies (tested).

Both default to Spark's seed 42.  These are spec reimplementations in
Python-native arithmetic (masked bigints), not transcriptions — every
operation chain is checked against the published algorithm and pinned
by known-answer + cross-engine tests.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF

_C1, _C2 = 0xCC9E2D51, 0x1B873593

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _mix_k1(k1: int) -> int:
    return (_rotl32((k1 * _C1) & _M32, 15) * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    return (_rotl32(h1 ^ k1, 13) * 5 + 0xE6546B64) & _M32


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """Spark-variant Murmur3_x86_32 → SIGNED int32 (what `hash()`
    returns).  Aligned 4-byte little-endian words, then one full mix
    round per trailing byte with the byte sign-extended to int32."""
    h1 = seed & _M32
    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for b in data[n_aligned:]:
        signed = b | 0xFFFFFF00 if b > 0x7F else b  # sign-extend the byte
        h1 = _mix_h1(h1, _mix_k1(signed))
    h1 ^= len(data)
    h1 = ((h1 ^ (h1 >> 16)) * 0x85EBCA6B) & _M32
    h1 = ((h1 ^ (h1 >> 13)) * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _xx_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Canonical xxHash64 → SIGNED int64 (what `xxhash64()` returns)."""
    n, pos = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            lanes = [
                int.from_bytes(data[pos + 8 * j : pos + 8 * j + 8], "little")
                for j in range(4)
            ]
            v1, v2 = _xx_round(v1, lanes[0]), _xx_round(v2, lanes[1])
            v3, v4 = _xx_round(v3, lanes[2]), _xx_round(v4, lanes[3])
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xx_round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k1 = int.from_bytes(data[pos : pos + 8], "little")
        h = (_rotl64(h ^ _xx_round(0, k1), 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        k1 = int.from_bytes(data[pos : pos + 4], "little")
        h = (_rotl64(h ^ (k1 * _P1) & _M64, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl64(h ^ (data[pos] * _P5) & _M64, 11) * _P1) & _M64
        pos += 1
    h = ((h ^ (h >> 33)) * _P2) & _M64
    h = ((h ^ (h >> 29)) * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
