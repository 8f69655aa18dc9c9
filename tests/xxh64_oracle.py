"""Pure-Python XXH64 (seed 42) — an INDEPENDENT oracle for Spark's
``xxhash64`` expression, implementing the public xxHash specification
(https://github.com/Cyan4973/xxHash, BSD-2). Used by test_dedup.py to verify
the minhash/simhash/fingerprint pipelines value-for-value without calling
the engine's own hash. test_dedup.py first asserts this implementation
agrees with Spark's xxhash64 on canonical inputs, then uses it to recompute
whole pipelines.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64. Spark's xxhash64 uses seed 42."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i : i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i : i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i : i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_str(s: str) -> int:
    """Signed-64 XXH64 of a UTF-8 string — Spark LongType semantics."""
    u = xxh64(s.encode("utf-8"))
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_long(v: int) -> int:
    """Signed-64 XXH64 of a LongType value — Spark hashes the 8-byte
    little-endian representation (verified against F.xxhash64 in
    test_similarity.py)."""
    u = xxh64(int(v).to_bytes(8, "little", signed=True))
    return u - (1 << 64) if u >= (1 << 63) else u
