"""Pure-Python mirror of Spark's ``xxhash64`` expression — ORACLE
INFRASTRUCTURE, never a production path (the engine always calls the
JVM ``F.xxhash64``).

Spark's XxHash64 expression is the public xxHash64 algorithm (Yann
Collet, public-domain spec) applied per argument with a running seed:
``xxhash64(a, b)`` computes ``h = XXH64(bytes(a), 42)`` then
``XXH64(bytes(b), h)``, where strings hash their UTF-8 bytes, ints
their 4 little-endian bytes, longs their 8.  Registering this mirror
as a DuckDB scalar UDF lets tools/check_oracles.py value-check the
production xxhash64 MinHash path (``minhash_pairs_fast``) end to end;
tests/test_xxh64.py pins bit-exact parity against the JVM expression
over a multi-length / multi-script battery.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 of ``data`` (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7)
             + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


class Long(int):
    """Tag a Python int as a Spark LONG argument (8 LE bytes); a bare
    int mirrors a Spark INT literal (4 LE bytes) when it fits."""


def _arg_bytes(v) -> bytes:
    """Per-type byte encoding matching Spark's XxHash64 computeHash:
    strings hash UTF-8 bytes, INTs 4 LE bytes, LONGs 8 LE bytes."""
    if isinstance(v, Long):
        return struct.pack("<q", v)
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, int):
        if -(2 ** 31) <= v < 2 ** 31:
            return struct.pack("<i", v)
        return struct.pack("<q", v)
    raise TypeError(f"unsupported xxhash64 argument type {type(v)!r}")


def spark_xxhash64(*args, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Signed-64 result of Spark's ``F.xxhash64(*args)``: the seed
    chains through the arguments left to right (hash of arg k becomes
    the seed for arg k+1), starting at Spark's default 42."""
    h = seed & _M
    for a in args:
        h = xxh64(_arg_bytes(a), h)
    return _to_signed(h)
