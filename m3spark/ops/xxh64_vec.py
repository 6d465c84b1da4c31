"""NumPy-vectorized XXH64 for the fast MinHash path.

Bit-identical to Spark's ``xxhash64`` expression (and to the scalar
mirror in :mod:`m3spark.ops.xxh64`, which tests/test_xxh64.py pins
against the JVM): ``F.xxhash64(shingle, F.lit(i))`` chains
``h1 = XXH64(utf8(shingle), 42)`` then ``XXH64(le4(i), h1)``.  Here
``h1`` is computed once per distinct shingle with a length-bucketed
vectorized small-input path (inputs < 32 bytes never enter the stripe
loop; >= 32-byte shingles — only reachable via multi-byte UTF-8 —
fall back to the scalar mirror), and the salt chain is one fused
(n_shingles x n_salts) uint64 matrix computation.

All arithmetic uses uint64 wrap-around (NumPy unsigned overflow is
modular by definition); results convert to signed int64 exactly like
Spark longs.
"""

from __future__ import annotations

import numpy as np

from m3spark.ops.xxh64 import xxh64 as _xxh64_scalar

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _hash_bytes_len(mat: np.ndarray, n: int) -> np.ndarray:
    """XXH64(seed=42) of ``m`` byte rows of identical length ``n`` < 32
    (uint8 matrix of shape (m, >=n))."""
    m = mat.shape[0]
    h = np.full(m, int(_SEED + _P5) + n, dtype=np.uint64)
    i = 0
    while i + 8 <= n:
        w = mat[:, i:i + 8].copy().view("<u8").reshape(m)
        h ^= _rotl(w * _P2, 31) * _P1
        h = _rotl(h, 27) * _P1 + _P4
        i += 8
    if i + 4 <= n:
        w = mat[:, i:i + 4].copy().view("<u4").reshape(m) \
              .astype(np.uint64)
        h ^= w * _P1
        h = _rotl(h, 23) * _P2 + _P3
        i += 4
    while i < n:
        h ^= mat[:, i].astype(np.uint64) * _P5
        h = _rotl(h, 11) * _P1
        i += 1
    return _fmix(h)


def xxh64_str42(strings: list) -> np.ndarray:
    """uint64 XXH64(utf8(s), 42) per string; a None entry mirrors
    Spark's null-skipping hash (the seed, 42, passes through)."""
    out = np.empty(len(strings), dtype=np.uint64)
    by_len: dict = {}
    for idx, s in enumerate(strings):
        if s is None:
            out[idx] = _SEED
            continue
        b = s.encode("utf-8")
        if len(b) >= 32:
            out[idx] = _xxh64_scalar(b, 42)
            continue
        idxs, bs = by_len.setdefault(len(b), ([], []))
        idxs.append(idx)
        bs.append(b)
    for n, (idxs, bs) in by_len.items():
        if n == 0:
            mat = np.zeros((len(bs), 1), dtype=np.uint8)
        else:
            mat = np.frombuffer(b"".join(bs), dtype=np.uint8) \
                    .reshape(len(bs), n)
        out[np.asarray(idxs)] = _hash_bytes_len(mat, n)
    return out


def xxh64_int_chain(h1: np.ndarray, salts: np.ndarray) -> np.ndarray:
    """Signed int64 XXH64(le4(salt), seed=h1) for every (row, salt)
    pair: shape (len(h1), len(salts)).  The 4-byte small path in
    closed form: h = seed + P5 + 4; h ^= u32 * P1; h = rotl23 * P2
    + P3; fmix."""
    u32 = salts.astype(np.int64).astype(np.uint64) \
               & np.uint64(0xFFFFFFFF)
    h = h1[:, None] + (_P5 + np.uint64(4))
    h = h ^ (u32[None, :] * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h).view(np.int64)
