"""xxHash64 — the frontier's URL identity hash (north_rule: canonicalized +
xxhash64 URL keys).

Uses the C ``xxhash`` wheel when available; otherwise a pure-Python
implementation of the public XXH64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — spec in doc/xxhash_spec.md). The two
produce identical digests, so a cluster mixing both stays consistent.

Reference behavior being generalized: the reference engine has no URL hash at
all (its crawl graph is one hop deep, `src/crawlers/run_crawler.py:110-196`);
url_hash/host_hash are the scale-out identity keys for the 10^10-row frontier.
"""

from __future__ import annotations

import struct

import numpy as np

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        nb = n // 32
        lanes = struct.unpack_from("<%dQ" % (nb * 4), data)
        for i in range(0, nb * 4, 4):
            v1 = _round(v1, lanes[i])
            v2 = _round(v2, lanes[i + 1])
            v3 = _round(v3, lanes[i + 2])
            v4 = _round(v4, lanes[i + 3])
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
        off = nb * 32
    else:
        h = (seed + _P5) & _MASK
        off = 0
    h = (h + n) & _MASK
    while off + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, off)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        off += 8
    if off + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, off)
        h ^= (k1 * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        off += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


try:  # prefer the C implementation when the wheel is present
    import xxhash as _xxhash  # type: ignore

    def xxh64(data: bytes | str, seed: int = 0) -> int:
        if isinstance(data, str):
            data = data.encode("utf-8")
        return _xxhash.xxh64_intdigest(data, seed)

except ImportError:

    def xxh64(data: bytes | str, seed: int = 0) -> int:
        if isinstance(data, str):
            data = data.encode("utf-8")
        return _xxh64_py(data, seed)


def xxh64_many(strings, seed: int = 0) -> np.ndarray:
    """Hash an iterable of strings → uint64 ndarray (one Python-level loop;
    called once per Arrow batch inside map_batches, not per row elsewhere)."""
    out = np.empty(len(strings), dtype=np.uint64)
    h = xxh64
    for i, s in enumerate(strings):
        out[i] = h(s, seed)
    return out
