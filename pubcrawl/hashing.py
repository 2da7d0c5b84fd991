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


_P1_ = np.uint64(_P1)
_P2_ = np.uint64(_P2)
_P3_ = np.uint64(_P3)
_P4_ = np.uint64(_P4)
_P5_ = np.uint64(_P5)


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xxh64_fixed_len(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over a (rows, L) uint8 matrix — every row has the
    same byte length L, so the algorithm's control flow is row-independent
    and every step maps to one numpy uint64 op (wraparound mod 2^64 is
    numpy's native overflow behavior). Verified bit-identical to the scalar
    implementation across lengths 0..200 in tests."""
    rows, n = mat.shape
    seed_ = np.uint64(seed)
    with np.errstate(over="ignore"):
        if n >= 32:
            nb = n // 32
            lanes = mat[:, : nb * 32].reshape(rows, nb, 4, 8)
            lanes = lanes.view(np.uint64)[..., 0]  # little-endian u64 lanes
            v = [
                seed_ + _P1_ + _P2_,
                seed_ + _P2_,
                seed_,
                seed_ - _P1_,
            ]
            acc = [np.full(rows, x, dtype=np.uint64) for x in v]
            for s in range(nb):
                for j in range(4):
                    acc[j] = _rotl_v(acc[j] + lanes[:, s, j] * _P2_, 31) * _P1_
            h = _rotl_v(acc[0], 1) + _rotl_v(acc[1], 7) + _rotl_v(acc[2], 12) + _rotl_v(acc[3], 18)
            for j in range(4):
                h = (h ^ (_rotl_v(acc[j] * _P2_, 31) * _P1_)) * _P1_ + _P4_
            off = nb * 32
        else:
            h = np.full(rows, seed_ + _P5_, dtype=np.uint64)
            off = 0
        h = h + np.uint64(n)
        while off + 8 <= n:
            k1 = mat[:, off : off + 8].copy().view(np.uint64)[:, 0]
            h = _rotl_v(h ^ (_rotl_v(k1 * _P2_, 31) * _P1_), 27) * _P1_ + _P4_
            off += 8
        if off + 4 <= n:
            k1 = mat[:, off : off + 4].copy().view(np.uint32)[:, 0].astype(np.uint64)
            h = _rotl_v(h ^ (k1 * _P1_), 23) * _P2_ + _P3_
            off += 4
        while off < n:
            h = _rotl_v(h ^ (mat[:, off].astype(np.uint64) * _P5_), 11) * _P1_
            off += 1
        h ^= h >> np.uint64(33)
        h *= _P2_
        h ^= h >> np.uint64(29)
        h *= _P3_
        h ^= h >> np.uint64(32)
    return h


def xxh64_arrow(arr, seed: int = 0) -> np.ndarray:
    """Vectorized xxh64 of a pyarrow StringArray/ChunkedArray: rows grouped
    by byte length, each group hashed as one numpy pass. ~50-100× the
    scalar-loop throughput on URL-sized strings — the identity-hash hot path
    of frontier expansion."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.LargeStringArray) or arr.type == "large_string":
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
    else:
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1]
    lens = (offsets[1:] - starts).astype(np.int64)
    out = np.empty(len(arr), dtype=np.uint64)
    # int32 gather indices: the index array is 8 bytes per string BYTE at
    # int64 — the dominant memory traffic of the whole hash at URL sizes.
    # String buffers here are block-sized (≪2 GiB), so int32 always fits.
    starts32 = starts.astype(np.int32)
    for L in np.unique(lens):
        sel = np.flatnonzero(lens == L)
        if L == 0:
            out[sel] = xxh64(b"", seed)
            continue
        idx = (starts32[sel][:, None] + np.arange(int(L), dtype=np.int32)[None, :]).ravel()
        mat = np.take(data, idx).reshape(len(sel), int(L))  # np.take ≈ 9× 2D fancy-index
        out[sel] = _xxh64_fixed_len(mat, seed)
    return out
