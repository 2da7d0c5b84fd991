"""Sharded URL-seen set: cuckoo-filter fast path + exact authoritative set.

north_rule: "per-actor cuckoo-filter URL-seen sets ... 10^10-entry frontier
partitioned by host-hash". The reference has NO seen structure (its crawl
graph is one hop deep — SURVEY.md §2.8); the closest behavior is the
incremental-embed anti-join at
/root/reference/src/search/embedder_chroma.py:56-76, which this generalizes.

Design (SURVEY.md §7.3 hard-part #1): a cuckoo filter (Fan et al., "Cuckoo
Filter: Practically Better Than Bloom", CoNEXT 2014) answers definite-no
cheaply and memory-bounded; any filter hit is confirmed against the exact
per-shard set before a URL may be dropped, so reproduction stays bit-for-bit
— a false positive costs one exact lookup, never a lost URL. At 10^10 scale
the exact set is the part that spills (host-sharding bounds each shard's
slice); at test scale it is in-RAM, so the hot path is the plain set and the
filter is maintained as the spill-ready structure.

Implementation note: the filter table is a flat ``array('H')`` driven by
pure-int Python arithmetic — per-item numpy scalar ops cost ~100x more than
int ops at this granularity (measured: they dominated frontier expansion).

Actors are addressed by ``host_hash % num_shards`` so one shard owns a host's
URLs; UDFs call them ONE RPC PER (block, shard), never per row.
"""

from __future__ import annotations

import random
from array import array

import numpy as np
import ray


class CuckooFilter:
    """Bucketized cuckoo filter: 4-slot buckets, 16-bit fingerprints, table
    stored as a numpy (n_buckets, 4) uint16 array so bulk inserts vectorize
    (1.5 GiB per 10^9 entries per shard — the memory-bounded structure the
    north_rule's 10^10-URL frontier relies on when exact sets spill)."""

    SLOTS = 4

    def __init__(self, capacity: int, max_kicks: int = 500, seed: int = 0x1234):
        n_buckets = max(8, 1 << (max(1, int(capacity / 4 * 1.05) - 1)).bit_length())
        self.n_buckets = n_buckets
        self.mask = n_buckets - 1
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.max_kicks = max_kicks
        self.size = 0
        self._rng = random.Random(seed)

    def _fp_buckets(self, h: np.ndarray):
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        b1 = (h & np.uint64(self.mask)).astype(np.int64)
        b2 = (b1 ^ ((fp.astype(np.int64) * 0x5BD1E995) & self.mask)) & self.mask
        return fp, b1, b2

    def contains(self, h: int) -> bool:
        fp = (h >> 48) & 0xFFFF or 1
        b1 = h & self.mask
        t = self.table
        if (t[b1] == fp).any():
            return True
        return bool((t[(b1 ^ ((fp * 0x5BD1E995) & self.mask)) & self.mask] == fp).any())

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        fp, b1, b2 = self._fp_buckets(h)
        t = self.table
        hit = (t[b1] == fp[:, None]).any(axis=1)
        miss = ~hit
        hit[miss] = (t[b2[miss]] == fp[miss, None]).any(axis=1)
        return hit

    def add(self, h: int) -> bool:
        fp = (h >> 48) & 0xFFFF or 1
        b1 = h & self.mask
        t = self.table
        for b in (b1, (b1 ^ ((fp * 0x5BD1E995) & self.mask)) & self.mask):
            row = t[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        b = b1 if self._rng.random() < 0.5 else (b1 ^ ((fp * 0x5BD1E995) & self.mask)) & self.mask
        for _ in range(self.max_kicks):
            s = self._rng.randrange(4)
            fp, t[b, s] = int(t[b, s]), fp
            b = (b ^ ((fp * 0x5BD1E995) & self.mask)) & self.mask
            row = t[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        return False  # filter full — callers rely on the exact set

    def add_many(self, hashes: np.ndarray) -> int:
        """Vectorized bulk insert: per (bucket-choice, slot) pass, place every
        pending fingerprint whose target slot is free (first occurrence per
        bucket wins, via np.unique); the small collided remainder takes the
        per-item kick path."""
        if len(hashes) == 0:
            return 0
        h = hashes.astype(np.uint64, copy=False)
        fp, b1, b2 = self._fp_buckets(h)
        t = self.table
        pending = np.arange(len(h))
        vec_placed = 0
        for bucket in (b1, b2):
            for s in range(self.SLOTS):
                if len(pending) == 0:
                    break
                tgt = bucket[pending]
                cand = pending[t[tgt, s] == 0]
                if len(cand) == 0:
                    continue
                _, first = np.unique(bucket[cand], return_index=True)
                winners = cand[first]
                t[bucket[winners], s] = fp[winners]
                vec_placed += len(winners)
                pending = pending[~np.isin(pending, winners, assume_unique=True)]
        self.size += vec_placed
        placed = vec_placed
        for i in pending:  # kick path for the leftovers (add() counts size)
            if self.add(int(h[i])):
                placed += 1
        return placed


class _SeenShardImpl:
    """Exact membership = ONE SORTED uint64 array probed with vectorized
    searchsorted; the cuckoo filter stays in sync as the memory-bounded
    negative-path structure for the spill regime.

    Round-2 change: this used to be a Python ``set`` with per-item
    ``h in new`` probes — measured 13x slower under 16 concurrent shard
    actors than solo (millions of PyLong allocations thrash the allocator
    and LLC across processes), turning the expand reduce into a ~20 s
    CPU-count-independent floor. Sorted-array probes are pure numpy: no
    per-item Python objects, sequential memory traffic, and the same
    bit-for-bit first-wins semantics (tested against the oracle)."""

    def __init__(self, capacity_hint: int = 1 << 16):
        self.filter = CuckooFilter(capacity_hint)
        self._seen = np.empty(0, dtype=np.uint64)  # sorted, unique
        # filter sync is LAZY: new hashes queue here and fold into the cuckoo
        # table only when the filter is actually consulted (spill regime /
        # diagnostics). The fold is 64 MB of random-access writes per shard —
        # on the hot expand path, 16 shards doing it concurrently saturate
        # LLC/memory bandwidth for pure bookkeeping the round never reads.
        self._filter_pending: list[np.ndarray] = []

    def _membership(self, cand: np.ndarray) -> np.ndarray:
        """Boolean mask: cand[i] already registered. cand need not be sorted."""
        s = self._seen
        if len(s) == 0:
            return np.zeros(len(cand), dtype=bool)
        pos = np.searchsorted(s, cand)
        pos[pos == len(s)] = len(s) - 1
        return s[pos] == cand

    def _register(self, new: np.ndarray) -> None:
        """Merge new (unique, any order) into the sorted seen array."""
        if len(new) == 0:
            return
        merged = np.concatenate([self._seen, new])
        merged.sort(kind="stable")
        self._seen = merged
        self._filter_pending.append(new)

    def _flush_filter(self) -> None:
        for arr in self._filter_pending:
            self.filter.add_many(arr)
        self._filter_pending.clear()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """First-wins membership: boolean mask of hashes that were NEW
        (registered by this call). Duplicates inside one call: only the first
        occurrence is new — discovery-order semantics."""
        h = hashes.astype(np.uint64, copy=False)
        n = len(h)
        if n == 0:
            return np.zeros(0, dtype=bool)
        # np.unique returns the index of the FIRST occurrence of each value
        uniq, first_idx = np.unique(h, return_index=True)
        present = self._membership(uniq)
        new_vals = uniq[~present]
        self._register(new_vals)
        out = np.zeros(n, dtype=bool)
        out[first_idx[~present]] = True
        return out

    def dedup_check_and_add(self, hashes: np.ndarray, ords: np.ndarray) -> np.ndarray:
        """Fused within-round first-wins dedup + cross-round seen check for
        this shard's slice of a round (all occurrences of a url_hash land on
        one shard because url → host → shard). Vectorized: lexsort by (hash,
        ord) → keep min-ord occurrence → drop already-seen → register.
        Returns the keep mask aligned to the input order."""
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64, copy=False)
        order = np.lexsort((ords, h))
        sh = h[order]
        first = np.ones(n, dtype=bool)
        first[1:] = sh[1:] != sh[:-1]
        keep = np.zeros(n, dtype=bool)
        keep[order] = first
        idx = np.flatnonzero(keep)
        cand = h[idx]  # unique within this call (one per hash, min ord)
        present = self._membership(cand)
        self._register(cand[~present])
        keep[idx] = ~present
        return keep

    def dedup_many(self, pieces: list):
        """Fused dedup+seen for this shard's slices of a round, taken as a
        list of ObjectRefs of (url_hash, ord, row_sel) tuples (one per source
        block — resolved here, so key bytes flow block→shard without touching
        the driver). Returns (per-piece keep masks, sorted survivor ords)."""
        datas = ray.get(pieces)
        sizes = [len(d[0]) for d in datas]
        if sum(sizes) == 0:
            return [np.zeros(0, dtype=bool) for _ in datas], np.array([], dtype=np.int64)
        uh = np.concatenate([d[0] for d in datas])
        ords = np.concatenate([d[1] for d in datas])
        keep = self.dedup_check_and_add(uh, ords)
        surv_ords = np.sort(ords[keep])
        out_masks = []
        lo = 0
        for n in sizes:
            out_masks.append(keep[lo : lo + n])
            lo += n
        return out_masks, surv_ords

    def bulk_seed(self, hashes: np.ndarray) -> int:
        """Resume path: pre-register checkpointed url_hashes."""
        uniq = np.unique(hashes.astype(np.uint64, copy=False))
        present = self._membership(uniq)
        self._register(uniq[~present])
        return len(self._seen)

    def snapshot(self) -> np.ndarray:
        return self._seen.copy()

    def count(self) -> int:
        return len(self._seen)

    def filter_fp_rate(self, probes: np.ndarray) -> float:
        """Diagnostic: false-positive rate of the filter on given non-member
        probes (tested to stay ~1e-3; an FP only costs an exact lookup)."""
        self._flush_filter()
        c = self.filter.contains
        return sum(c(int(p)) for p in probes) / max(1, len(probes))


SeenShard = ray.remote(_SeenShardImpl)


class SeenSet:
    """Driver-side handle over ``num_shards`` SeenShard actors."""

    def __init__(self, num_shards: int = 8, capacity_hint: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote(capacity_hint) for _ in range(num_shards)]

    def shard_of(self, host_hash: np.ndarray) -> np.ndarray:
        return (host_hash.astype(np.uint64) % np.uint64(self.num_shards)).astype(np.int64)

    def check_and_add_batch(self, url_hash: np.ndarray, host_hash: np.ndarray) -> np.ndarray:
        """One RPC per touched shard; preserves input order in the mask."""
        shard_ids = self.shard_of(host_hash)
        mask = np.zeros(len(url_hash), dtype=bool)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            futs.append(self.shards[int(s)].check_and_add.remote(url_hash[sel]))
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(futs)):
            mask[sel] = res
        return mask

    def bulk_seed(self, url_hash: np.ndarray, host_hash: np.ndarray) -> None:
        shard_ids = self.shard_of(host_hash)
        ray.get(
            [
                self.shards[int(s)].bulk_seed.remote(url_hash[shard_ids == s])
                for s in np.unique(shard_ids)
            ]
        )

    def snapshot(self) -> set[int]:
        parts = ray.get([s.snapshot.remote() for s in self.shards])
        out: set[int] = set()
        for p in parts:
            out.update(int(x) for x in p)
        return out

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))
