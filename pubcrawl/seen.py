"""Sharded URL-seen set: cuckoo-filter fast path + exact authoritative set.

north_rule: "per-actor cuckoo-filter URL-seen sets ... 10^10-entry frontier
partitioned by host-hash". The reference has NO seen structure (its crawl
graph is one hop deep — SURVEY.md §2.8); the closest behavior is the
incremental-embed anti-join at
/root/reference/src/search/embedder_chroma.py:56-76, which this generalizes.

Design (SURVEY.md §7.3 hard-part #1): a cuckoo filter (Fan et al., "Cuckoo
Filter: Practically Better Than Bloom", CoNEXT 2014) answers definite-no
cheaply; any filter hit is confirmed against an exact per-shard hash set
before a URL may be dropped, so reproduction stays bit-for-bit — a false
positive costs one exact lookup, never a lost URL. At 10^10 scale the exact
set is the part that spills (host-sharding bounds each shard's slice); at
test scale it is in-RAM.

Actors are addressed by ``host_hash % num_shards`` so one shard owns a host's
URLs; UDFs call them ONE RPC PER (block, shard), never per row.
"""

from __future__ import annotations

import numpy as np
import ray


class CuckooFilter:
    """Bucketized cuckoo filter: 4-slot buckets, 16-bit fingerprints."""

    def __init__(self, capacity: int, max_kicks: int = 500, seed: int = 0x1234):
        n_buckets = max(8, int(1 << int(np.ceil(np.log2(max(1, capacity) / 4 * 1.05)))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.max_kicks = max_kicks
        self.size = 0
        self._rng = np.random.default_rng(seed)

    def _fp(self, h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp != 0 else 1  # 0 marks an empty slot

    def _i1(self, h: int) -> int:
        return h & (self.n_buckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        # standard partial-key cuckoo: i2 = i1 ^ hash(fp)
        return (i ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def contains(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        if (self.table[i1] == fp).any():
            return True
        return bool((self.table[self._alt(i1, fp)] == fp).any())

    def add(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        for i in (i1, self._alt(i1, fp)):
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                self.size += 1
                return True
        i = i1 if self._rng.random() < 0.5 else self._alt(i1, fp)
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(0, 4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt(i, fp)
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                self.size += 1
                return True
        return False  # filter full — caller relies on the exact set


class _SeenShardImpl:
    def __init__(self, capacity_hint: int = 1 << 16):
        self.filter = CuckooFilter(capacity_hint)
        self.exact: set[int] = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """First-wins membership: returns boolean mask of hashes that were NEW
        (registered by this call). Duplicate hashes inside one call: only the
        first occurrence is new — matching discovery-order semantics."""
        out = np.zeros(len(hashes), dtype=bool)
        f, exact = self.filter, self.exact
        for k, h in enumerate(hashes):
            h = int(h)
            if f.contains(h) and h in exact:
                continue  # definitely seen (filter hit confirmed exactly)
            if h in exact:
                continue  # filter false-negative impossible, but stay safe
            exact.add(h)
            f.add(h)
            out[k] = True
        return out

    def bulk_seed(self, hashes: np.ndarray) -> int:
        """Resume path: pre-register checkpointed url_hashes."""
        for h in hashes:
            h = int(h)
            if h not in self.exact:
                self.exact.add(h)
                self.filter.add(h)
        return len(self.exact)

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))

    def count(self) -> int:
        return len(self.exact)


SeenShard = ray.remote(_SeenShardImpl)


class SeenSet:
    """Driver-side handle over ``num_shards`` SeenShard actors."""

    def __init__(self, num_shards: int = 8, capacity_hint: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.options(name=None).remote(capacity_hint) for _ in range(num_shards)
        ]

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
