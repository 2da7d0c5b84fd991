"""Politeness: per-host token buckets (actor shards) + robots cache.

Generalizes the reference's fixed sleeps (0.5 s/task, 0.3 s/review, 1 s/page —
/root/reference/src/crawlers/run_crawler.py:194,
/root/reference/src/scrapers/iclr_scraper.py:67,
/root/reference/src/scrapers/tpami_scraper.py:111) into per-host rate budgets
held by sharded actors, per the north_rule. A host's budget lives on exactly
one shard (``host_hash % num_shards``) so concurrency never over-admits;
fetcher actors call ``reserve`` ONE RPC PER (batch, shard) and locally sleep
until each grant's start time.

Skew note (SURVEY.md §7.3 #3): a hot host is serialized by its own bucket
only; other hosts' grants interleave, so splitting a hot host's URLs across
fetch batches keeps the pool busy — the scheduler sorts each wave by host and
round-robins hot-host remainders into later waves (see pipeline.py).
"""

from __future__ import annotations

import time

import numpy as np
import ray


class _TokenBucketShardImpl:
    """Monotonic-clock token buckets for the hosts this shard owns.

    ``reserve(hosts, now)`` assigns each request the earliest admissible
    start time for its host and advances that host's clock; callers sleep
    locally until their grant. Grants are a pure function of call order, so
    throughput (not result content) is what politeness affects.
    """

    def __init__(self, per_host_rate: float = 50.0, burst: int = 4):
        self.interval = 1.0 / per_host_rate if per_host_rate > 0 else 0.0
        self.burst = burst
        self.next_free: dict[str, float] = {}
        self.credits: dict[str, int] = {}
        self.host_interval: dict[str, float] = {}  # robots Crawl-delay overrides

    def set_host_intervals(self, intervals: dict[str, float]) -> int:
        """Per-host request-interval overrides (e.g. robots.txt Crawl-delay,
        which outranks the engine's default rate when LONGER — never used to
        speed up beyond the configured budget)."""
        for h, iv in intervals.items():
            self.host_interval[h] = max(float(iv), self.interval)
        return len(self.host_interval)

    def reserve(self, hosts: list[str], now: float) -> np.ndarray:
        """→ per-request absolute start times (same clock as ``now``).

        Clock note: callers pass their own time.monotonic(), which on Linux is
        machine-wide (boot-relative) — consistent for every worker process on
        one node. On a multi-node cluster the shard must substitute its OWN
        clock for ``now`` and return relative delays instead of absolute
        times; single-node mode keeps caller timestamps so grants from one
        batch interleave exactly."""
        out = np.empty(len(hosts), dtype=np.float64)
        for i, h in enumerate(hosts):
            nf = self.next_free.get(h, now)
            cred = self.credits.get(h, self.burst)
            start = max(now, nf)
            # hosts with a robots Crawl-delay override get NO burst credits:
            # a site that asked for N-second spacing must not receive a
            # burst of simultaneous requests (review finding: the credit
            # branch used to bypass the installed delay entirely)
            if cred > 0 and h not in self.host_interval:
                self.credits[h] = cred - 1
                self.next_free[h] = max(nf, now)
                out[i] = min(start, now)
            else:
                self.next_free[h] = start + self.host_interval.get(h, self.interval)
                out[i] = start
        return out

    def reserve_delays(self, hosts: list[str]) -> np.ndarray:
        """Multi-node variant: grants measured on the SHARD's own clock and
        returned as RELATIVE delays (seconds to wait from receipt). No
        cross-machine clock comparison ever happens — each caller sleeps
        ``delay`` on its local clock. The admitted schedule is identical to
        :meth:`reserve`; the only cost is one network RTT of slack per grant,
        which is what makes it correct on a cluster (the single-node
        ``reserve`` keeps caller timestamps so grants from one batch
        interleave exactly)."""
        now = time.monotonic()
        starts = self.reserve(hosts, now)
        return np.maximum(starts - now, 0.0)


TokenBucketShard = ray.remote(_TokenBucketShardImpl)


class Politeness:
    """Driver-side handle: builds the shard pool, hands out per-batch grants."""

    def __init__(self, num_shards: int = 4, per_host_rate: float = 50.0, burst: int = 4):
        self.num_shards = num_shards
        self.shards = [
            TokenBucketShard.remote(per_host_rate, burst) for _ in range(num_shards)
        ]

    def shard_of(self, host_hash: np.ndarray) -> np.ndarray:
        return (host_hash.astype(np.uint64) % np.uint64(self.num_shards)).astype(np.int64)

    def apply_crawl_delays(self, delays: dict[str, float]) -> None:
        """Install per-host Crawl-delay intervals on each host's OWNING shard
        (host → shard by the same hash the grant path uses). One RPC per
        shard carrying only its hosts' entries."""
        from .canon import host_hash_of

        by_shard: dict[int, dict[str, float]] = {}
        for h, d in delays.items():
            s = int(host_hash_of(h) % np.uint64(self.num_shards))
            by_shard.setdefault(s, {})[h] = float(d)
        ray.get([
            self.shards[s].set_host_intervals.remote(m) for s, m in by_shard.items()
        ])

    def reserve_batch(self, hosts: list[str], host_hash: np.ndarray) -> np.ndarray:
        now = time.monotonic()
        shard_ids = self.shard_of(host_hash)
        out = np.empty(len(hosts), dtype=np.float64)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            futs.append(self.shards[int(s)].reserve.remote([hosts[i] for i in sel], now))
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(futs)):
            out[sel] = res
        return out


class RobotsCache:
    """Per-actor robots rule cache.

    On the synthetic web the rule is the static /private/ disallow
    (synthweb.robots_allowed). With a ``transport`` given, real robots.txt
    semantics apply: /robots.txt is fetched ONCE per host per actor, parsed
    with urllib.robotparser, and cached — ``allowed_many`` then groups the
    batch's URLs by host so each matcher is resolved once per (batch, host).
    An unfetchable robots.txt (non-200) allows everything, matching the
    common permissive default."""

    def __init__(self, transport=None, user_agent: str = "pubcrawl"):
        self._cache: dict[str, object] = {}
        self._transport = transport
        self._ua = user_agent

    def _parser_for(self, scheme_host: str):
        rp = self._cache.get(scheme_host)
        if rp is None:
            import urllib.robotparser

            rp = urllib.robotparser.RobotFileParser()
            status, body = self._transport.fetch(f"{scheme_host}/robots.txt")
            if status == 200:
                rp.parse(body.decode("utf-8", "replace").splitlines())
            else:
                rp.parse([])  # permissive default
            self._cache[scheme_host] = rp
        return rp

    def crawl_delays_http(self, scheme_hosts: list[str]) -> dict[str, float]:
        """robots.txt ``Crawl-delay`` per host (hosts without one omitted):
        {netloc: seconds}. Feed the result to
        :meth:`Politeness.apply_crawl_delays` so each host's token bucket
        honors the site's own pacing request when it is SLOWER than the
        engine default."""
        from urllib.parse import urlsplit

        out: dict[str, float] = {}
        for sh in scheme_hosts:
            rp = self._parser_for(sh)
            d = rp.crawl_delay(self._ua)
            if d is not None:
                # key by the CANONICAL host form (lowercase, default port
                # stripped — canon.host_of): the crawl's host strings and
                # host_hash_of shard routing use it, and a raw netloc key
                # would route the delay to the wrong shard and never be
                # honored
                from .canon import host_of

                out[host_of(sh if "://" in sh else f"http://{sh}")] = float(d)
        return out

    def allowed_many_http(self, urls: list[str]) -> np.ndarray:
        from urllib.parse import urlsplit

        out = np.ones(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            parts = urlsplit(u)
            rp = self._parser_for(f"{parts.scheme}://{parts.netloc}")
            out[i] = rp.can_fetch(self._ua, u)
        return out

    def allowed_many(self, urls: list[str]) -> np.ndarray:
        from .synthweb import robots_allowed

        return np.fromiter((robots_allowed(u) for u in urls), dtype=bool, count=len(urls))

    def allowed_mask_arrow(self, urls_arr):
        """Vectorized form over an Arrow string array: the synthetic policy
        (path-prefix disallow of /private/) as one RE2 pass; a real-web cache
        would partition by host and apply each host's matcher per group."""
        import pyarrow.compute as pc

        return pc.invert(pc.match_substring_regex(urls_arr, r"^[a-z0-9+.-]+://[^/]*/private/"))
