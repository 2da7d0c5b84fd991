"""The crawl loop: Ray-Data BFS rounds of expand → dedup → schedule → fetch →
parse/decode → commit, resumable from the fragment manifest.

Semantics are pinned to the sequential oracle (oracle.py): discovery-order
``seq``, robots filtering at registration, first-wins seen set. The physical
plan per round (depth d):

  links_{d-1} fragments ──read_parquet
    → map_batches(canonicalize+hash)              Arrow-regex fast path +
                                                  numpy-vectorized xxh64
    → map_batches(robots filter)                  one RE2 mask per block
    → map_batches(+ord)                           ord = parent_seq·2^20+idx
    → key-column reduce (_dedup_rank_assign):     per-block (hash,ord) splits
      shard-fused first-wins dedup + seen          → seen shards (1 RPC each)
      registration, searchsorted seq ranking       → per-block apply tasks
    → commit frontier_d{d}
  frontier (driver table, metadata only)
    → persistent FetchWorker pool                 fetch+parse+decode one hop,
      (politeness grants per batch)                actors reused across rounds
    → per-bucket commit tasks                     buckets = CONTIGUOUS SEQ
                                                  RANGES → the bucket exchange
                                                  is a no-op (range partition)
  hot hosts are split across seq buckets (explicit skew handling) while their
  shared token-bucket shard still enforces the per-host rate; commit marker
  round_d{d}_done closes the round.

Resume: re-open the store, bulk_seed seen shards from committed frontier
fragments, skip every committed bucket, recompute only what is missing.
Scale notes: frontier/links fragments are metadata-only (no binary payloads);
the driver never holds image bytes — those flow block-to-block through the
object store and land in fragment files inside the Committer group task.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .canon import canonicalize_batch
from .fetch import FetchWorker, parse_decode
from .politeness import Politeness, RobotsCache
from .schemas import FRONTIER, IMAGE_CAPTION, PAGES
from .seen import SeenSet
from .store import ParquetFragmentStore, open_store
from .synthweb import WebConfig

_ORD_SHIFT = 1 << 20  # ord = parent_seq * 2^20 + link_idx (link_idx < 2^20)

LINKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("parent_seq", pa.int64()),
        ("link_idx", pa.int32()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
    ]
)


def _robots_filter(batch: pa.Table, _cache=RobotsCache()) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    return batch.filter(_cache.allowed_mask_arrow(batch["url"]))


def _add_ord(batch: pa.Table) -> pa.Table:
    ordv = pc.add(
        pc.multiply(batch["parent_seq"], pa.scalar(_ORD_SHIFT, pa.int64())),
        pc.cast(batch["link_idx"], pa.int64()),
    )
    return batch.append_column("ord", ordv)


def _split_keys_task(n_shards: int):
    @ray.remote(num_returns=n_shards)
    def _split_keys(tbl: pa.Table):
        """Project the dedup/rank keys off a block and split them per seen
        shard: returns n_shards objects of (url_hash, ord, row_sel) — 24+4
        bytes/row, full rows never leave the block."""
        uh = tbl["url_hash"].to_numpy(zero_copy_only=False)
        ords = tbl["ord"].to_numpy(zero_copy_only=False)
        hh = tbl["host_hash"].to_numpy(zero_copy_only=False)
        sid = hh.astype(np.uint64) % np.uint64(n_shards)
        outs = []
        for s in range(n_shards):
            sel = np.flatnonzero(sid == s).astype(np.int32)
            outs.append((uh[sel], ords[sel], sel))
        return tuple(outs) if n_shards > 1 else outs[0]

    return _split_keys


@ray.remote
def _apply_keep_seq(tbl: pa.Table, masks: list, piece_refs: list, sorted_ords, seq_base: int) -> pa.Table:
    """Reassemble this block's keep mask from its per-shard (mask, row_sel)
    pieces, filter to survivors, and assign seq = discovery rank via binary
    search in the broadcast sorted survivor-ord array (ords are globally
    unique: ord = parent_seq·2^20 + link_idx)."""
    pieces = ray.get(piece_refs)
    keep = np.zeros(tbl.num_rows, dtype=bool)
    for mask, (_, _, sel) in zip(masks, pieces):
        if len(sel):
            keep[sel[mask]] = True
    out = tbl.filter(pa.array(keep))
    blk_ords = out["ord"].to_numpy(zero_copy_only=False)
    seq = seq_base + np.searchsorted(sorted_ords, blk_ords)
    return out.append_column("seq", pa.array(seq.astype(np.int64), type=pa.int64()))


def _dedup_rank_assign(refs: list, seen: SeenSet, seq_base: int) -> list:
    """Key-column reduce for one expansion round — full rows never leave
    their block and key bytes never touch the driver:

      1. per-block split tasks project (url_hash, ord, row_sel) per seen
         shard (parallel; multi-return → one object per (block, shard));
      2. ONE RPC per shard with its list of piece refs: the shard does fused
         within-round first-wins dedup + cross-round seen registration,
         vectorized (all occurrences of a url land on one shard, since
         url → host → host_hash → shard) — reduce work parallelizes across
         shards; returns per-piece keep masks + its sorted survivor ords;
      3. driver: merge-sort the shards' sorted ord arrays (the one serial
         step, numpy C) → broadcast once via ray.put;
      4. per-block apply tasks reassemble masks, filter, and rank via
         searchsorted (parallel).

    On a multi-node cluster the same plan holds: key pieces flow to shard
    actors, full rows stay node-local until the fetch stage consumes them.
    """
    n_sh = seen.num_shards
    split = _split_keys_task(n_sh)
    piece_refs = [split.remote(r) for r in refs]  # [block][shard]
    if n_sh == 1:
        piece_refs = [[p] for p in piece_refs]
    shard_futs = [
        seen.shards[s].dedup_many.remote([piece_refs[b][s] for b in range(len(refs))])
        for s in range(n_sh)
    ]
    shard_results = ray.get(shard_futs)  # per shard: (masks per block, sorted surv ords)
    surv = [r[1] for r in shard_results if len(r[1])]
    if not surv:
        return []
    sorted_ords = np.sort(np.concatenate(surv))
    sorted_ref = ray.put(sorted_ords)
    out = []
    for b, r in enumerate(refs):
        masks = [shard_results[s][0][b] for s in range(n_sh)]
        if any(m.any() for m in masks):
            out.append(
                _apply_keep_seq.remote(
                    r, masks, [piece_refs[b][s] for s in range(n_sh)], sorted_ref, seq_base
                )
            )
    return out


def commit_bucket(group: pa.Table, store_root: str, depth: int) -> pa.Table:
    """groupby(bucket).map_groups sink: builds pages / links / images tables
    for one contiguous-seq bucket and commits each as an immutable fragment.
    Stateless task (the store handle is a cheap path wrapper); idempotent —
    a committed partition_id is skipped (resume)."""
    store = ParquetFragmentStore(store_root)
    t0 = time.monotonic()
    bucket = int(group["bucket"][0].as_py())
    d = depth
    pages = group.select(
        ["url", "host", "url_hash", "depth", "seq", "kind", "status",
         "n_links", "n_images", "payload_bytes"]
    ).cast(PAGES)

    # links: explode list<string> with positional link_idx
    lu, lp, li, ld, lpr = [], [], [], [], []
    links_lists = group["links"].to_pylist()
    seqs = group["seq"].to_pylist()
    depths = group["depth"].to_pylist()
    prios = group["priority"].to_pylist()
    for row_i, links in enumerate(links_lists):
        for j, u in enumerate(links):
            lu.append(u)
            lp.append(seqs[row_i])
            li.append(j)
            ld.append(depths[row_i] + 1)
            lpr.append(prios[row_i])
    links_tbl = pa.table(
        {
            "url": pa.array(lu, pa.string()),
            "parent_seq": pa.array(lp, pa.int64()),
            "link_idx": pa.array(li, pa.int32()),
            "depth": pa.array(ld, pa.int32()),
            "priority": pa.array(lpr, pa.float64()),
        },
        schema=LINKS_SCHEMA,
    )

    # images: explode list<struct>
    img_rows = {k: [] for k in [*IMAGE_CAPTION.names, "url_hash", "seq", "img_idx"]}
    images_lists = group["images"].to_pylist()
    uhs = group["url_hash"].to_pylist()
    for row_i, imgs in enumerate(images_lists):
        for it in imgs:
            for k in IMAGE_CAPTION.names:
                img_rows[k].append(it[k])
            img_rows["url_hash"].append(uhs[row_i])
            img_rows["seq"].append(seqs[row_i])
            img_rows["img_idx"].append(it["img_idx"])
    images_tbl = pa.table(
        {
            **{k: pa.array(img_rows[k], IMAGE_CAPTION.field(k).type) for k in IMAGE_CAPTION.names},
            "url_hash": pa.array(img_rows["url_hash"], pa.uint64()),
            "seq": pa.array(img_rows["seq"], pa.int64()),
            "img_idx": pa.array(img_rows["img_idx"], pa.int32()),
        }
    )

    errors = int(pc.sum(pc.cast(pc.not_equal(group["status"], 200), pa.int64())).as_py() or 0)
    wall_ms = int((time.monotonic() - t0) * 1000)
    lineage = f"depth={d};bucket={bucket};n_urls={group.num_rows}"
    metrics = {"fetch_errors": errors, "wall_ms": wall_ms}
    store.commit(pages, f"pages_d{d}_b{bucket:05d}", lineage, metrics)
    store.commit(links_tbl, f"links_d{d}_b{bucket:05d}", lineage, metrics)
    store.commit(images_tbl, f"images_d{d}_b{bucket:05d}", lineage, metrics)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "urls": pa.array([group.num_rows], pa.int64()),
            "images": pa.array([images_tbl.num_rows], pa.int64()),
            "links": pa.array([links_tbl.num_rows], pa.int64()),
            "errors": pa.array([errors], pa.int64()),
        }
    )


def expand_frontier(raw: rd.Dataset, seen: SeenSet, seq_base: int, gather: bool = True):
    """One round of frontier expansion (the distributed expand path, shared by
    the crawl loop and bench --scaling): canonicalize+hash → robots filter →
    within-round first-wins dedup + seen registration (sharded actors) →
    discovery-order seq assignment.

    gather=True returns one driver-side Arrow table (the crawl loop's round
    orchestration needs the frontier rows); gather=False returns the list of
    block refs instead — the 10^10-scale path, where frontier fragments are
    committed per block and the driver never holds the rows."""
    # batch_size=None → one batch per block: keeps the block structure intact
    # (the 1024-row default would fragment a 2M-row round into ~2000 blocks,
    # slowing the sorts and multiplying seen-shard RPCs)
    ds = raw.map_batches(canonicalize_batch, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(_robots_filter, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(_add_ord, batch_format="pyarrow", batch_size=None)
    refs = ds.to_arrow_refs()
    out_refs = _dedup_rank_assign(refs, seen, seq_base)
    if not gather:
        if out_refs:
            ray.wait(out_refs, num_returns=len(out_refs))  # blocks fully built
        return out_refs
    parts = [p for p in ray.get(out_refs) if p.num_rows] if out_refs else []
    if not parts:
        return pa.table({n: [] for n in FRONTIER.names}, schema=FRONTIER)
    tbl = pa.concat_tables(parts)
    return tbl.select(
        ["url", "host", "url_hash", "host_hash", "depth", "priority", "seq"]
    ).cast(FRONTIER)


@ray.remote
def commit_bucket_refs(store_root: str, depth: int, *blocks: pa.Table) -> dict:
    """Direct per-bucket commit task: because buckets are CONTIGUOUS SEQ
    RANGES and fetch slices are seq-contiguous too, every block of a bucket is
    known up front — the groupby(bucket) exchange degenerates to handing each
    bucket its own refs (range partitioning makes the shuffle a no-op). On a
    multi-node cluster these tasks run wherever the blocks already live."""
    group = pa.concat_tables([b for b in blocks if b.num_rows > 0])
    return commit_bucket(group, store_root, depth).to_pylist()[0]


@dataclass
class CrawlReport:
    seen: int = 0
    fetched: int = 0
    images: int = 0
    links: int = 0
    errors: int = 0
    rounds: int = 0
    wall_fetch_s: float = 0.0
    wall_expand_s: float = 0.0


class CrawlPipeline:
    def __init__(
        self,
        cfg: WebConfig,
        store_root: str,
        *,
        max_depth: int = 10,
        seen_shards: int = 8,
        politeness_shards: int = 4,
        per_host_rate: float = 200.0,
        burst: int = 8,
        fetch_concurrency: int = 8,
        fetch_batch_size: int = 64,
        bucket_size: int = 256,
        max_retries: int = 5,
    ):
        self.cfg = cfg
        self.store = open_store(store_root)
        self.store_root = store_root
        self.max_depth = max_depth
        self.seen = SeenSet(seen_shards)
        self.politeness = Politeness(politeness_shards, per_host_rate, burst)
        self.fetch_concurrency = fetch_concurrency
        # persistent fetch+parse+decode workers, reused across BFS rounds;
        # num_cpus=0.75 leaves scheduling room for the commit shuffle tasks
        self.fetch_workers = [
            FetchWorker.options(num_cpus=0.75).remote(
                cfg, self.politeness.shards, max_retries
            )
            for _ in range(fetch_concurrency)
        ]
        self.fetch_batch_size = fetch_batch_size
        self.bucket_size = bucket_size
        self.max_retries = max_retries

    # ------------------------------------------------------------ frontier

    def _seed_table(self) -> pa.Table:
        urls = self.cfg.seed_urls()
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "parent_seq": pa.array([-1] * len(urls), pa.int64()),
                "link_idx": pa.array(list(range(len(urls))), pa.int32()),
                "depth": pa.array([0] * len(urls), pa.int32()),
                "priority": pa.array([1.0] * len(urls), pa.float64()),
            },
            schema=LINKS_SCHEMA,
        )

    def _build_frontier(self, raw: rd.Dataset, depth: int, seq_base: int) -> pa.Table:
        pid = f"frontier_d{depth}"
        if self.store.is_committed(pid):  # resume: reuse committed frontier
            import pyarrow.parquet as pq

            return pq.read_table(self.store.fragment_path(pid))
        tbl = expand_frontier(raw, self.seen, seq_base)
        self.store.commit(tbl, pid, lineage=f"depth={depth};base={seq_base}")
        return tbl

    # ------------------------------------------------------------ fetch round

    def _run_round(self, frontier: pa.Table, depth: int) -> pa.Table | None:
        if frontier.num_rows == 0:
            return None
        marker = f"round_d{depth}_done"
        bucket = pc.divide(frontier["seq"], pa.scalar(self.bucket_size, pa.int64()))
        frontier = frontier.append_column("bucket", pc.cast(bucket, pa.int64()))
        committed = self.store.committed()
        todo_mask = [
            f"images_d{depth}_b{int(b):05d}" not in committed
            for b in frontier["bucket"].to_pylist()
        ]
        todo = frontier.filter(pa.array(todo_mask))
        if todo.num_rows:
            # fan the (metadata-only) frontier out over the PERSISTENT fetch
            # worker pool (created once per crawl — per-round map_batches actor
            # pools would pay actor startup × rounds). Each worker does
            # fetch + parse + decode in one hop and returns a block ref; refs
            # flow straight into per-bucket commit tasks (range partitioning:
            # bucket = seq // bucket_size and slices are seq-contiguous, so
            # the bucket exchange is a no-op — no groupby shuffle needed).
            bs = self.fetch_batch_size
            buckets = todo["bucket"].to_numpy(zero_copy_only=False)
            prios = todo["priority"].to_numpy(zero_copy_only=False)
            # priority scheduler (north_rule): buckets are SUBMITTED to the
            # fetch pool in (max priority desc, bucket asc) order — scheduling
            # only; canonical output order stays discovery-`seq` regardless
            uniq = np.unique(buckets)
            bucket_prio = np.array([prios[buckets == b].max() for b in uniq])
            order = np.lexsort((uniq, -bucket_prio))
            per_bucket: dict[int, list] = {}
            i = 0
            for b in uniq[order]:
                sel = np.flatnonzero(buckets == b)
                lo, hi = int(sel[0]), int(sel[-1]) + 1
                for s_lo in range(lo, hi, bs):
                    block = todo.slice(s_lo, min(bs, hi - s_lo))
                    ref = self.fetch_workers[i % len(self.fetch_workers)].process.remote(block)
                    per_bucket.setdefault(int(b), []).append(ref)
                    i += 1
            commits = [
                commit_bucket_refs.remote(self.store_root, depth, *refs)
                for b, refs in per_bucket.items()
            ]
            ray.get(commits)
        self.store.commit(
            pa.table({"depth": pa.array([depth], pa.int32())}), marker, lineage=f"depth={depth}"
        )
        return None

    # ------------------------------------------------------------ main loop

    def _reseed_from_checkpoint(self) -> None:
        """Resume: re-register committed frontiers' url_hashes in the (fresh)
        seen shards, so recomputation of later rounds excludes them."""
        import pyarrow.parquet as pq

        for pid in sorted(self.store.committed()):
            if pid.startswith("frontier_d"):
                t = pq.read_table(
                    self.store.fragment_path(pid), columns=["url_hash", "host_hash"]
                )
                if t.num_rows:
                    self.seen.bulk_seed(
                        t["url_hash"].to_numpy(zero_copy_only=False),
                        t["host_hash"].to_numpy(zero_copy_only=False),
                    )

    def run(self) -> CrawlReport:
        report = CrawlReport()
        depth = 0
        seq_base = 0
        if self.store.committed():
            self._reseed_from_checkpoint()
        raw = rd.from_arrow(self._seed_table())
        while depth <= self.max_depth:
            t0 = time.monotonic()
            frontier = self._build_frontier(raw, depth, seq_base)
            report.wall_expand_s += time.monotonic() - t0
            if frontier.num_rows == 0:
                break
            seq_base = int(pc.max(frontier["seq"]).as_py()) + 1
            t0 = time.monotonic()
            self._run_round(frontier, depth)
            report.wall_fetch_s += time.monotonic() - t0
            report.rounds += 1
            if depth == self.max_depth:
                break
            link_paths = [
                self.store.fragment_path(pid)
                for pid in sorted(self.store.committed())
                if pid.startswith(f"links_d{depth}_b")
            ]
            import pyarrow.parquet as pq

            tables = [pq.read_table(p) for p in link_paths]
            tables = [t for t in tables if t.num_rows]
            if not tables:
                depth += 1
                break
            raw = rd.from_arrow(pa.concat_tables(tables))
            depth += 1
        report.seen = seq_base
        # roll up metrics from the manifest
        for pid, rec in self.store.committed().items():
            if pid.startswith("pages_"):
                report.fetched += rec["rows"]
                report.errors += rec["fetch_errors"]
            elif pid.startswith("images_"):
                report.images += rec["rows"]
            elif pid.startswith("links_"):
                report.links += rec["rows"]
        return report


# ---------------------------------------------------------------- readers


def load_images(store_root: str, canonical_order: bool = False) -> rd.Dataset:
    """image_caption dataset from committed fragments (input_hint columns).
    canonical_order=True sorts by discovery (seq, img_idx)."""
    store = ParquetFragmentStore(store_root)
    paths = [
        store.fragment_path(pid)
        for pid in sorted(store.committed())
        if pid.startswith("images_") and store.committed()[pid]["rows"] > 0
    ]
    if not paths:
        return rd.from_arrow(pa.table({n: [] for n in IMAGE_CAPTION.names}, schema=IMAGE_CAPTION))
    ds = rd.read_parquet(paths)
    if canonical_order:
        ds = ds.sort(["seq", "img_idx"])
    return ds


def load_pages(store_root: str) -> rd.Dataset:
    store = ParquetFragmentStore(store_root)
    paths = [
        store.fragment_path(pid)
        for pid in sorted(store.committed())
        if pid.startswith("pages_") and store.committed()[pid]["rows"] > 0
    ]
    if not paths:
        return rd.from_arrow(pa.table({n: [] for n in PAGES.names}, schema=PAGES))
    return rd.read_parquet(paths)


def crawl(cfg: WebConfig, store_root: str, **kw) -> CrawlReport:
    return CrawlPipeline(cfg, store_root, **kw).run()
