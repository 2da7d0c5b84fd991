"""The crawl loop: Ray-Data BFS rounds of expand → dedup → schedule → fetch →
parse/decode → commit, resumable from the fragment manifest.

Semantics are pinned to the sequential oracle (oracle.py): discovery-order
``seq``, robots filtering at registration, first-wins seen set. The physical
plan per round (depth d):

  links_{d-1} fragments ──read_parquet
    → map_batches(canonicalize+hash)              stateless, vectorized-ish
    → map_batches(robots filter)                  RobotsCache per task
    → sort(url_hash, ord) + per-block vectorized  within-round first-wins dedup
      adjacent-dup drop (boundary-aware)
    → map_batches(SeenFilter)                     1 RPC per (block, seen shard)
    → sort(ord) → per-block seq enumeration       distributed prefix-sum
    → commit frontier_d{d}
  frontier ──from_arrow
    → map_batches(Fetcher, concurrency=F)         actor pool, politeness grants
    → map_batches(ParseDecode, concurrency=P)     decode + phash in-stage
    → groupby(bucket).map_groups(Committer)       atomic per-bucket fragments
  buckets are CONTIGUOUS SEQ RANGES: hot hosts are split across buckets
  (explicit skew handling) while their shared token-bucket shard still
  enforces the per-host rate; commit marker round_d{d}_done closes the round.

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
from .fetch import Fetcher, parse_decode
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
    mask = _cache.allowed_many(batch["url"].to_pylist())
    return batch.filter(pa.array(mask))


def _add_ord(batch: pa.Table) -> pa.Table:
    ordv = pc.add(
        pc.multiply(batch["parent_seq"], pa.scalar(_ORD_SHIFT, pa.int64())),
        pc.cast(batch["link_idx"], pa.int64()),
    )
    return batch.append_column("ord", ordv)


@ray.remote
def _block_hash_bounds(tbl: pa.Table):
    if tbl.num_rows == 0 or "url_hash" not in tbl.column_names:
        return None
    col = tbl["url_hash"]
    return int(col[0].as_py()), int(col[-1].as_py())


@ray.remote
def _dedup_sorted_block(tbl: pa.Table, drop_leading_hash) -> pa.Table:
    """Block of a (url_hash, ord)-sorted stream → keep first row per hash.
    Vectorized: a row survives iff its hash differs from the previous row's
    (and, for the block head, from the previous BLOCK's trailing hash)."""
    if tbl.num_rows == 0:
        return tbl
    h = tbl["url_hash"].to_numpy(zero_copy_only=False)
    keep = np.empty(len(h), dtype=bool)
    keep[0] = drop_leading_hash is None or int(h[0]) != drop_leading_hash
    keep[1:] = h[1:] != h[:-1]
    return tbl.filter(pa.array(keep))


def _dedup_first_by_ord(ds: rd.Dataset) -> list:
    """Within-round first-wins dedup: global sort by (url_hash, ord), then a
    vectorized per-block pass with one boundary fix between adjacent blocks.
    Replaces a per-URL map_groups (1000× fewer Python calls). Returns block
    refs of the deduped stream."""
    refs = ds.sort(["url_hash", "ord"]).to_arrow_refs()
    bounds = ray.get([_block_hash_bounds.remote(r) for r in refs])
    out = []
    prev_last = None
    for r, b in zip(refs, bounds):
        if b is None:
            continue
        out.append(_dedup_sorted_block.remote(r, prev_last))
        prev_last = b[1]
    return out


class _SeenFilterFn:
    """Stateless task UDF holding seen-shard actor handles; one RPC per
    (block, shard)."""

    def __init__(self, shards):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        uh = batch["url_hash"].to_numpy(zero_copy_only=False)
        hh = batch["host_hash"].to_numpy(zero_copy_only=False)
        n_sh = len(self.shards)
        shard_ids = hh.astype(np.uint64) % np.uint64(n_sh)
        mask = np.zeros(len(uh), dtype=bool)
        futs, idxs = [], []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            futs.append(self.shards[int(s)].check_and_add.remote(uh[sel]))
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(futs)):
            mask[sel] = res
        return batch.filter(pa.array(mask))


@ray.remote
def _count_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _slice_with_seq(tbl: pa.Table, offset: int) -> pa.Table:
    seq = pa.array(offset + np.arange(tbl.num_rows, dtype=np.int64), type=pa.int64())
    return tbl.append_column("seq", seq)


def _assign_seq_sorted(ds: rd.Dataset, base: int) -> pa.Table:
    """Distributed enumeration: per-block counts → prefix sums → seq column.
    Result is gathered to the driver here because frontier rows are
    metadata-only (url + hashes); at 10^10 scale the gather becomes a
    per-block fragment commit with the same offsets."""
    refs = ds.sort("ord").to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in refs])
    offsets = base + np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    parts = ray.get(
        [_slice_with_seq.remote(r, int(o)) for r, o in zip(refs, offsets) if True]
    )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({n: [] for n in FRONTIER.names}, schema=FRONTIER)
    return pa.concat_tables(parts)


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
        ds = raw.map_batches(canonicalize_batch, batch_format="pyarrow")
        ds = ds.map_batches(_robots_filter, batch_format="pyarrow")
        ds = ds.map_batches(_add_ord, batch_format="pyarrow")
        deduped_refs = _dedup_first_by_ord(ds)
        if deduped_refs:
            ds = rd.from_arrow_refs(deduped_refs)
            ds = ds.map_batches(_SeenFilterFn(self.seen.shards), batch_format="pyarrow")
            tbl = _assign_seq_sorted(ds, seq_base)
        else:
            tbl = pa.table({n: [] for n in FRONTIER.names}, schema=FRONTIER)
        if tbl.num_rows:
            tbl = tbl.select(
                ["url", "host", "url_hash", "host_hash", "depth", "priority", "seq"]
            ).cast(FRONTIER)
        else:
            tbl = pa.table({n: [] for n in FRONTIER.names}, schema=FRONTIER)
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
            # split the (metadata-only) frontier into enough blocks that the
            # fetch actor pool is actually saturated — from_arrow alone yields
            # ONE block and would serialize the round
            n_blocks = max(1, -(-todo.num_rows // self.fetch_batch_size))
            ds = rd.from_arrow(todo).repartition(n_blocks)
            pool = min(self.fetch_concurrency, n_blocks)
            ds = ds.map_batches(
                Fetcher,
                fn_constructor_kwargs={
                    "cfg": self.cfg,
                    "politeness_shards": self.politeness.shards,
                    "max_retries": self.max_retries,
                },
                batch_format="pyarrow",
                batch_size=self.fetch_batch_size,
                concurrency=(1, pool),
                # 0.5 CPU per fetch actor: fetch (transport + page gen) and the
                # downstream parse/decode + commit tasks share the node instead
                # of fetch reserving every slot and serializing the round
                num_cpus=0.5,
            )
            ds = ds.map_batches(
                parse_decode, batch_format="pyarrow", batch_size=self.fetch_batch_size
            )
            stats = (
                ds.groupby("bucket")
                .map_groups(
                    commit_bucket,
                    fn_args=(self.store_root, depth),
                    batch_format="pyarrow",
                )
                .to_pandas()
            )
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
