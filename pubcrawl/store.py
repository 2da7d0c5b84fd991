"""TableStore: committed-fragment storage with manifest, lineage + metrics.

north_rule asks for Lance tables; ``pylance`` is not installable in this
sandbox, so the store is ``ParquetFragmentStore`` — a directory of immutable
parquet fragment files plus an append-only ``_manifest.jsonl``, which mirrors
the Lance commit model (fragments + manifest versioning) so a Lance backend
could implement the same commit/load interface. Commit protocol: write
``fragments/<id>.parquet.tmp`` → fsync → atomic rename → append one manifest
line (fsync'd). A fragment not named in the manifest does not exist;
re-committing a partition_id is a no-op (idempotent under retries, the
reference analogue being the skip-if-exists PDF sink at
/root/reference/src/utils/downloader.py:27-28 and the Chroma upsert at
/root/reference/src/search/embedder_chroma.py:117-125).

Each manifest line is the checkpoint row (FIXTURES.md §4): partition_id,
url_lo/url_hi, rows, bytes, fetch_errors, wall_ms, lineage, committed_at —
resume reads the manifest, skips committed partitions, and re-seeds the
seen-set from the committed crawl log.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq


class ParquetFragmentStore:
    def __init__(self, root: str):
        self.root = root
        self.frag_dir = os.path.join(root, "fragments")
        self.manifest_path = os.path.join(root, "_manifest.jsonl")
        os.makedirs(self.frag_dir, exist_ok=True)
        # in-process manifest cache: (mtime_ns, size) → parsed records, so a
        # commit loop is O(n) instead of re-parsing the manifest per call.
        # Another process appending invalidates via the stat signature; the
        # worst stale-cache outcome is one redundant (idempotent) re-commit.
        self._cache_sig: tuple[int, int] | None = None
        self._cache: dict[str, dict] = {}
        self._replaced: set[str] = set()  # pids superseded by compaction

    # ------------------------------------------------------------ manifest

    def committed(self, as_of: int | None = None) -> dict[str, dict]:
        """Committed records; ``as_of=k`` returns the SNAPSHOT after the
        k-th manifest commit (time travel, Lance-style versioning):
        fragments are immutable and the manifest append-only, so the first
        k durable lines reproduce the store state at version k exactly."""
        if as_of is None:
            try:
                st = os.stat(self.manifest_path)
                sig = (st.st_mtime_ns, st.st_size)
            except FileNotFoundError:
                self._cache_sig, self._cache = None, {}
                return {}
            if sig == self._cache_sig:
                return self._cache
        out: dict[str, dict] = {}
        gone: set[str] = set()
        n = 0
        try:
            f = open(self.manifest_path, "rb")
        except FileNotFoundError:
            return {}
        with f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    # Torn read: a concurrent appender's line was partially
                    # visible (Linux buffered reads don't serialize against
                    # in-flight O_APPEND writes). The record isn't durable
                    # yet, so treating it as uncommitted is correct — commit
                    # is idempotent by partition_id and the line parses on
                    # the next read once the writer's fsync completes.
                    continue
                if as_of is not None and n >= as_of:
                    break
                for old in rec.get("replaces", ()):  # compaction supersede
                    out.pop(old, None)
                    gone.add(old)
                out[rec["partition_id"]] = rec  # last write wins
                n += 1
        if as_of is None:
            self._cache_sig, self._cache = sig, out
            self._replaced = gone
        return out

    def version(self) -> int:
        """Current store version = number of durable manifest lines (the
        same counting ``as_of`` uses, so committed(as_of=version()) is
        always the latest snapshot — even if a rare double-append left
        duplicate partition_id lines, which last-write-wins collapses)."""
        try:
            f = open(self.manifest_path, "rb")
        except FileNotFoundError:
            return 0
        n = 0
        with f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    json.loads(line)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    continue
                n += 1
        return n

    def is_committed(self, partition_id: str) -> bool:
        # a compacted-away pid is STILL committed for resume idempotency:
        # its rows live on inside the compacted fragment
        live = self.committed()
        return partition_id in live or partition_id in self._replaced

    def record(self, partition_id: str) -> dict | None:
        """Last manifest record for ``partition_id`` — INCLUDING pids that
        compaction superseded (``committed()`` drops those from the live
        snapshot). This is what idempotent commit/compact return on the
        already-committed path, so callers can always read ``rec['rows']``."""
        live = self.committed()
        if partition_id in live:
            return live[partition_id]
        if partition_id not in self._replaced:
            return None
        out = None
        try:
            f = open(self.manifest_path, "rb")
        except FileNotFoundError:
            return None
        with f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    continue
                if rec.get("partition_id") == partition_id:
                    out = rec  # last write wins
        return out

    # ------------------------------------------------------------ commit

    def fragment_path(self, partition_id: str) -> str:
        return os.path.join(self.frag_dir, f"{partition_id}.parquet")

    def commit(
        self,
        table: pa.Table,
        partition_id: str,
        lineage: str = "",
        metrics: dict | None = None,
        replaces: list[str] | None = None,
    ) -> dict:
        """Atomically commit one fragment. Idempotent by partition_id.
        ``replaces`` marks earlier partition_ids as superseded by this one
        (compaction): they leave the live snapshot but stay committed for
        resume idempotency, and historical as_of reads still see them."""
        if self.is_committed(partition_id):
            # superseded pids resolve their HISTORICAL manifest record so the
            # idempotent return always carries rows/bytes (callers read
            # rec['rows']); the keyed stub is a last-resort for a torn manifest
            rec = self.record(partition_id)
            return rec if rec is not None else {
                "partition_id": partition_id, "replaced": True,
                "rows": 0, "bytes": 0,
            }
        final = self.fragment_path(partition_id)
        tmp = final + ".tmp"
        # zstd for metadata tables; already-compressed binary payloads (PNG/JPEG
        # bytes) gain nothing from re-compression — snappy keeps commits cheap
        comp = "snappy" if any(pa.types.is_large_binary(t) or pa.types.is_binary(t)
                               for t in table.schema.types) else "zstd"
        pq.write_table(table, tmp, compression=comp)
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        os.replace(tmp, final)
        uh = None
        if "url_hash" in table.column_names and table.num_rows:
            import pyarrow.compute as pc

            uh = (
                int(pc.min(table["url_hash"]).as_py()),
                int(pc.max(table["url_hash"]).as_py()),
            )
        metrics = metrics or {}
        rec = {
            "partition_id": partition_id,
            "url_lo": uh[0] if uh else 0,
            "url_hi": uh[1] if uh else 0,
            "rows": table.num_rows,
            "bytes": table.nbytes,
            "fetch_errors": int(metrics.get("fetch_errors", 0)),
            "wall_ms": int(metrics.get("wall_ms", 0)),
            "lineage": lineage,
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        if replaces:
            rec["replaces"] = sorted(replaces)
        # Single os.write on an O_APPEND fd: one syscall per record, so
        # concurrent committers can't interleave mid-line (Python's buffered
        # text writer would split lines > ~8 KiB across multiple write()s).
        payload = (json.dumps(rec) + "\n").encode()
        fd = os.open(self.manifest_path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            view = memoryview(payload)
            while view:  # partial writes only on signals/ENOSPC; finish the line
                view = view[os.write(fd, view):]
            os.fsync(fd)
        finally:
            os.close(fd)
        return rec

    # ------------------------------------------------------------ read

    def committed_paths(self, as_of: int | None = None) -> list[str]:
        return [
            self.fragment_path(pid)
            for pid in sorted(self.committed(as_of))
            if os.path.exists(self.fragment_path(pid))
        ]

    def load(self, as_of: int | None = None):
        """→ ray.data.Dataset over committed fragments only (never .tmp);
        ``as_of=k`` reads the version-k snapshot (time travel)."""
        import ray.data as rd

        paths = self.committed_paths(as_of)
        if not paths:
            return rd.from_items([])
        return rd.read_parquet(paths)

    def load_arrow(self, as_of: int | None = None) -> pa.Table | None:
        paths = self.committed_paths(as_of)
        if not paths:
            return None
        return pa.concat_tables([pq.read_table(p) for p in paths])


def open_store(root: str):
    """The engine's store factory — parquet-fragment backend (the one
    implemented; see module docstring for how it mirrors the Lance commit
    model)."""
    return ParquetFragmentStore(root)


def checkpoint_table(store: "ParquetFragmentStore") -> pa.Table:
    """The checkpoint/lineage table (FIXTURES.md §4 schema) materialized from
    the manifest — one row per committed partition with url range, rows,
    bytes, fetch errors, wall time, lineage and commit timestamp."""
    from .schemas import CHECKPOINT

    rows = {name: [] for name in CHECKPOINT.names}
    for pid in sorted(store.committed()):
        rec = store.committed()[pid]
        for name in CHECKPOINT.names:
            rows[name].append(rec.get(name))
    return pa.table(rows, schema=CHECKPOINT)


def compact(
    store: ParquetFragmentStore,
    partition_ids: list[str],
    new_partition_id: str,
    lineage: str = "",
) -> dict:
    """Compact small fragments into one (the lakehouse maintenance op a
    many-small-commits crawl needs): concatenate the named LIVE fragments in
    sorted-pid order and commit the result with ``replaces`` set, all in one
    manifest append — readers never observe an intermediate state, historical
    ``as_of`` snapshots still resolve the original fragments (their files are
    immutable and never deleted here), and the replaced pids stay
    is_committed()=True so crawl resume never re-fetches them. Idempotent by
    new_partition_id."""
    if store.is_committed(new_partition_id):
        rec = store.record(new_partition_id)
        return rec if rec is not None else {
            "partition_id": new_partition_id, "replaced": True,
            "rows": 0, "bytes": 0,
        }
    live = store.committed()
    pids = sorted(p for p in partition_ids if p in live)
    if not pids:
        raise ValueError("no live fragments to compact")
    tbl = pa.concat_tables([pq.read_table(store.fragment_path(p)) for p in pids])
    return store.commit(
        tbl, new_partition_id,
        lineage=lineage or f"compact:{len(pids)}",
        replaces=pids,
    )


def vacuum(
    store: ParquetFragmentStore, dry_run: bool = False, grace_s: float = 300.0
) -> dict:
    """Reclaim disk from fragments no longer referenced by the LIVE snapshot:
    compaction-superseded fragments and orphaned ``.tmp`` files from crashed
    commits. Explicitly SACRIFICES time travel to versions that referenced
    the removed fragments (their manifest lines remain, and as_of reads skip
    missing files via committed_paths' existence check); the live table and
    resume idempotency (manifest-based, not file-based) are untouched.

    Safe against CONCURRENT committers (round-5 ADVICE fix): commit() renames
    tmp→final BEFORE appending the manifest line, so a fragment caught in that
    window looks orphaned. Two guards close it: (1) the live set is re-read
    AFTER the directory listing, so anything whose manifest line landed by
    then is kept; (2) only files older than ``grace_s`` (mtime) are deleted —
    a rename→append window is milliseconds, so any file younger than the
    grace period is treated as a possibly-in-flight commit, for .tmp files
    (the concurrent writer's os.replace source) and fresh fragments alike.
    ``grace_s=0`` restores unconditional reclaim for quiescent stores.
    Returns {removed, kept, bytes_reclaimed}."""
    import time

    names = sorted(os.listdir(store.frag_dir))
    live = {
        os.path.basename(store.fragment_path(pid))
        for pid in store.committed()
    }
    now = time.time()
    removed, kept, reclaimed = 0, 0, 0
    for name in names:
        path = os.path.join(store.frag_dir, name)
        try:
            if not os.path.isfile(path):
                continue
            if name in live:
                kept += 1
                continue
            if not (name.endswith(".parquet") or name.endswith(".tmp")):
                kept += 1
                continue
            if now - os.path.getmtime(path) < grace_s:
                kept += 1  # possibly a commit in flight — not yet reclaimable
                continue
            size = os.path.getsize(path)
            if not dry_run:
                os.unlink(path)
        except FileNotFoundError:
            continue  # a concurrent vacuum/commit won the race for this file
        reclaimed += size
        removed += 1
    return {"removed": removed, "kept": kept, "bytes_reclaimed": reclaimed}
