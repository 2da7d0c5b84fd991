"""Checkpoint/resume: killing the crawl after round k and restarting must
yield the identical final state with no double-fetch of committed buckets
(SURVEY.md §5 item 4; north_rule 'resumable from checkpoint')."""

import json
import os

import pyarrow as pa
import pytest

from pubcrawl.oracle import crawl_oracle
from pubcrawl.pipeline import CrawlPipeline, crawl, load_images, load_pages
from pubcrawl.store import ParquetFragmentStore
from pubcrawl.synthweb import WebConfig

CFG = WebConfig(seed=11, n_hosts=6, pages_per_host=2, links_per_page=5,
                images_per_page=1, details_per_host=25)


class _Killed(RuntimeError):
    pass


def test_store_commit_idempotent(tmp_path):
    store = ParquetFragmentStore(str(tmp_path / "s"))
    t = pa.table({"url_hash": pa.array([5, 9], pa.uint64()), "x": [1, 2]})
    r1 = store.commit(t, "p0", lineage="test")
    r2 = store.commit(pa.table({"url_hash": pa.array([1], pa.uint64()), "x": [3]}), "p0")
    assert r1["rows"] == 2 and r2["rows"] == 2  # second commit is a no-op
    assert store.committed_paths() == [store.fragment_path("p0")]
    assert r1["url_lo"] == 5 and r1["url_hi"] == 9


def test_manifest_gates_visibility(tmp_path):
    store = ParquetFragmentStore(str(tmp_path / "s"))
    t = pa.table({"x": [1]})
    # fragment file without manifest line → invisible
    import pyarrow.parquet as pq

    pq.write_table(t, store.fragment_path("ghost"))
    assert store.committed_paths() == []
    store.commit(t, "real")
    assert store.committed_paths() == [store.fragment_path("real")]


def test_resume_refetches_bucket_with_partial_split_commit(tmp_path):
    """The bucket-commit halves (pages+links vs images) land independently, so
    a crash can leave a bucket with ONLY its images fragment committed. The
    done-check must require ALL THREE fragments — keying on images alone (the
    pre-split behavior) would skip the refetch and lose the bucket's pages and
    links forever (the next round's expand reads the links)."""
    import pyarrow.parquet as pq

    oracle = crawl_oracle(CFG)
    root_a = str(tmp_path / "a")
    crawl(CFG, root_a, fetch_concurrency=2, bucket_size=16, seen_shards=2)
    store_a = ParquetFragmentStore(root_a)
    img_pid = next(p for p in sorted(store_a.committed()) if p.startswith("images_d0_b"))

    # fresh store holding ONLY that images fragment (a crash between the
    # commit halves): resume must refetch the bucket, idempotently skip the
    # already-committed images, and write the missing pages+links
    root_b = str(tmp_path / "b")
    store_b = ParquetFragmentStore(root_b)
    store_b.commit(pq.read_table(store_a.fragment_path(img_pid)), img_pid)

    crawl(CFG, root_b, fetch_concurrency=2, bucket_size=16, seen_shards=2)
    committed = ParquetFragmentStore(root_b).committed()
    for part in ("pages", "links"):
        assert img_pid.replace("images", part) in committed
    pages = load_pages(root_b).to_pandas()
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    imgs = load_images(root_b, canonical_order=True).to_pandas()
    golden = oracle.rows.to_pandas()
    assert list(imgs.image_id) == list(golden.image_id)
    # the pre-committed fragment was reused, not rewritten (idempotent)
    with open(os.path.join(root_b, "_manifest.jsonl")) as f:
        pids = [json.loads(l)["partition_id"] for l in f if l.strip()]
    assert pids.count(img_pid) == 1


def test_resume_after_mid_crawl_kill(tmp_path):
    oracle = crawl_oracle(CFG)
    root = str(tmp_path / "store")

    # run 1: kill after the first fetch round commits
    pipe = CrawlPipeline(CFG, root, fetch_concurrency=2, bucket_size=16, seen_shards=2)
    original = pipe._run_round
    calls = {"n": 0}

    def killer(frontier, depth):
        out = original(frontier, depth)
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Killed()
        return out

    pipe._run_round = killer
    with pytest.raises(_Killed):
        pipe.run()

    committed_before = set(ParquetFragmentStore(root).committed())
    assert any(p.startswith("images_d0") for p in committed_before)

    # run 2: fresh pipeline (fresh seen-set actors) over the same store
    report = crawl(CFG, root, fetch_concurrency=2, bucket_size=16, seen_shards=2)

    pages = load_pages(root).to_pandas()
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    assert list(pages.sort_values("seq").url) == [u for u, _, _ in oracle.order]
    imgs = load_images(root, canonical_order=True).to_pandas()
    golden = oracle.rows.to_pandas()
    assert list(imgs.image_id) == list(golden.image_id)
    assert all(a == b for a, b in zip(imgs["bytes"], golden["bytes"]))

    # no double-commit: every partition_id appears exactly once in the manifest
    with open(os.path.join(root, "_manifest.jsonl")) as f:
        pids = [json.loads(l)["partition_id"] for l in f if l.strip()]
    assert len(pids) == len(set(pids))
    # run-1 fragments were reused, not rewritten
    assert committed_before <= set(pids)


def test_manifest_torn_line_skipped(tmp_path):
    """A reader racing a concurrent append can see a partially-written final
    line (Linux buffered reads don't serialize against in-flight O_APPEND
    writes — this crashed a real 128k-URL bench run). The torn record is an
    in-flight commit, so committed() must treat it as not-yet-committed
    rather than raise; once the writer finishes, the full line parses."""
    store = ParquetFragmentStore(str(tmp_path / "s"))
    t = pa.table({"url_hash": pa.array([5], pa.uint64()), "x": [1]})
    store.commit(t, "p0")
    full_line = (
        json.dumps({"partition_id": "p1", "url_lo": 0, "url_hi": 0, "rows": 1,
                    "bytes": 8, "fetch_errors": 0, "wall_ms": 0, "lineage": "",
                    "committed_at": "2026-08-18T00:00:00+00:00"}) + "\n"
    )
    with open(store.manifest_path, "a") as f:  # torn: first 40 bytes only
        f.write(full_line[:40])
    assert set(store.committed()) == {"p0"}
    assert not store.is_committed("p1")
    # writer finishes the append → the record becomes visible
    with open(store.manifest_path, "a") as f:
        f.write(full_line[40:])
    assert set(store.committed()) == {"p0", "p1"}


def test_manifest_concurrent_commits_parse(tmp_path):
    """Many processes appending commit records concurrently must leave a
    fully parsable manifest (single-syscall O_APPEND writes, no mid-line
    interleaving) with every partition present exactly once."""
    import multiprocessing as mp

    root = str(tmp_path / "s")
    ParquetFragmentStore(root)  # create dirs

    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_commit_many, args=(root, w)) for w in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    store = ParquetFragmentStore(root)
    recs = store.committed()
    assert set(recs) == {f"w{w}_p{i}" for w in range(4) for i in range(25)}
    with open(store.manifest_path) as f:
        for line in f:
            json.loads(line)  # every line intact


def _commit_many(root: str, worker: int):
    store = ParquetFragmentStore(root)
    # long lineage forces >8 KiB manifest lines — the case a buffered text
    # writer would split across multiple write() syscalls
    lineage = f"w={worker};" + "x" * 9000
    for i in range(25):
        t = pa.table({"url_hash": pa.array([i], pa.uint64()), "x": [i]})
        store.commit(t, f"w{worker}_p{i}", lineage=lineage)


def test_checkpoint_table_schema(tmp_path):
    from pubcrawl.schemas import CHECKPOINT
    from pubcrawl.store import checkpoint_table

    store = ParquetFragmentStore(str(tmp_path / "s"))
    store.commit(pa.table({"url_hash": pa.array([3, 8], pa.uint64())}), "p1",
                 lineage="depth=0", metrics={"fetch_errors": 1, "wall_ms": 12})
    tbl = checkpoint_table(store)
    assert tbl.schema.equals(CHECKPOINT)
    rec = tbl.to_pylist()[0]
    assert rec["partition_id"] == "p1" and rec["url_lo"] == 3 and rec["url_hi"] == 8
    assert rec["fetch_errors"] == 1 and rec["lineage"] == "depth=0"
    assert rec["committed_at"]


def test_derive_and_commit_idempotent_resume(tmp_path):
    """Derived-table write path: crawl → Resize actor stage → partitioned
    fragment commits. Second run commits nothing (all buckets skipped, zero
    new manifest lines); thumbnails are decodable at the target size."""
    import pyarrow.parquet as pq

    from pubcrawl import multimodal as mm
    from pubcrawl.imaging import png_decode
    from pubcrawl.pipeline import crawl
    from pubcrawl.store import ParquetFragmentStore
    from pubcrawl.synthweb import WebConfig

    root = str(tmp_path / "store")
    cfg = WebConfig(seed=5, n_hosts=3, pages_per_host=2, links_per_page=4,
                    images_per_page=2, details_per_host=10)
    crawl(cfg, root, fetch_concurrency=2, bucket_size=64, seen_shards=2)

    r1 = mm.derive_and_commit(root, mm.Resize, "thumbs", n_buckets=4,
                              concurrency=2, out_w=16, out_h=16)
    assert r1["committed"] > 0 and r1["rows"] > 0
    store = ParquetFragmentStore(root)
    lines_after_first = len(store.committed())

    r2 = mm.derive_and_commit(root, mm.Resize, "thumbs", n_buckets=4,
                              concurrency=2, out_w=16, out_h=16)
    assert r2["committed"] == 0 and r2["skipped"] == r1["committed"]
    assert len(store.committed()) == lines_after_first  # no new manifest lines

    pids = [p for p in store.committed() if p.startswith("thumbs_")]
    tbl = pq.read_table(store.fragment_path(pids[0]))
    assert set(["image_id", "thumb", "thumb_w", "thumb_h"]) <= set(tbl.column_names)
    img = png_decode(tbl["thumb"][0].as_py())
    assert img.shape[:2] == (16, 16)
    # every fragment holds EXACTLY the rows whose id hashes to its declared
    # bucket (regression: colliding buckets in one merge partition must not
    # commit under the first bucket's pid)
    import numpy as np

    from pubcrawl.hashing import xxh64_many

    for pid in pids:
        b = int(pid.rsplit("_", 1)[1])
        t = pq.read_table(store.fragment_path(pid))
        h = xxh64_many([str(v) for v in t["image_id"].to_pylist()])
        assert (h % np.uint64(4) == b).all(), pid


def test_store_time_travel_snapshots(tmp_path):
    """committed(as_of=k) / load(as_of=k) reproduce the store state after the
    k-th commit exactly: fragments are immutable and the manifest is
    append-only, so every historical version stays readable (Lance-style
    time travel)."""
    import pyarrow as pa

    from pubcrawl.store import ParquetFragmentStore

    store = ParquetFragmentStore(str(tmp_path / "tt"))
    snapshots = []
    for k in range(1, 6):
        store.commit(pa.table({"x": list(range(k))}), f"frag_{k:03d}", lineage=f"k={k}")
        snapshots.append(dict(store.committed()))
    assert store.version() == 5

    for k in range(1, 6):
        got = store.committed(as_of=k)
        assert got == snapshots[k - 1]
        tbl = store.load_arrow(as_of=k)
        assert tbl.num_rows == sum(range(1, k + 1))
    # as_of beyond the head clamps to the latest state
    assert store.committed(as_of=99) == snapshots[-1]
    # version-0 snapshot is empty
    assert store.committed(as_of=0) == {}
    assert store.load_arrow(as_of=0) is None


def test_compaction_preserves_rows_history_and_idempotency(tmp_path):
    """store.compact: live reads see identical rows through one compacted
    fragment; pre-compaction as_of snapshots still resolve the original
    fragments; replaced pids remain is_committed (resume never re-fetches a
    compacted partition); compaction itself is idempotent."""
    import pandas as pd
    import pyarrow as pa

    from pubcrawl.store import ParquetFragmentStore, compact

    store = ParquetFragmentStore(str(tmp_path / "c"))
    for k in range(4):
        store.commit(pa.table({"x": [k * 10 + i for i in range(3)]}), f"part_{k:03d}")
    before = store.load_arrow().to_pandas().sort_values("x").reset_index(drop=True)
    v_before = store.version()

    rec = compact(store, [f"part_{k:03d}" for k in range(3)], "part_c000")
    assert rec["rows"] == 9 and rec["replaces"] == ["part_000", "part_001", "part_002"]

    live = store.committed()
    assert set(live) == {"part_c000", "part_003"}
    after = store.load_arrow().to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)  # same rows, fewer fragments

    # pre-compaction snapshot: original fragments, same rows
    snap = store.load_arrow(as_of=v_before).to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, snap)
    assert set(store.committed(as_of=v_before)) == {f"part_{k:03d}" for k in range(4)}

    # resume idempotency: replaced pids still read as committed, and a
    # re-commit attempt is a no-op (no new manifest line)
    v = store.version()
    assert store.is_committed("part_001")
    store.commit(pa.table({"x": [999]}), "part_001")
    assert store.version() == v
    # idempotent compaction: re-running adds nothing
    compact(store, [f"part_{k:03d}" for k in range(3)], "part_c000")
    assert store.version() == v


def test_vacuum_reclaims_superseded_and_tmp_only(tmp_path):
    """store.vacuum removes compaction-superseded fragments and orphaned
    .tmp files, keeps every live fragment, and the live table reads
    identically afterward; dry_run touches nothing."""
    import os

    import pandas as pd
    import pyarrow as pa

    from pubcrawl.store import ParquetFragmentStore, compact, vacuum

    store = ParquetFragmentStore(str(tmp_path / "v"))
    for k in range(3):
        store.commit(pa.table({"x": [k]}), f"part_{k:03d}")
    compact(store, ["part_000", "part_001", "part_002"], "part_c000")
    # orphaned tmp from a "crashed" commit
    stray = os.path.join(store.frag_dir, "part_dead.parquet.tmp")
    open(stray, "wb").write(b"junk")

    before = store.load_arrow().to_pandas().sort_values("x").reset_index(drop=True)
    dr = vacuum(store, dry_run=True, grace_s=0)
    assert dr["removed"] == 4 and os.path.exists(stray)  # 3 superseded + tmp

    res = vacuum(store, grace_s=0)
    assert res["removed"] == 4 and res["bytes_reclaimed"] > 0
    assert not os.path.exists(stray)
    assert not os.path.exists(store.fragment_path("part_000"))
    assert os.path.exists(store.fragment_path("part_c000"))
    after = store.load_arrow().to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    # resume idempotency survives: superseded pids still read committed
    assert store.is_committed("part_001")


def test_vacuum_grace_period_protects_inflight_commits(tmp_path):
    """Round-5 ADVICE regression (store.py vacuum race): commit() renames
    tmp→final BEFORE appending the manifest line, so a concurrent vacuum can
    observe a renamed-but-not-yet-manifested fragment. With the default grace
    period, vacuum must keep any young file (both a fresh .tmp — the
    concurrent writer's os.replace source — and a fresh fragment whose
    manifest line hasn't landed); only grace_s=0 reclaims them."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pubcrawl.store import ParquetFragmentStore, vacuum

    store = ParquetFragmentStore(str(tmp_path / "g"))
    store.commit(pa.table({"x": [1]}), "part_live")

    # simulate the rename→append window: fragment file present, no manifest line
    inflight = store.fragment_path("part_inflight")
    pq.write_table(pa.table({"x": [2]}), inflight)
    # and a concurrent commit's in-progress tmp
    tmp = store.fragment_path("part_writing") + ".tmp"
    open(tmp, "wb").write(b"partial")

    res = vacuum(store)  # default grace: both files are young → untouchable
    assert res["removed"] == 0
    assert os.path.exists(inflight) and os.path.exists(tmp)

    # the "concurrent" commit's manifest line lands → the fragment is live and
    # stays protected even under grace_s=0
    import json as _json

    rec = {"partition_id": "part_inflight", "rows": 1, "bytes": 1,
           "url_lo": 0, "url_hi": 0, "fetch_errors": 0, "wall_ms": 0,
           "lineage": "", "committed_at": "now"}
    with open(store.manifest_path, "a") as f:
        f.write(_json.dumps(rec) + "\n")
    res = vacuum(store, grace_s=0)
    assert os.path.exists(inflight)           # manifested → kept
    assert not os.path.exists(tmp)            # quiescent orphan → reclaimed
    assert res["removed"] == 1


def test_idempotent_commit_returns_historical_record_after_compaction(tmp_path):
    """Round-5 ADVICE regression (store.py:142): re-committing a pid that
    compaction superseded must return its HISTORICAL manifest record (with
    'rows'), not a stub that KeyErrors callers reading rec['rows']; the same
    holds for re-running compact() after its output was itself compacted."""
    import pyarrow as pa

    from pubcrawl.store import ParquetFragmentStore, compact

    store = ParquetFragmentStore(str(tmp_path / "h"))
    for k in range(3):
        store.commit(pa.table({"x": [k, k]}), f"part_{k:03d}")
    compact(store, ["part_000", "part_001"], "part_c000")

    rec = store.commit(pa.table({"x": [99]}), "part_000")  # superseded pid
    assert rec["partition_id"] == "part_000" and rec["rows"] == 2

    # second-generation compaction supersedes the first compact output…
    compact(store, ["part_c000", "part_002"], "part_c001")
    # …and re-running the FIRST compaction still returns a rows-bearing record
    rec = compact(store, ["part_000", "part_001"], "part_c000")
    assert rec["rows"] == 4
    assert store.record("does_not_exist") is None


def test_compact_cli_converges_over_prior_compact_outputs(tmp_path, capsys):
    """Round-5 ADVICE regression (__main__.py compact): prior compact_*
    outputs are candidates for the next compaction, so repeated runs converge
    to ONE live fragment instead of accumulating compact_vNNNNNN forever."""
    import json

    import pyarrow as pa

    from pubcrawl.__main__ import main
    from pubcrawl.store import ParquetFragmentStore

    root = str(tmp_path / "cli")
    store = ParquetFragmentStore(root)
    for k in range(3):
        store.commit(pa.table({"x": [k]}), f"part_{k:03d}")

    assert main(["compact", "--store", root, "--prefix", "part_"]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["compacted"] == 3

    # new commits arrive; the next compaction must fold the PRIOR compact
    # output in with them
    store = ParquetFragmentStore(root)
    store.commit(pa.table({"x": [10]}), "part_100")
    assert main(["compact", "--store", root, "--prefix", "part_"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["compacted"] == 2  # compact_v + part_100, not just part_100

    live = ParquetFragmentStore(root).committed()
    assert len(live) == 1 and out2["rows"] == 4
