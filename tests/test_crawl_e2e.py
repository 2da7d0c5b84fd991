"""End-to-end crawl: the Ray Data pipeline must match the sequential oracle
bit-for-bit — URL-seen set, canonical discovery order, and every stored row's
pixel/caption/phash invariants (SURVEY.md §5 item 2, north_rule)."""

import shutil

import numpy as np
import pytest

from pubcrawl.imaging import decode_image, psnr
from pubcrawl.oracle import crawl_oracle
from pubcrawl.pipeline import crawl, load_images, load_pages
from pubcrawl.seen import SeenSet
from pubcrawl.synthweb import SyntheticTransport, WebConfig, detail_images

CFG = WebConfig(
    seed=7,
    n_hosts=8,
    pages_per_host=3,
    links_per_page=6,
    images_per_page=2,
    details_per_host=40,
    fail_percent=5,
)


@pytest.fixture(scope="module")
def oracle():
    return crawl_oracle(CFG)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl") / "store")
    report = crawl(CFG, root, fetch_concurrency=2, bucket_size=64, seen_shards=4)
    return root, report


def test_seen_set_matches_oracle(engine, oracle):
    root, report = engine
    pages = load_pages(root).to_pandas()
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    assert report.seen == len(oracle.seen_hashes)


def test_crawl_order_matches_oracle(engine, oracle):
    root, _ = engine
    pages = load_pages(root).to_pandas().sort_values("seq")
    assert list(pages.url) == [u for u, _, _ in oracle.order]
    assert list(pages.depth) == [d for _, d, _ in oracle.order]
    assert list(pages.seq) == [s for _, _, s in oracle.order]


def test_rows_match_oracle_bit_for_bit(engine, oracle):
    root, _ = engine
    imgs = load_images(root, canonical_order=True).to_pandas()
    golden = oracle.rows.to_pandas()
    assert len(imgs) == len(golden)
    assert list(imgs.image_id) == list(golden.image_id)
    assert list(imgs.caption) == list(golden.caption)
    assert list(imgs.phash) == list(golden.phash)
    assert list(imgs.w) == list(golden.w)
    assert list(imgs.h) == list(golden.h)
    assert list(imgs.fmt) == list(golden.fmt)
    assert all(a == b for a, b in zip(imgs["bytes"], golden["bytes"]))


def test_per_row_invariant_vs_generator(engine):
    """input_hint invariant: decoded pixels PSNR>=40dB vs generator ground
    truth for lossy rows, exact for png; caption exact equality."""
    root, _ = engine
    imgs = load_images(root).to_pandas()
    # rebuild ground truth per detail page
    from pubcrawl.hashing import xxh64

    truth = {}
    for h in range(CFG.n_hosts):
        for d in range(CFG.details_per_host):
            for it in detail_images(CFG, h, d):
                truth[f"img_{xxh64(it['identity']):016x}"] = it
    checked = 0
    for rec in imgs.itertuples():
        gt = truth[rec.image_id]
        dec = decode_image(rec.bytes, rec.fmt)
        if rec.fmt == "png":
            assert (dec == gt["pixels"]).all()
        else:
            assert psnr(gt["pixels"], dec) >= 40.0
        assert rec.caption == gt["caption"]
        assert (rec.h, rec.w) == gt["pixels"].shape[:2]
        checked += 1
    assert checked == len(imgs) > 0


def test_no_private_urls_fetched(engine):
    root, _ = engine
    pages = load_pages(root).to_pandas()
    assert not pages.url.str.contains("/private/").any()


def test_schema_is_input_hint(engine):
    from pubcrawl.schemas import IMAGE_CAPTION

    root, _ = engine
    ds = load_images(root)
    schema = ds.schema()
    for name, typ in zip(IMAGE_CAPTION.names, IMAGE_CAPTION.types):
        assert name in schema.names
        assert schema.base_schema.field(name).type == typ


def test_seen_shards_match_python_set():
    """SeenSet actors vs plain-set oracle under shuffled duplicate feeds."""
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    feed = np.concatenate([hashes, rng.permutation(hashes)[:300]])
    host_hash = (hashes % 97).astype(np.uint32)
    feed_hosts = np.concatenate([host_hash, (feed[500:] % 97).astype(np.uint32)])
    seen = SeenSet(num_shards=3)
    oracle_set: set[int] = set()
    mask_all = []
    for lo in range(0, len(feed), 64):
        chunk = feed[lo : lo + 64]
        hh = feed_hosts[lo : lo + 64]
        mask = seen.check_and_add_batch(chunk, hh)
        for h, m in zip(chunk, mask):
            expected_new = int(h) not in oracle_set
            assert bool(m) == expected_new
            oracle_set.add(int(h))
        mask_all.append(mask)
    assert seen.snapshot() == oracle_set


def test_seen_shard_spill_matches_python_set(tmp_path):
    """Forced spill regime (tiny in-RAM cap + tiny starting filter): exact
    first-wins membership must be bit-for-bit the plain-set semantics while
    the shard spills sorted runs to disk, consults the cuckoo filter as the
    fast negative path, and rebuilds the filter on overflow."""
    from pubcrawl.seen import _SeenShardImpl

    shard = _SeenShardImpl(
        capacity_hint=64,  # overflows fast → exercises the 2× rebuild
        spill_threshold=256,
        spill_dir=str(tmp_path / "spill"),
    )
    rng = np.random.default_rng(11)
    universe = rng.integers(0, 2**63, size=4000, dtype=np.uint64)
    oracle_set: set[int] = set()
    for lo in range(0, 12000, 200):
        batch = rng.choice(universe, size=200)  # heavy cross-batch duplication
        mask = shard.check_and_add(batch)
        firsts = set()
        for h, m in zip(batch, mask):
            expected = int(h) not in oracle_set and int(h) not in firsts
            assert bool(m) == expected
            firsts.add(int(h))
        oracle_set.update(int(h) for h in batch)
    stats = shard.spill_stats()
    assert stats["runs"] >= 2, stats  # the spill path really ran
    assert stats["in_ram"] < 256
    assert not stats["degraded"], stats  # rebuild kept the filter authoritative
    assert stats["spilled"] + stats["in_ram"] == len(oracle_set) == shard.count()
    snap = shard.snapshot()
    assert set(int(x) for x in snap) == oracle_set
    assert (np.diff(snap.astype(np.int64)) > 0).all()  # sorted unique
    # filter is the real negative path: non-members rarely reach the runs
    probes = rng.integers(2**63, 2**64 - 1, size=2000, dtype=np.uint64)
    probes = probes[~np.isin(probes, universe)]
    assert shard.filter_fp_rate(probes) < 0.05


def test_seen_shard_spill_fused_dedup_matches_plain(tmp_path):
    """dedup_check_and_add (the crawl's fused within-round dedup + seen path)
    under forced spill == the same calls against a no-spill shard."""
    from pubcrawl.seen import _SeenShardImpl

    a = _SeenShardImpl(capacity_hint=64, spill_threshold=128,
                       spill_dir=str(tmp_path / "s"))
    b = _SeenShardImpl()  # in-RAM reference
    rng = np.random.default_rng(5)
    for rnd in range(6):
        h = rng.integers(0, 500, size=400, dtype=np.uint64)
        ords = rng.permutation(400).astype(np.int64)
        ka = a.dedup_check_and_add(h, ords)
        kb = b.dedup_check_and_add(h, ords)
        assert (ka == kb).all()
    assert a.spill_stats()["runs"] >= 1
    assert (a.snapshot() == b.snapshot()).all()


def test_crawl_with_forced_spill_matches_oracle(tmp_path):
    """The full crawl with a tiny per-shard in-RAM cap (every round spills)
    reproduces the oracle's seen set and discovery order bit-for-bit — the
    spill regime is semantics-invisible."""
    cfg = WebConfig(seed=7, n_hosts=8, pages_per_host=3, links_per_page=6,
                    images_per_page=2, details_per_host=40, fail_percent=5)
    oracle = crawl_oracle(cfg)
    root = str(tmp_path / "store")
    crawl(cfg, root, fetch_concurrency=2, bucket_size=64, seen_shards=4,
          seen_spill_threshold=16)
    pages = load_pages(root).to_pandas()
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    assert list(pages.sort_values("seq").url) == [u for u, _, _ in oracle.order]
    assert list(pages.sort_values("seq").seq) == [s for _, _, s in oracle.order]


def test_hot_host_skew_crawl_matches_oracle(tmp_path):
    """Skew: most links target one hot host; the crawl must still match the
    oracle bit-for-bit (hot host split across seq buckets, rate enforced by
    its single token-bucket shard)."""
    cfg = WebConfig(seed=23, n_hosts=6, pages_per_host=2, links_per_page=8,
                    images_per_page=1, details_per_host=30,
                    cross_host_frac=0.9, dup_frac=0.2)  # ~90% of links cross-host
    # cross-host target selection is uniform; with the duplicate bias the
    # busiest host still ends up with a large share of detail URLs
    oracle = crawl_oracle(cfg)
    root = str(tmp_path / "store")
    crawl(cfg, root, fetch_concurrency=4, bucket_size=16, seen_shards=2,
          per_host_rate=500.0)
    pages = load_pages(root).to_pandas()
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    assert list(pages.sort_values("seq").url) == [u for u, _, _ in oracle.order]
    # hot-host spread: the busiest host's URLs span multiple seq buckets
    host_counts = pages.host.value_counts()
    hot = host_counts.index[0]
    hot_buckets = set((pages[pages.host == hot].seq // 16).astype(int))
    assert len(hot_buckets) > 1


def test_seed_priority_orders_submission_not_results(tmp_path):
    """Priority affects fetch scheduling only — results and seq order are
    identical to the uniform-priority crawl."""
    cfg = WebConfig(seed=29, n_hosts=4, pages_per_host=2, links_per_page=4,
                    images_per_page=1, details_per_host=20)
    oracle = crawl_oracle(cfg)
    root = str(tmp_path / "store")
    crawl(cfg, root, fetch_concurrency=2, bucket_size=8, seen_shards=2)
    pages = load_pages(root).to_pandas()
    assert list(pages.sort_values("seq").url) == [u for u, _, _ in oracle.order]


def test_dead_links_recorded_and_oracle_equal(tmp_path):
    """Permanent 404 targets: retries exhaust, page logged with status 404,
    no image rows — identical between engine and oracle."""
    cfg = WebConfig(seed=31, n_hosts=4, pages_per_host=2, links_per_page=6,
                    images_per_page=1, details_per_host=20, dead_frac=0.3)
    oracle = crawl_oracle(cfg, max_retries=1)
    root = str(tmp_path / "store")
    rep = crawl(cfg, root, fetch_concurrency=2, bucket_size=32, seen_shards=2,
                max_retries=1)
    pages = load_pages(root).to_pandas()
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    assert list(pages.sort_values("seq").url) == [u for u, _, _ in oracle.order]
    assert (pages.status == 404).sum() > 0
    assert rep.errors == int((pages.status != 200).sum())
    imgs = load_images(root, canonical_order=True).to_pandas()
    assert list(imgs.image_id) == list(oracle.rows["image_id"].to_pylist())


def test_threaded_fetcher_overlaps_latency():
    """Intra-actor fetch fan-out (VERDICT What's-missing #1): with an 80 ms
    simulated RTT, 8 threads must beat the serial fetcher by well over 2×
    on a 32-URL batch, with identical outputs."""
    import time as _time

    import pyarrow as pa

    from pubcrawl.canon import canonicalize_batch
    from pubcrawl.fetch import Fetcher

    # index pages: negligible payload CPU, so the ratio measures latency
    # overlap even when the noisy-neighbor VM steals most of the cores
    cfg = WebConfig(seed=3, n_hosts=8, pages_per_host=4, latency_s=0.08)
    urls = [f"synth://host-{h:05d}/index/{p}" for h in range(8) for p in range(4)]
    batch = canonicalize_batch(pa.table({"url": urls}))

    t0 = _time.monotonic()
    serial = Fetcher(cfg, fetch_threads=1)(batch)
    t_serial = _time.monotonic() - t0
    t0 = _time.monotonic()
    threaded = Fetcher(cfg, fetch_threads=8)(batch)
    t_threaded = _time.monotonic() - t0

    assert serial["payload"].to_pylist() == threaded["payload"].to_pylist()
    assert serial["status"].to_pylist() == threaded["status"].to_pylist()
    # 32×80ms ≥ 2.56s serial floor; threaded ≈ latency/8 (payload CPU ~0)
    assert t_serial >= 2.5
    assert t_threaded < t_serial / 2


def test_shard_clock_politeness_delays():
    """Multi-node politeness mode: the shard measures on its own clock and
    returns non-negative relative delays with the same admitted schedule
    (≥ interval spacing per host past the burst)."""
    import numpy as np

    from pubcrawl.politeness import _TokenBucketShardImpl

    sh = _TokenBucketShardImpl(per_host_rate=10.0, burst=2)  # 100ms interval
    d = sh.reserve_delays(["h1"] * 6 + ["h2"])
    assert (d >= 0).all()
    assert d[0] == 0 and d[1] == 0  # burst credits admit immediately
    gaps = np.diff(d[2:6])
    assert (gaps >= 0.0999).all()  # serialized at the host rate
    assert d[6] == 0  # other host unaffected


def test_crawl_shard_clock_matches_oracle(tmp_path):
    """politeness_clock='shard' must not change crawl content — only grant
    timing semantics differ."""
    from pubcrawl.oracle import crawl_oracle

    cfg = WebConfig(seed=21, n_hosts=4, pages_per_host=2, links_per_page=5,
                    images_per_page=2, details_per_host=16)
    root = str(tmp_path / "store")
    crawl(cfg, root, fetch_concurrency=2, bucket_size=64, seen_shards=2,
          politeness_clock="shard")
    orc = crawl_oracle(cfg)
    imgs = load_images(root, canonical_order=True).to_pandas()
    assert list(imgs.caption) == orc.rows["caption"].to_pylist()
    assert list(imgs.image_id) == orc.rows["image_id"].to_pylist()


def test_crawl_never_fetches_blocks_to_driver(tmp_path, monkeypatch):
    """Scale invariant (VERDICT r1 #5): the crawl loop's driver orchestrates
    with refs and scalars only — no Arrow block (frontier rows, fetch
    output, payload bytes) is ever ray.get on the driver. The key-column
    reduce's (mask, ord) numpy arrays are the designed exception."""
    import ray as _ray

    fetched_tables = []
    real_get = _ray.get

    def spy(refs, **kw):
        out = real_get(refs, **kw)
        vals = out if isinstance(out, list) else [out]
        import pyarrow as _pa

        fetched_tables.extend(v for v in vals if isinstance(v, _pa.Table))
        return out

    cfg = WebConfig(seed=31, n_hosts=4, pages_per_host=2, links_per_page=5,
                    images_per_page=2, details_per_host=16)
    monkeypatch.setattr(_ray, "get", spy)
    try:
        crawl(cfg, str(tmp_path / "store"), fetch_concurrency=2, bucket_size=64,
              seen_shards=2)
    finally:
        monkeypatch.setattr(_ray, "get", real_get)
    assert fetched_tables == [], (
        f"driver fetched {len(fetched_tables)} Arrow blocks during the crawl"
    )


# ------------------------------------------------------------ real HTTP e2e

CFG_HTTP = WebConfig(
    seed=11,
    n_hosts=4,
    pages_per_host=2,
    links_per_page=5,
    images_per_page=1,
    details_per_host=12,
    fail_percent=0,
)


@pytest.fixture(scope="module")
def http_mirror():
    """Local HTTP server mirroring the synthetic web's content under
    /host-XXXXX/...; the FIRST hit on every path returns 503 so urllib3's
    Retry layer inside HttpTransport is exercised on every URL."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    content = SyntheticTransport(CFG_HTTP)
    lock = threading.Lock()
    seen_once: set[str] = set()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                first = self.path not in seen_once
                seen_once.add(self.path)
            if first:
                self.send_response(503)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            st, data = content.fetch("synth:/" + self.path)
            self.send_response(st)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()


def test_http_transport_full_pipeline_matches_oracle(http_mirror, tmp_path):
    """The FULL crawl pipeline (politeness + seen + idempotent commits) over a
    REAL HTTP transport (requests.Session + urllib3 Retry), bit-for-bit against
    the sequential oracle on the same served content — VERDICT round-2 item 2.
    RewriteTransport keeps the canonical synth:// URL space (host structure for
    politeness/dedup) while bytes physically travel over localhost HTTP."""
    base = f"http://127.0.0.1:{http_mirror}/"

    def factory(base=base):
        from pubcrawl.fetch import HttpTransport, RewriteTransport

        return RewriteTransport(
            HttpTransport(total_retries=3, backoff=0.0, timeout=10),
            {"synth://": base},
        )

    root = str(tmp_path / "store")
    report = crawl(
        CFG_HTTP,
        root,
        fetch_concurrency=2,
        bucket_size=64,
        seen_shards=2,
        politeness_shards=2,
        fetch_threads=4,
        transport_factory=factory,
    )
    oracle = crawl_oracle(CFG_HTTP)
    pages = load_pages(root).to_pandas().sort_values("seq")
    assert set(int(x) for x in pages.url_hash) == oracle.seen_hashes
    assert list(pages.url) == [u for u, _, _ in oracle.order]
    assert report.errors == 0  # every 503 recovered inside the Retry layer
    imgs = load_images(root, canonical_order=True).to_pandas()
    golden = oracle.rows.to_pandas()
    assert list(imgs.image_id) == list(golden.image_id)
    assert list(imgs.phash) == list(golden.phash)
    assert list(imgs.caption) == list(golden.caption)


def test_crawl_delays_pace_without_changing_results(tmp_path):
    """A robots Crawl-delay override paces the delayed host's fetches but
    never changes WHAT is crawled: seen set and discovery order stay
    bit-identical to the oracle (politeness affects timing only)."""
    cfg = WebConfig(seed=9, n_hosts=4, pages_per_host=2, links_per_page=5,
                    images_per_page=1, details_per_host=8)
    root = str(tmp_path / "store")
    crawl(cfg, root, fetch_concurrency=2, seen_shards=2, politeness_shards=2,
          per_host_rate=200.0, crawl_delays={"host-00001": 0.05})
    o = crawl_oracle(cfg)
    pages = load_pages(root).to_pandas().sort_values("seq")
    assert set(int(x) for x in pages.url_hash) == o.seen_hashes
    assert list(pages.url) == [u for u, _, _ in o.order]


def test_validate_invariant_detects_tampering(tmp_path):
    """pipeline.validate_invariant: all-zero fail counts on a faithful store;
    a tampered caption and a corrupted pixel byte each flip exactly the
    matching fail counter (the check is not vacuous)."""
    import pyarrow.parquet as pq

    from pubcrawl.pipeline import crawl, validate_invariant
    from pubcrawl.store import ParquetFragmentStore
    from pubcrawl.synthweb import WebConfig

    cfg = WebConfig(seed=45, n_hosts=3, pages_per_host=2, links_per_page=4,
                    images_per_page=2, details_per_host=10)
    root = str(tmp_path / "store")
    crawl(cfg, root, fetch_concurrency=2, bucket_size=64, seen_shards=2)

    clean = validate_invariant(root, cfg).to_pandas()
    assert len(clean) >= 1 and int(clean["n"].sum()) > 0
    assert int(clean[["n_pixel_fail", "n_caption_fail", "n_unmatched",
                      "n_missing"]].sum().sum()) == 0
    assert int(clean["min_psnr_e2"].min()) >= 4000_00 // 100

    # tamper: flip one caption and zero one stored image's bytes
    store = ParquetFragmentStore(root)
    pid = next(p for p, meta in sorted(store.committed().items())
               if p.startswith("images_") and meta["rows"] > 0)
    path = store.fragment_path(pid)
    tbl = pq.read_table(path).to_pandas()
    tbl.loc[0, "caption"] = "tampered caption"
    tbl.loc[len(tbl) - 1, "bytes"] = b"\x00" * len(tbl.loc[len(tbl) - 1, "bytes"])
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False), path)

    dirty = validate_invariant(root, cfg).to_pandas()
    assert int(dirty["n_caption_fail"].sum()) >= 1
    assert int(dirty["n_pixel_fail"].sum()) >= 1

    # round-5 ADVICE regression: DROP a stored row entirely — the outer merge
    # must surface it as n_missing (a left merge made silent row loss pass)
    tbl2 = pq.read_table(path).to_pandas()
    dropped = tbl2.iloc[1:]
    pq.write_table(pa.Table.from_pandas(dropped, preserve_index=False), path)
    lossy = validate_invariant(root, cfg).to_pandas()
    assert int(lossy["n_missing"].sum()) >= 1
    assert int(lossy.loc[lossy["fmt"] == "__missing__", "n"].sum()) >= 1
