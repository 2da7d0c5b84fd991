#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline pipeline = the synthetic-web crawl at bench scale (BASELINE.md:
fetched-URLs/sec + frontier-expansion rows/sec), plus the relational /
dedup / ANN query suite over $GRAFT_SF_DIR (default sf0.1).

  python bench.py              # one run at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling    # fresh processes at 8 and 32 CPUs on the
                               # same input → throughputs + efficiency

This script OWNS its Ray session (the only places allowed to: bench, CLI,
test fixture)."""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench web: ≥50k URLs over 256 hosts (FIXTURES.md §6) — enough host
# diversity that per-host politeness budgets never cap the 32-CPU run
BENCH_WEB = dict(
    seed=42,
    n_hosts=256,
    pages_per_host=8,
    links_per_page=24,
    images_per_page=1,
    details_per_host=512,
    min_side=16,
    max_side=64,
    fail_percent=2,
)

# queries excluded from the per-query timing loop (crawl runs separately)
SKIP_QUERIES = {"crawl_synth_web"}


def run_crawl(num_cpus: int) -> dict:
    from pubcrawl.pipeline import crawl
    from pubcrawl.synthweb import WebConfig

    root = tempfile.mkdtemp(prefix=f"pubcrawl_bench_{num_cpus}_") + "/store"
    cfg = WebConfig(**BENCH_WEB)
    t0 = time.monotonic()
    report = crawl(
        cfg,
        root,
        fetch_concurrency=num_cpus,
        fetch_batch_size=128,
        bucket_size=2048,
        seen_shards=8,
        politeness_shards=4,
        per_host_rate=200.0,
        burst=16,
    )
    wall = time.monotonic() - t0
    out = {
        "crawl_sec": round(wall, 2),
        "fetched_urls": report.fetched,
        "frontier_rows": report.links + report.seen,
        "images": report.images,
        "errors": report.errors,
        "rounds": report.rounds,
        "fetched_urls_per_sec": round(report.fetched / max(report.wall_fetch_s, 1e-9), 1),
        "frontier_rows_per_sec": round(
            (report.links + report.seen) / max(report.wall_expand_s, 1e-9), 1
        ),
        "wall_fetch_s": round(report.wall_fetch_s, 2),
        "wall_expand_s": round(report.wall_expand_s, 2),
    }
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    return out


def run_queries(sf_dir: str) -> dict:
    import pyarrow as pa
    import ray.data as rd

    from pubcrawl.queries import QUERIES

    out = {}
    for name, fn in QUERIES.items():
        if name in SKIP_QUERIES:
            continue
        t0 = time.monotonic()
        r = fn(sf_dir)
        if isinstance(r, rd.Dataset):
            n = r.count()
        elif isinstance(r, pa.Table):
            n = r.num_rows
        else:
            n = len(r)
        out[name] = round(time.monotonic() - t0, 2)
    return out


def main() -> None:
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # warm the page cache so we measure compute+shuffle, not first disk read
    import ray.data as rd

    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        rd.read_parquet(f"{SF_DIR}/{t}.parquet").count()

    crawl_stats = run_crawl(NUM_CPUS)
    queries = run_queries(SF_DIR)
    total = crawl_stats["crawl_sec"] + sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "crawl+query wall seconds (headline: synthetic-web crawl; "
                "see fetched_urls_per_sec / frontier_rows_per_sec)",
                "value": round(total, 2),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "crawl": crawl_stats,
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    lo, hi = results[8]["crawl"], results[32]["crawl"]
    eff_fetch = (hi["fetched_urls_per_sec"] / lo["fetched_urls_per_sec"]) / 4.0
    eff_expand = (hi["frontier_rows_per_sec"] / max(lo["frontier_rows_per_sec"], 1e-9)) / 4.0
    print(
        json.dumps(
            {
                "fetched_urls_per_sec@8": lo["fetched_urls_per_sec"],
                "fetched_urls_per_sec@32": hi["fetched_urls_per_sec"],
                "frontier_rows_per_sec@8": lo["frontier_rows_per_sec"],
                "frontier_rows_per_sec@32": hi["frontier_rows_per_sec"],
                "crawl_sec@8": lo["crawl_sec"],
                "crawl_sec@32": hi["crawl_sec"],
                "scaling_efficiency": round(eff_fetch, 3),
                "scaling_efficiency_expand": round(eff_expand, 3),
                "config": BENCH_WEB,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
