"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the pubcrawl library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``    — flagship pipeline on sf0.001: the synthetic-web crawl
  (frontier → seen-set shards → politeness → fetch → decode → commit) plus a
  relational pass over the corpus; returns the image_caption result table.
- ``queries()``  — one entry per implemented operator family from SURVEY.md §2
  (registry in pubcrawl/queries.py).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: crawl the deterministic synthetic web into an
    image_caption table (input_hint shape) and return it."""
    import shutil
    import tempfile

    from pubcrawl.pipeline import crawl, load_images
    from pubcrawl.synthweb import WebConfig

    cfg = WebConfig(seed=42, n_hosts=8, pages_per_host=2, links_per_page=5,
                    images_per_page=2, details_per_host=30)
    root = tempfile.mkdtemp(prefix="pubcrawl_entry_") + "/store"
    crawl(cfg, root, fetch_concurrency=4, bucket_size=64, seen_shards=4)
    ds = load_images(root, canonical_order=True)
    return ds.select_columns(["image_id", "w", "h", "fmt", "caption", "phash"])


def queries() -> dict[str, Callable[[str], Any]]:
    from pubcrawl.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from pubcrawl.queries import get_oracle_sql

    return get_oracle_sql()
