"""Stable pyarrow schemas for the engine's tables (FIXTURES.md §1/§4).

Schema is explicit and fixed — the reference's dynamic dict-union rows
(/root/reference/src/crawlers/run_crawler.py:138-147) are replaced by typed
Arrow tables end-to-end.
"""

from __future__ import annotations

import pyarrow as pa

# the authoritative input_hint table: one row per stored crawl result
IMAGE_CAPTION = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("host_hash", pa.uint32()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("seq", pa.int64()),
    ]
)

# crawl log: one row per fetched URL (also the resume / seen-set source)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("kind", pa.string()),  # "index" | "detail"
        ("status", pa.int32()),
        ("n_links", pa.int32()),
        ("n_images", pa.int32()),
        ("payload_bytes", pa.int64()),
    ]
)

CHECKPOINT = pa.schema(
    [
        ("partition_id", pa.string()),
        ("url_lo", pa.uint64()),
        ("url_hi", pa.uint64()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("fetch_errors", pa.int64()),
        ("wall_ms", pa.int64()),
        ("lineage", pa.string()),
        ("committed_at", pa.string()),
    ]
)

SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("priority", pa.float64()),
        ("seq", pa.int64()),
    ]
)
