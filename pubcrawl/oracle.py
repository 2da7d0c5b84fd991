"""Sequential oracle crawler — the golden semantics the Ray engine must match.

A faithful ~100-line generalization of the reference's crawl loop
(/root/reference/src/crawlers/run_crawler.py:110-196 — sequential task loop —
plus /root/reference/src/scrapers/acl_scraper.py:60-100 — index→detail
expansion). The reference's concurrent fetch order is nondeterministic
(``as_completed`` append at acl_scraper.py:97-100), so per SURVEY.md §2.10 the
canonical, reproducible crawl order is DISCOVERY order: seeds in seq order,
then strict BFS; links registered in page order at extraction time.

Spec (binding for both this oracle and the Ray pipeline):
  1. canonicalize every URL; identity = xxh64(canonical url).
  2. robots: synthetic policy disallows /private/ — such links are never
     registered in the seen set and never fetched.
  3. seen-set membership is assigned at DISCOVERY time; the global ``seq``
     counter increments per newly-seen URL (seeds first, in seed order).
  4. fetch in (depth, seq) order; index pages expand links in page order;
     detail pages emit image rows in page order.
  5. output rows ordered by (seq, image index); phash computed on DECODED
     pixels (so lossy re-encode drift is inside the hash, identically for
     oracle and engine).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .canon import canonical_url, host_of
from .hashing import xxh64
from .imaging import decode_image, phash64
from .schemas import IMAGE_CAPTION
from .synthweb import (
    SyntheticTransport,
    WebConfig,
    page_kind,
    parse_detail_payload,
    parse_index_payload,
    robots_allowed,
)


@dataclass
class OracleResult:
    seen_hashes: set[int]
    order: list[tuple[str, int, int]]  # (canonical url, depth, seq)
    rows: pa.Table  # IMAGE_CAPTION schema, canonical order
    fetched: int = 0


def crawl_oracle(cfg: WebConfig, max_depth: int = 10, max_retries: int = 5) -> OracleResult:
    transport = SyntheticTransport(cfg)
    seen: set[int] = set()
    order: list[tuple[str, int, int]] = []
    frontier: deque[tuple[str, int, int]] = deque()
    seq = 0
    for url in cfg.seed_urls():
        cu = canonical_url(url)
        uh = xxh64(cu)
        if uh in seen or not robots_allowed(cu):
            continue
        seen.add(uh)
        frontier.append((cu, 0, seq))
        order.append((cu, 0, seq))
        seq += 1

    rows: dict[str, list] = {k: [] for k in IMAGE_CAPTION.names}
    fetched = 0
    while frontier:
        url, depth, useq = frontier.popleft()
        status, payload = 0, b""
        for _ in range(max_retries + 1):
            status, payload = transport.fetch(url)
            if status == 200:
                break
        fetched += 1
        if status != 200:
            continue
        if page_kind(url) == "index":
            if depth >= max_depth:
                continue
            for link in parse_index_payload(payload):
                cu = canonical_url(link, base=url)
                if not robots_allowed(cu):
                    continue
                uh = xxh64(cu)
                if uh in seen:
                    continue
                seen.add(uh)
                frontier.append((cu, depth + 1, seq))
                order.append((cu, depth + 1, seq))
                seq += 1
        else:
            uh = xxh64(url)
            for i, item in enumerate(parse_detail_payload(payload)):
                pixels = decode_image(item["bytes"], item["fmt"])
                identity = f"{url}/img/{i}"
                rows["image_id"].append(f"img_{xxh64(identity):016x}")
                rows["bytes"].append(item["bytes"])
                rows["w"].append(item["w"])
                rows["h"].append(item["h"])
                rows["fmt"].append(item["fmt"])
                rows["caption"].append(item["caption"])
                rows["phash"].append(phash64(pixels))
    table = pa.table(rows, schema=IMAGE_CAPTION)
    return OracleResult(seen_hashes=seen, order=order, rows=table, fetched=fetched)
