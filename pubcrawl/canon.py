"""URL canonicalization + hashing (frontier identity).

north_rule: "canonicalized + xxhash64 URLs, partitioned by host-hash".
Generalizes the reference's ad-hoc URL handling (`urljoin` + pattern maps at
/root/reference/src/scrapers/acl_scraper.py:43 and
/root/reference/src/crawlers/run_crawler.py:68-89) into one deterministic rule:

  scheme+host lowercased · default port stripped · fragment stripped ·
  query params sorted · duplicate slashes in path collapsed ·
  trailing slash normalized ('' path → '/').

Batch entry point ``canonicalize_batch`` is the map_batches UDF: Arrow table
in/out, adds url (canonical), host, url_hash:uint64, host_hash:uint32.
"""

from __future__ import annotations

import re
import urllib.parse
from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode, urljoin

# let urljoin resolve relative links on the synthetic-web scheme
for _reg in (urllib.parse.uses_relative, urllib.parse.uses_netloc):
    if "synth" not in _reg:
        _reg.append("synth")

import numpy as np
import pyarrow as pa

from .hashing import xxh64, xxh64_many

_DEFAULT_PORTS = {"http": "80", "https": "443", "synth": ""}
_MULTI_SLASH = re.compile(r"/{2,}")


def canonical_url(url: str, base: str | None = None) -> str:
    """Canonical form of ``url`` (resolved against ``base`` if relative)."""
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, None):
        netloc = f"{host}:{port}"
    path = _MULTI_SLASH.sub("/", parts.path) or "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    h = urlsplit(url).hostname
    return h.lower() if h else ""


def url_hash(url: str) -> int:
    return xxh64(canonical_url(url))


# already-canonical fast path: lowercase scheme://host/path with no port,
# query, fragment, uppercase, duplicate slash, or dot-segment
_SIMPLE = re.compile(r"^([a-z0-9+.-]+)://([a-z0-9-]+(?:\.[a-z0-9-]+)*)(/(?:[^/?#\s]+/)*[^/?#\s]*)$")


def _canon_host(u: str) -> tuple[str, str]:
    m = _SIMPLE.match(u)
    if m:  # lowercase scheme+host and clean path guaranteed by the pattern
        return u, m.group(2)
    c = canonical_url(u)
    return c, host_of(c)


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """map_batches UDF: canonicalize url column, add host / url_hash / host_hash.

    Python-level loop over the batch's strings (URL parsing is not
    expressible in pyarrow.compute); already-canonical URLs take a single
    regex-match fast path, and host hashes are memoized per batch (hosts
    repeat heavily in any crawl frontier).
    """
    urls = batch[url_col].to_pylist()
    pairs = [_canon_host(u) for u in urls]
    canon = [p[0] for p in pairs]
    hosts = [p[1] for p in pairs]
    uh = xxh64_many(canon)
    host_cache: dict[str, int] = {}
    hh = np.empty(len(hosts), dtype=np.uint32)
    for i, hname in enumerate(hosts):
        v = host_cache.get(hname)
        if v is None:
            v = host_cache[hname] = xxh64(hname) & 0xFFFFFFFF
        hh[i] = v
    cols = {name: batch[name] for name in batch.column_names}
    cols[url_col] = pa.array(canon, type=pa.string())
    cols["host"] = pa.array(hosts, type=pa.string())
    cols["url_hash"] = pa.array(uh, type=pa.uint64())
    cols["host_hash"] = pa.array(hh, type=pa.uint32())
    return pa.table(cols)
