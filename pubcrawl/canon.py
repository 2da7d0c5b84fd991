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


def host_hash_of(host: str):
    """uint32 host hash — the same derivation canonicalize_batch uses (low
    32 bits of xxh64 over the host string), for callers that need to route a
    bare host to its politeness/seen shard."""
    import numpy as np

    return np.uint32(xxh64(host) & 0xFFFFFFFF)


# already-canonical fast path: lowercase scheme://host/path with no port,
# query, fragment, uppercase, duplicate slash, or dot-segment
# (named host group so ONE pc.extract_regex pass yields both the
# simple/slow mask — null rows — and the host column)
_SIMPLE = re.compile(
    r"^(?:[a-z0-9+.-]+)://(?P<host>[a-z0-9-]+(?:\.[a-z0-9-]+)*)(?:/(?:[^/?#\s]+/)*[^/?#\s]*)$"
)


_HOST_RX = r"^[a-z0-9+.-]+://(?P<host>[a-z0-9-]+(?:\.[a-z0-9-]+)*)/"


def _canon_host(u: str) -> tuple[str, str]:
    m = _SIMPLE.match(u)
    if m:  # lowercase scheme+host and clean path guaranteed by the pattern
        return u, m.group("host")
    c = canonical_url(u)
    return c, host_of(c)


def canonicalize_batch(
    batch: pa.Table, url_col: str = "url", dict_host: bool = False
) -> pa.Table:
    """map_batches UDF: canonicalize url column, add host / url_hash / host_hash.

    Hot path is fully vectorized: an Arrow-regex mask detects
    already-canonical URLs (kept zero-copy), hosts come from
    ``pc.extract_regex``, and both hashes run through the numpy-vectorized
    xxh64 (hashing.xxh64_arrow) — host hashes on the dictionary-encoded
    host column, so each distinct host is hashed once per batch. Only
    non-canonical URLs (uppercase, ports, query strings, dot-segments…)
    drop to the per-row urllib path.
    """
    import pyarrow.compute as pc

    from .hashing import xxh64_arrow

    if batch.num_rows == 0:
        cols = {name: batch[name] for name in batch.column_names}
        cols["host"] = pa.array([], pa.string())
        cols["url_hash"] = pa.array([], pa.uint64())
        cols["host_hash"] = pa.array([], pa.uint32())
        return pa.table(cols)
    urls_arr = batch[url_col]
    if isinstance(urls_arr, pa.ChunkedArray):
        urls_arr = urls_arr.combine_chunks()
    if urls_arr.type == pa.large_string():
        urls_arr = urls_arr.cast(pa.string())
    # two cheap passes beat one expensive one here: boolean match on the
    # full pattern (0.04 s/375k) + host extract on the tiny anchored prefix
    # pattern (0.06 s) — extract_regex over the FULL pattern with its nested
    # path quantifier measured 0.35 s for the same block
    simple = pc.match_substring_regex(urls_arr, _SIMPLE.pattern)
    n_slow = batch.num_rows - (pc.sum(pc.cast(simple, pa.int64())).as_py() or 0)
    if n_slow == 0:
        canon_arr = urls_arr
        hosts_arr = pc.struct_field(pc.extract_regex(urls_arr, _HOST_RX), "host")
    else:
        urls = urls_arr.to_pylist()
        smask = simple.to_pylist()
        pairs = [
            (u, _SIMPLE.match(u).group("host")) if ok else _canon_host(u)
            for u, ok in zip(urls, smask)
        ]
        canon_arr = pa.array([p[0] for p in pairs], pa.string())
        hosts_arr = pa.array([p[1] for p in pairs], pa.string())
    uh = xxh64_arrow(canon_arr)
    hd = hosts_arr.dictionary_encode()
    if isinstance(hd, pa.ChunkedArray):
        hd = hd.combine_chunks()
    dict_hashes = (xxh64_arrow(hd.dictionary) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hh = dict_hashes[hd.indices.to_numpy(zero_copy_only=False)]
    cols = {name: batch[name] for name in batch.column_names}
    cols[url_col] = canon_arr
    # dict_host=True keeps the host column DICTIONARY-encoded (hd already
    # exists for the host-hash derivation, so this is free): hosts repeat
    # heavily, and the expand chain moves each block through the object
    # store and a survivor filter before anything reads host strings —
    # indices move instead of ~20 B/row of repeated text. Callers cast the
    # (much smaller) survivor set back to plain string.
    cols["host"] = hd if dict_host else hosts_arr
    cols["url_hash"] = pa.array(uh, type=pa.uint64())
    cols["host_hash"] = pa.array(hh, type=pa.uint32())
    return pa.table(cols)
