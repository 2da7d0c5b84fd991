"""Deterministic synthetic web: the no-network stand-in for the reference's
live sites (FIXTURES.md §3).

Every page's content is a pure function of (config, url) — nothing is
pregenerated, so a 50k-URL bench web costs no setup and an actor-pool of
fetchers sees the identical web from every worker.

Layout per host ``synth://host-{h:05d}``:
  /index/{p}   p ∈ [0, pages_per_host)   — links: next index page (depth
               chain, mirrors the reference's paginated index loops, e.g.
               /root/reference/src/scrapers/tpami_scraper.py:95-111) plus
               ``links_per_page`` detail links in page order (mostly own
               host, some cross-host, some deliberate duplicates, some
               robots-disallowed /private/ paths).
  /detail/{d}  — embeds ``images_per_page`` (image bytes, caption) pairs,
               the two-hop index→detail shape of
               /root/reference/src/scrapers/acl_scraper.py:60-100.
  robots: every host disallows the path prefix /private/.

Payload containers are tiny length-prefixed binary formats (no HTML parser in
the sandbox; the real-web transport would pair an HTML parser with the same
schema).
"""

from __future__ import annotations

import struct
import time
from dataclasses import dataclass, field

import numpy as np

from .canon import canonical_url
from .hashing import xxh64
from .imaging import encode_image, procedural_image

_WORDS = (
    "neural deep learning model transformer attention graph vision language "
    "image caption dataset training inference gradient sparse dense robust "
    "optimal bayesian causal diffusion generative adversarial contrastive "
    "retrieval embedding token pixel scene object detection segmentation "
    "alignment reward policy agent planning reasoning scaling efficient "
    "distributed parallel streaming batch shuffle partition checkpoint"
).split()


@dataclass(frozen=True)
class WebConfig:
    seed: int = 42
    n_hosts: int = 8
    pages_per_host: int = 3
    links_per_page: int = 6
    images_per_page: int = 2
    details_per_host: int = 40
    cross_host_frac: float = 0.2
    dup_frac: float = 0.15
    private_frac: float = 0.05
    dead_frac: float = 0.0  # fraction of detail links pointing at 404 targets
    min_side: int = 16
    max_side: int = 96
    fail_percent: int = 0  # % of URLs whose FIRST fetch per transport fails
    latency_s: float = 0.0  # simulated per-fetch RTT (real-web bench mode)

    def host(self, h: int) -> str:
        return f"host-{h:05d}"

    def seed_urls(self) -> list[str]:
        return [f"synth://{self.host(h)}/index/0" for h in range(self.n_hosts)]


def robots_allowed(url: str) -> bool:
    """The synthetic web's robots policy: every host disallows /private/."""
    from urllib.parse import urlsplit

    return not urlsplit(url).path.startswith("/private/")


# ------------------------------------------------------------------ containers


def _pack_index(links: list[str]) -> bytes:
    body = "\n".join(links).encode("utf-8")
    return b"INDX" + struct.pack("<I", len(links)) + body


def parse_index_payload(data: bytes) -> list[str]:
    assert data[:4] == b"INDX"
    (n,) = struct.unpack_from("<I", data, 4)
    if n == 0:
        return []
    return data[8:].decode("utf-8").split("\n")


def _pack_detail(images: list[tuple[str, str, int, int, bytes]]) -> bytes:
    # each: (caption, fmt, w, h, encoded)
    out = [b"DETL", struct.pack("<I", len(images))]
    for caption, fmt, w, h, enc in images:
        cb = caption.encode("utf-8")
        fb = fmt.encode("ascii")
        out.append(struct.pack("<HBii I", len(cb), len(fb), w, h, len(enc)))
        out.append(cb)
        out.append(fb)
        out.append(enc)
    return b"".join(out)


def parse_detail_payload(data: bytes) -> list[dict]:
    assert data[:4] == b"DETL"
    (n,) = struct.unpack_from("<I", data, 4)
    off = 8
    items = []
    for _ in range(n):
        clen, flen, w, h, elen = struct.unpack_from("<HBii I", data, off)
        off += struct.calcsize("<HBii I")
        caption = data[off : off + clen].decode("utf-8")
        off += clen
        fmt = data[off : off + flen].decode("ascii")
        off += flen
        enc = bytes(data[off : off + elen])
        off += elen
        items.append({"caption": caption, "fmt": fmt, "w": w, "h": h, "bytes": enc})
    return items


# ------------------------------------------------------------------ generation


def _caption_for(key: int) -> str:
    rng = np.random.default_rng(np.uint64(key))
    n = int(rng.integers(5, 13))
    idx = rng.integers(0, len(_WORDS), size=n)
    return " ".join(_WORDS[i] for i in idx)


def detail_images(cfg: WebConfig, host_idx: int, d: int) -> list[dict]:
    """The (caption, pixels, fmt) ground truth for one detail page."""
    url = f"synth://{cfg.host(host_idx)}/detail/{d}"
    out = []
    for i in range(cfg.images_per_page):
        key = xxh64(f"{cfg.seed}:{url}:img:{i}")
        img, fmt, quality = procedural_image(key, cfg.min_side, cfg.max_side)
        caption = _caption_for(key ^ 0x5BD1E995)
        out.append(
            {
                "identity": f"{url}/img/{i}",
                "caption": caption,
                "pixels": img,
                "fmt": fmt,
                "quality": quality,
            }
        )
    return out


def index_links(cfg: WebConfig, host_idx: int, p: int) -> list[str]:
    """Deterministic link list of index page (host_idx, p), in page order."""
    rng = np.random.default_rng(np.uint64(xxh64(f"{cfg.seed}:links:{host_idx}:{p}")))
    links: list[str] = []
    if p + 1 < cfg.pages_per_host:
        links.append(f"synth://{cfg.host(host_idx)}/index/{p + 1}")
    for _ in range(cfg.links_per_page):
        r = rng.random()
        if links and r < cfg.dup_frac:
            links.append(links[int(rng.integers(0, len(links)))])  # duplicate
            continue
        if r < cfg.dup_frac + cfg.cross_host_frac:
            h = int(rng.integers(0, cfg.n_hosts))
        else:
            h = host_idx
        d = int(rng.integers(0, cfg.details_per_host))
        if rng.random() < cfg.private_frac:
            links.append(f"synth://{cfg.host(h)}/private/detail/{d}")
        elif cfg.dead_frac and rng.random() < cfg.dead_frac:
            # permanently-404 target (beyond details_per_host) — exercises the
            # fetch error path end-to-end: seen+logged with status 404, no rows
            links.append(f"synth://{cfg.host(h)}/detail/{cfg.details_per_host + d}")
        else:
            links.append(f"synth://{cfg.host(h)}/detail/{d}")
    return links


def parse_synth_url(url: str) -> tuple[int, str, int]:
    """url → (host_idx, kind, idx); kind ∈ {index, detail, private}."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    host_idx = int(parts.hostname.split("-")[1])
    segs = [s for s in parts.path.split("/") if s]
    if segs[0] == "private":
        return host_idx, "private", int(segs[-1])
    return host_idx, segs[0], int(segs[-1])


class SyntheticTransport:
    """Pluggable transport (the HttpTransport seat is the per-actor
    requests.Session of /root/reference/src/utils/network_utils.py:16-37).

    ``fetch`` returns (status, payload). With ``fail_percent`` set, the first
    fetch of an afflicted URL in this transport instance returns a 503 —
    deterministic per URL, so a retrying fetcher always converges to the same
    payload and retry behavior is exercised in tests.
    """

    def __init__(self, cfg: WebConfig):
        self.cfg = cfg
        self._failed_once: set[int] = set()

    def fetch(self, url: str) -> tuple[int, bytes]:
        cfg = self.cfg
        if cfg.latency_s:
            time.sleep(cfg.latency_s)
        uh = xxh64(canonical_url(url))
        if cfg.fail_percent and uh % 100 < cfg.fail_percent and uh not in self._failed_once:
            self._failed_once.add(uh)
            return 503, b""
        try:
            host_idx, kind, idx = parse_synth_url(url)
        except (ValueError, IndexError):
            return 404, b""
        if host_idx >= cfg.n_hosts:
            return 404, b""
        if kind == "index":
            if idx >= cfg.pages_per_host:
                return 404, b""
            return 200, _pack_index(index_links(cfg, host_idx, idx))
        if kind in ("detail", "private"):
            if idx >= cfg.details_per_host:
                return 404, b""
            items = detail_images(cfg, host_idx, idx)
            packed = [
                (
                    it["caption"],
                    it["fmt"],
                    it["pixels"].shape[1],
                    it["pixels"].shape[0],
                    encode_image(it["pixels"], it["fmt"], it["quality"]),
                )
                for it in items
            ]
            return 200, _pack_detail(packed)
        return 404, b""


def page_kind(url: str) -> str:
    """index|detail classification used by the parser stage."""
    _, kind, _ = parse_synth_url(url)
    return "index" if kind == "index" else "detail"
