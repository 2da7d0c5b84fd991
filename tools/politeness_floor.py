"""Re-derive the politeness floor of the BENCH_WEB crawl (round-5 VERDICT
next-round #8): round 3 claimed a ~10.24 s floor (max ≈ 12.5k urls/s) by
assuming some host serves all ``details_per_host`` = 2048 of its detail
pages; round 4 then measured 15.1k urls/s, exceeding that "ceiling". This
tool computes the floor from the ACTUAL link topology instead of the config
bound: a link-only BFS (no payload generation — index_links + robots, the
oracle's discovery rules) counts fetched URLs per (depth, host); each BFS
depth is one fetch round, and a round cannot finish before the busiest
host's token bucket allows its per-round URL count:

    floor(depth) = max_h  max(0, n[depth, host] - burst) / rate
    floor_total  = sum over depths      (credits refill between rounds is
                                         ignored -> the floor is CONSERVATIVE)

Usage: python tools/politeness_floor.py            # BENCH_WEB config
Prints one JSON line; paste the numbers into BASELINE.md.
"""

import json
import sys
from collections import deque

sys.path.insert(0, ".")

from bench import BENCH_WEB  # noqa: E402
from pubcrawl.canon import canonical_url, host_of  # noqa: E402
from pubcrawl.synthweb import (  # noqa: E402
    WebConfig,
    index_links,
    page_kind,
    parse_synth_url,
    robots_allowed,
)


def main() -> int:
    cfg = WebConfig(**{k: v for k, v in BENCH_WEB.items()
                       if k in WebConfig.__dataclass_fields__})
    rate = 200.0  # bench.run_crawl politeness config
    burst = 16

    seen: set[str] = set()
    frontier = deque()
    for u in cfg.seed_urls():
        cu = canonical_url(u)
        if cu not in seen:
            seen.add(cu)
            frontier.append((cu, 0))

    per_depth_host: dict[tuple[int, str], int] = {}
    per_depth_total: dict[int, int] = {}
    while frontier:
        url, depth = frontier.popleft()
        host = host_of(url)
        per_depth_host[(depth, host)] = per_depth_host.get((depth, host), 0) + 1
        per_depth_total[depth] = per_depth_total.get(depth, 0) + 1
        kind = page_kind(url)
        if kind != "index":
            continue  # detail pages add no links; 404s counted as fetches too
        hi, _, p = parse_synth_url(url)
        for link in index_links(cfg, hi, p):
            cu = canonical_url(link)
            if not robots_allowed(cu) or cu in seen:
                continue
            seen.add(cu)
            frontier.append((cu, depth + 1))

    total = sum(per_depth_total.values())
    floors = {}
    for d in sorted(per_depth_total):
        busiest = max(n for (dd, _), n in per_depth_host.items() if dd == d)
        floors[d] = {
            "fetched": per_depth_total[d],
            "busiest_host": busiest,
            "floor_s": round(max(0, busiest - burst) / rate, 3),
        }
    floor_total = round(sum(f["floor_s"] for f in floors.values()), 3)
    print(json.dumps({
        "config": {"hosts": cfg.n_hosts, "rate_per_host": rate, "burst": burst},
        "total_fetched_urls": total,
        "per_depth": floors,
        "politeness_floor_s": floor_total,
        "max_urls_per_sec_if_floor_bound": (
            round(total / floor_total, 1) if floor_total > 0 else None
        ),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
