"""CLI: ``python -m pubcrawl <command>`` — owns its Ray session (the library
never calls ray.init).

  crawl        run a synthetic-web crawl into a fragment store
  images       show stored image_caption metadata (canonical order)
  checkpoints  show the checkpoint/lineage table of a store
  tasks        run a reference-style task config (collect/analyze modes)
  serve        HTTP search API over a parquet corpus (stdlib JSON server)
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _init_ray(num_cpus: int):
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pubcrawl")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="crawl the deterministic synthetic web")
    c.add_argument("--out", required=True, help="store root directory")
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--hosts", type=int, default=8)
    c.add_argument("--pages-per-host", type=int, default=3)
    c.add_argument("--links-per-page", type=int, default=6)
    c.add_argument("--images-per-page", type=int, default=2)
    c.add_argument("--details-per-host", type=int, default=40)
    c.add_argument("--num-cpus", type=int, default=8)
    c.add_argument("--fetch-concurrency", type=int, default=4)
    c.add_argument("--per-host-rate", type=float, default=200.0)

    i = sub.add_parser("images", help="show stored image metadata")
    i.add_argument("--store", required=True)
    i.add_argument("--limit", type=int, default=10)
    i.add_argument("--num-cpus", type=int, default=4)

    k = sub.add_parser("checkpoints", help="show the checkpoint/lineage table")
    k.add_argument("--store", required=True)

    cp = sub.add_parser("compact", help="compact small committed fragments")
    cp.add_argument("--store", required=True)
    cp.add_argument("--prefix", required=True,
                    help="compact live fragments whose id starts with this")
    cp.add_argument("--min-fragments", type=int, default=2)

    t = sub.add_parser("tasks", help="run a task config (reference OPERATION_MODE flow)")
    t.add_argument("--config", required=True, help="JSON task config file")
    t.add_argument("--out", required=True, help="artifact output directory")
    t.add_argument("--mode", default="collect_and_analyze",
                   choices=["collect", "analyze", "collect_and_analyze"])
    t.add_argument("--num-cpus", type=int, default=8)

    v = sub.add_parser("serve", help="serve the search API over a parquet corpus")
    v.add_argument("--docs", required=True, help="parquet path with id/text columns")
    v.add_argument("--id-col", default="doc_id")
    v.add_argument("--text-col", default="text")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8080)
    v.add_argument("--num-cpus", type=int, default=4)

    args = p.parse_args(argv)

    if args.cmd == "crawl":
        ray = _init_ray(args.num_cpus)
        from pubcrawl.pipeline import crawl
        from pubcrawl.synthweb import WebConfig

        cfg = WebConfig(
            seed=args.seed,
            n_hosts=args.hosts,
            pages_per_host=args.pages_per_host,
            links_per_page=args.links_per_page,
            images_per_page=args.images_per_page,
            details_per_host=args.details_per_host,
        )
        rep = crawl(
            cfg,
            args.out,
            fetch_concurrency=args.fetch_concurrency,
            per_host_rate=args.per_host_rate,
        )
        print(
            json.dumps(
                {
                    "seen": rep.seen,
                    "fetched": rep.fetched,
                    "images": rep.images,
                    "errors": rep.errors,
                    "rounds": rep.rounds,
                    "store": args.out,
                }
            )
        )
        ray.shutdown()
    elif args.cmd == "images":
        ray = _init_ray(args.num_cpus)
        from pubcrawl.pipeline import load_images

        df = (
            load_images(args.store, canonical_order=True)
            .limit(args.limit)
            .to_pandas()
            .drop(columns=["bytes"])
        )
        print(df.to_string(index=False))
        ray.shutdown()
    elif args.cmd == "checkpoints":
        # manifest-only: no Ray session needed
        from pubcrawl.store import ParquetFragmentStore, checkpoint_table

        tbl = checkpoint_table(ParquetFragmentStore(args.store))
        print(tbl.to_pandas().to_string(index=False, max_colwidth=30))
    elif args.cmd == "compact":
        # manifest + parquet only: no Ray session needed
        from pubcrawl.store import ParquetFragmentStore, compact

        store = ParquetFragmentStore(args.store)
        # prior compact_* outputs ARE candidates — otherwise repeated
        # compaction accumulates compact_vNNNNNN fragments forever instead of
        # converging; the version-suffixed new_pid prevents self-collision
        live = [p for p in sorted(store.committed()) if p.startswith(args.prefix)]
        if len(live) < args.min_fragments:
            print(json.dumps({"compacted": 0, "reason": "below min-fragments",
                              "live": len(live)}))
            return 0
        new_pid = f"{args.prefix}compact_v{store.version():06d}"
        rec = compact(store, live, new_pid)
        print(json.dumps({"compacted": len(live), "into": new_pid,
                          "rows": rec["rows"], "version": store.version()}))
    elif args.cmd == "tasks":
        ray = _init_ray(args.num_cpus)
        from pubcrawl.fetch import HttpTransport
        from pubcrawl.runner import run_pipeline

        with open(args.config) as f:
            config = json.load(f)
        res = run_pipeline(config, HttpTransport, args.out, mode=args.mode)
        print(json.dumps(res))
        ray.shutdown()
    elif args.cmd == "serve":
        # reference counterpart: the FastAPI/uvicorn server entrypoint
        # (/root/reference/src/api/main.py) — stdlib server here, same routes
        ray = _init_ray(args.num_cpus)
        import ray.data as rd

        from pubcrawl import api
        from pubcrawl.service import SearchSession

        docs = rd.read_parquet(args.docs)
        session = SearchSession(docs, id_col=args.id_col, text_col=args.text_col)
        srv = api.make_server(session, host=args.host, port=args.port)
        print(json.dumps({"serving": f"http://{args.host}:{srv.server_address[1]}",
                          "routes": sorted(f"{m} {p}" for m, p in api.Routes.TABLE)}),
              flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.shutdown()
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
