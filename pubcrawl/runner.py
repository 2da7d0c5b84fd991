"""Task runner — the reference's collect pipeline
(/root/reference/src/crawlers/run_crawler.py:110-196) as a Ray Data flow:

  TaskSpec (sources.build_task_specs) →
    seed fetch (index page / API payload) →
    parse (PARSER_REGISTRY adapter) →
    [two-hop sources] detail-URL extraction → parallel detail fetch+parse →
    M1 regex filter → M2 year/conference enrichment →
    K1 CSV + K2 markdown + K3 summary sinks.

The transport is pluggable (HttpTransport for the real web, or any object
with ``fetch(url) -> (status, bytes)``); tests drive the full chain against a
local HTTP server serving fixture pages. Unlike the reference's sequential
task loop, detail fetches fan out over a Ray Data task pool and tasks
themselves are independent Datasets.
"""

from __future__ import annotations

import os
from dataclasses import asdict

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from . import analysis, relops, sources
from .sources import TaskSpec


def _fetch_one(transport_factory, url: str) -> tuple[int, bytes]:
    transport = transport_factory()
    return transport.fetch(url)


def fetch_reviews_stage(
    rows: list[dict],
    transport_factory,
    review_url_template: str,
    *,
    review_delay_s: float = 0.0,
    batch_size: int = 8,
) -> list[dict]:
    """S2 review fan-out (the reference's per-forum second hop with its own
    rate limit, /root/reference/src/scrapers/iclr_scraper.py:60-105): for
    each paper id, fetch ``review_url_template.format(id=...)`` on a Ray
    task pool, parse decision/ratings with ``parse_review_ratings``, and
    merge the columns back in row order. ``review_delay_s`` reproduces the
    reference's per-request sleep inside each task."""
    if not rows:
        return rows
    import json as _json
    import time as _time

    seeds = rd.from_items([{"__i": i, "id": r["id"]} for i, r in enumerate(rows)])

    def fetch_parse(df: pd.DataFrame) -> pd.DataFrame:
        transport = transport_factory()  # session per task (A4 semantics)
        out = []
        for i, pid in zip(df["__i"], df["id"]):
            if review_delay_s:
                _time.sleep(review_delay_s)
            st, payload = transport.fetch(review_url_template.format(id=pid))
            if st == 200 and payload:
                notes = _json.loads(payload)
                notes = notes.get("notes", notes if isinstance(notes, list) else [])
                det = sources.parse_review_ratings(notes)
            else:
                det = {"decision": "N/A", "review_ratings": [], "avg_rating": None}
            out.append({"__i": i, **det})
        return pd.DataFrame(out)

    got = seeds.map_batches(fetch_parse, batch_format="pandas", batch_size=batch_size).to_pandas()
    by_i = {int(r["__i"]): r for _, r in got.iterrows()}
    merged = []
    for i, row in enumerate(rows):
        det = by_i.get(i)
        if det is not None:
            avg = det["avg_rating"]
            extra = {
                "decision": det["decision"],
                "review_ratings": list(det["review_ratings"]),
                "avg_rating": None if pd.isna(avg) else float(avg),
            }
        else:
            extra = {"decision": "N/A", "review_ratings": [], "avg_rating": None}
        merged.append({**row, **extra})
    return merged


def run_task(
    spec: TaskSpec,
    transport_factory,
    *,
    detail_parser=None,
    index_link_pattern: str | None = None,
    index_link_exclude: str | None = None,
    out_dir: str | None = None,
    review_url_template: str = "https://api2.openreview.net/notes?forum={id}",
    review_delay_s: float = 0.0,
) -> pd.DataFrame:
    """Execute one task end-to-end; returns the enriched paper table
    (and writes the K1-K3 artifacts when ``out_dir`` is set)."""
    status, payload = _fetch_one(transport_factory, spec.url)
    if status != 200:
        raise RuntimeError(f"index fetch failed for {spec.url}: HTTP {status}")

    if spec.source_type in ("arxiv_atom", "openreview", "ieee_toc", "pmlr_index"):
        parser = sources.PARSER_REGISTRY[spec.source_type]
        if spec.source_type == "pmlr_index":
            rows = parser(payload, spec.url, limit=spec.max_papers)
        elif spec.source_type == "ieee_toc":
            rows, _ = parser(payload)
        else:
            rows = parser(payload)
            if spec.max_papers:
                rows = rows[: spec.max_papers]
        if spec.source_type == "openreview" and spec.fetch_reviews:
            rows = fetch_reviews_stage(
                rows, transport_factory, review_url_template,
                review_delay_s=review_delay_s,
            )
    elif spec.source_type == "html_index":
        # two-hop: index → detail URLs (discovery order) → parallel fetch+parse
        links = sources.extract_links(
            payload, spec.url, index_link_pattern or r".",
            exclude=index_link_exclude, limit=spec.max_papers,
        )
        parser = detail_parser or sources.parse_acl_detail
        seeds = rd.from_items([{"url": u, "seq": i} for i, u in enumerate(links)])

        def fetch_parse(df: pd.DataFrame) -> pd.DataFrame:
            transport = transport_factory()  # session per task (A4 semantics)
            out = []
            for u, s in zip(df["url"], df["seq"]):
                st, pl = transport.fetch(u)
                if st != 200:
                    continue
                row = parser(pl, u)
                if row:
                    row["seq"] = s
                    out.append(row)
            return pd.DataFrame(out) if out else pd.DataFrame(
                columns=["id", "title", "authors", "abstract", "pdf_url", "source_url", "seq"]
            )

        fetched = seeds.map_batches(
            fetch_parse, batch_format="pandas", batch_size=8,
        ).to_pandas()
        rows = (
            fetched.sort_values("seq").drop(columns=["seq"]).to_dict("records")
            if len(fetched)
            else []
        )
    else:
        raise ValueError(f"unknown source_type {spec.source_type}")

    df = pd.DataFrame(rows)
    if df.empty:
        return df

    # M1 filter + M2 enrichment on a Dataset (run_crawler.py:140-145 semantics)
    ds = rd.from_pandas(df)
    if spec.filters:
        pattern = "|".join(spec.filters)

        def keep(pdf: pd.DataFrame) -> pd.DataFrame:
            hay = (pdf["title"].fillna("") + " " + pdf["abstract"].fillna(""))
            return pdf[hay.str.contains(pattern, case=False, regex=True)]

        ds = ds.map_batches(keep, batch_format="pandas", batch_size=None)
    enriched = ds.map_batches(
        lambda pdf: pdf.assign(year=spec.year, conference=spec.conference),
        batch_format="pandas",
        batch_size=None,
    )
    out = enriched.to_pandas()

    if out_dir and len(out):
        base = os.path.join(out_dir, spec.conference, str(spec.year))
        analysis.save_csv(out, os.path.join(base, f"{spec.conference}_{spec.year}_data.csv"))
        analysis.save_markdown(
            out, os.path.join(base, "report.md"), f"{spec.conference} {spec.year}"
        )
        analysis.save_summary_txt(
            out, os.path.join(base, "summary.txt"), ("title", "authors", "source_url")
        )
    return out


def download_pdfs_stage(
    rows: pd.DataFrame, transport_factory, pdf_dir: str, batch_size: int = 8
) -> dict:
    """K4/D3 — the reference's PDF sink
    (/root/reference/src/utils/downloader.py:11-40): per-paper pdf_url fetch
    to ``<sanitized-title>.pdf``, SKIP-IF-EXISTS, failed fetches cleaned up.
    Fan-out is a Ray Data task pool; the skip test runs inside the task so a
    resumed run re-downloads nothing."""
    os.makedirs(pdf_dir, exist_ok=True)
    if rows.empty or "pdf_url" not in rows.columns:
        return {"downloaded": 0, "skipped": 0, "failed": 0}
    seeds = rd.from_pandas(rows[["pdf_url", "title"]].reset_index(drop=True))

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        transport = transport_factory()
        out = []
        for url, title in zip(df["pdf_url"], df["title"]):
            if not url or pd.isna(url):
                out.append("failed")
                continue
            path = os.path.join(
                pdf_dir, analysis.sanitize_filename(str(title or "untitled")) + ".pdf"
            )
            if os.path.exists(path):
                out.append("skipped")
                continue
            st, payload = transport.fetch(url)
            if st == 200 and payload:
                tmp = path + ".part"
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, path)
                out.append("downloaded")
            else:
                out.append("failed")
        return pd.DataFrame({"status": out})

    got = seeds.map_batches(fetch, batch_format="pandas", batch_size=batch_size).to_pandas()
    counts = got["status"].value_counts().to_dict()
    return {k: int(counts.get(k, 0)) for k in ("downloaded", "skipped", "failed")}


def run_tasks(config: dict, transport_factory, out_dir: str | None = None, **kw) -> dict:
    """The reference's multi-task driver loop (sequential per task — each task
    is itself a parallel Dataset flow); returns {task label: row count}."""
    results = {}
    for spec in sources.build_task_specs(config):
        df = run_task(spec, transport_factory, out_dir=out_dir, **kw)
        if spec.download_pdfs and out_dir and len(df):
            download_pdfs_stage(
                df, transport_factory,
                os.path.join(out_dir, spec.conference, str(spec.year), "pdfs"),
            )
        results[f"{spec.conference}_{spec.year}"] = len(df)
    return results


def run_pipeline(
    config: dict,
    transport_factory,
    out_dir: str,
    mode: str = "collect_and_analyze",
    taxonomy: dict | None = None,
    **kw,
) -> dict:
    """The reference's OPERATION_MODE switch
    (/root/reference/src/crawlers/run_crawler.py:32,233-253):

    - ``collect``: run every enabled task, per-task K1-K3 artifacts;
    - ``analyze``: reload previously-collected per-task CSVs and run the
      cross-year trend analysis per conference;
    - ``collect_and_analyze``: both phases over the fresh collection.

    Cross-year analysis = classify against the taxonomy → per-topic stats
    with year as the category axis → markdown report per conference
    (trends.py:167-190 flow, distributed via analysis.classify_topics).
    """
    if mode not in ("collect", "analyze", "collect_and_analyze"):
        raise ValueError(f"unknown mode {mode}")
    out: dict = {"mode": mode}
    frames: list[pd.DataFrame] = []
    if mode in ("collect", "collect_and_analyze"):
        out["collected"] = {}
        for spec in sources.build_task_specs(config):
            df = run_task(spec, transport_factory, out_dir=out_dir, **kw)
            if spec.download_pdfs and len(df):
                download_pdfs_stage(
                    df, transport_factory,
                    os.path.join(out_dir, spec.conference, str(spec.year), "pdfs"),
                )
            out["collected"][f"{spec.conference}_{spec.year}"] = len(df)
            if len(df):
                frames.append(df)
    if mode == "analyze":
        # reload phase (run_crawler.py:199-220): every per-task CSV under out_dir
        import glob

        for path in sorted(glob.glob(os.path.join(out_dir, "*", "*", "*_data.csv"))):
            frames.append(pd.read_csv(path, encoding="utf-8-sig"))
    if mode in ("analyze", "collect_and_analyze") and frames:
        all_df = pd.concat(frames, ignore_index=True)
        taxonomy = taxonomy or {}
        out["analyzed"] = {}
        for conf, g in all_df.groupby("conference"):
            base = os.path.join(out_dir, "analysis", str(conf))
            if taxonomy:
                ds = rd.from_pandas(g.reset_index(drop=True))
                classified = analysis.classify_topics(ds, ["title", "abstract"], taxonomy)
                stats = analysis.topic_stats(
                    classified, "topics", metric_col=None, category_col="year"
                )
                analysis.save_csv(stats, os.path.join(base, "topic_trends.csv"))
            analysis.save_markdown(
                g, os.path.join(base, "report.md"), f"{conf} cross-year report"
            )
            out["analyzed"][str(conf)] = len(g)
    return out
