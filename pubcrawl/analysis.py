"""Analysis + report sinks — the reference's trends/analyzer/formatter flows
(G1-G7, K1-K3, K8's word-frequency core) as library functions over Datasets.

Reference parity:
- ``classify_topics`` — multi-label keyword taxonomy classifier
  (/root/reference/src/analysis/trends.py:28-40, configs/trends.yaml tree).
- ``topic_stats`` — per-topic count / mean-metric / per-category pivot /
  acceptance-rate-style derived ratio (trends.py:43-70): ONE grouped
  aggregate in columnar form instead of the reference's three merges (J4).
- ``year_topic_pivot`` — cross-year share table (trends.py:150-154).
- ``word_frequencies`` — the wordcloud input (analyzer.py:62-68).
- ``save_csv`` / ``save_markdown`` / ``save_summary_txt`` — the K1-K3 export
  shims (formatter.py:8-112 semantics: utf-8-sig CSV, fixed leading column
  order, list columns joined with ", ").
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from . import relops

LEAD_COLS = ["title", "authors", "abstract", "pdf_url", "keywords", "source_url"]


def classify_topics(
    ds: rd.Dataset, text_cols: list[str], taxonomy: dict[str, list[str]],
    out_col: str = "topics",
) -> rd.Dataset:
    """Multi-label word-boundary keyword classifier → list<string> column."""
    patterns = {
        t: re.compile(r"\b(" + "|".join(map(re.escape, kws)) + r")\b", re.I)
        for t, kws in taxonomy.items()
    }

    def fn(batch: pa.Table) -> pa.Table:
        texts = [
            " ".join(str(batch[c][i].as_py() or "") for c in text_cols)
            for i in range(batch.num_rows)
        ]
        topics = [[t for t, rx in patterns.items() if rx.search(x)] for x in texts]
        return batch.append_column(out_col, pa.array(topics, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow")


def topic_stats(
    ds: rd.Dataset,
    topic_list_col: str,
    metric_col: str | None = None,
    category_col: str | None = None,
    accept_categories: tuple[str, ...] = (),
    reject_category: str | None = None,
) -> pd.DataFrame:
    """Per-topic aggregate: paper_count, avg metric, per-category counts and
    acceptance_rate — the reference's J4 merge chain as one grouped pass."""
    exploded = relops.explode_list(ds, topic_list_col, "topic")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = {"paper_count": ("topic", "size")}
        if metric_col:
            df = df.assign(
                __msum=df[metric_col].fillna(0.0),
                __mcnt=(~df[metric_col].isna()).astype(int),
            )
            agg["__msum"] = ("__msum", "sum")
            agg["__mcnt"] = ("__mcnt", "sum")
        out = df.groupby("topic", as_index=False).agg(**agg)
        if category_col:
            pv = (
                df.groupby(["topic", category_col]).size().unstack(fill_value=0)
            )
            pv.columns = [f"cat_{c}" for c in pv.columns]
            out = out.merge(pv.reset_index(), on="topic", how="left")
        return out

    partials = exploded.map_batches(partial, batch_format="pandas").to_pandas()
    num_cols = [c for c in partials.columns if c != "topic"]
    stats = partials.groupby("topic", as_index=False)[num_cols].sum()
    if metric_col:
        stats["avg_metric"] = np.round(
            stats["__msum"] / stats["__mcnt"].replace(0, np.nan), 2
        )
        stats = stats.drop(columns=["__msum", "__mcnt"])
    if accept_categories and reject_category:
        acc = sum(
            stats.get(f"cat_{c}", pd.Series(0, index=stats.index)) for c in accept_categories
        )
        rej = stats.get(f"cat_{reject_category}", pd.Series(0, index=stats.index))
        denom = (acc + rej).replace(0, np.nan)
        stats["acceptance_rate"] = np.round(100.0 * acc / denom, 1)
    return stats.sort_values("paper_count", ascending=False).reset_index(drop=True)


def year_topic_pivot(ds: rd.Dataset, year_col: str, topic_list_col: str, top_n: int = 12) -> pd.DataFrame:
    """Row-normalised year×topic share table (G5)."""
    exploded = relops.explode_list(ds, topic_list_col, "topic")
    counts = relops.preagg_group_sum(exploded, [year_col, "topic"], count_as="n").to_pandas()
    pivot = counts.pivot_table(index=year_col, columns="topic", values="n", fill_value=0)
    keep = pivot.sum().nlargest(top_n).index
    pivot = pivot[keep]
    return (pivot.div(pivot.sum(axis=1), axis=0) * 100).round(2)


def word_frequencies(
    ds: rd.Dataset, text_cols: list[str], stopwords: frozenset[str], top_n: int = 200
) -> pd.DataFrame:
    """The wordcloud input table (K8's data step): explode tokens → count →
    top-n, combiner-style."""
    def concat_cols(batch: pa.Table) -> pa.Table:
        texts = [
            " ".join(str(batch[c][i].as_py() or "") for c in text_cols)
            for i in range(batch.num_rows)
        ]
        return pa.table({"text": pa.array(texts, pa.string())})

    txt = ds.map_batches(concat_cols, batch_format="pyarrow")
    words = relops.tokenize_column(txt, "text", stopwords)
    counts = relops.preagg_group_sum(words, ["word"], count_as="n")
    return relops.topk(counts, [("n", True), ("word", False)], top_n).to_pandas()


# ---------------------------------------------------------------- K1-K3 sinks


def save_csv(df: pd.DataFrame, path: str) -> str:
    """K1 semantics (formatter.py:88-112): list columns joined ', ',
    LEAD_COLS first, utf-8-sig encoding."""
    df = df.copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: ", ".join(map(str, v)) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    ordered = [c for c in LEAD_COLS if c in df.columns]
    ordered += [c for c in df.columns if c not in ordered]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df[ordered].to_csv(path, index=False, encoding="utf-8-sig")
    return path


def save_markdown(df: pd.DataFrame, path: str, title: str, title_col: str = "title",
                  body_cols: tuple[str, ...] = ()) -> str:
    """K2: per-record markdown report."""
    lines = [f"# {title}", "", f"_generated {datetime.now(timezone.utc).isoformat()}_",
             f"_records: {len(df)}_", ""]
    for i, row in enumerate(df.itertuples(index=False), 1):
        d = row._asdict()
        lines.append(f"## {i}. {d.get(title_col, '(untitled)')}")
        for c in body_cols or [c for c in df.columns if c != title_col]:
            lines.append(f"- **{c}**: {d.get(c, '')}")
        lines.append("")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path


def save_summary_txt(df: pd.DataFrame, path: str, cols: tuple[str, ...]) -> str:
    """K3: flat text digest."""
    lines = [f"TOTAL: {len(df)}", "=" * 40]
    for row in df.itertuples(index=False):
        d = row._asdict()
        lines.extend(f"{c}: {d.get(c, '')}" for c in cols)
        lines.append("-" * 40)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path
