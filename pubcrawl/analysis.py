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


def _xml(s_: object) -> str:
    """Escape text interpolated into SVG/XML (labels can hold & < >)."""
    from xml.sax.saxutils import escape

    return escape(str(s_))


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


# ------------------------------------------------ K4/K5/K8/K9/K10/M10/M15 utils

_SANITIZE = re.compile(r'[\\/*?:"<>|]')


def sanitize_filename(name: str, max_len: int = 150) -> str:
    """M10 (/root/reference/src/utils/downloader.py:23-24): strip filesystem-
    hostile characters, truncate."""
    return _SANITIZE.sub("", name).strip()[:max_len]


def format_for_prompt(df: pd.DataFrame, k: int = 5, cols: tuple[str, ...] = ("title", "abstract")) -> str:
    """M15 (/root/reference/src/search/search_service.py:225-233): top-k rows
    → LLM context block."""
    parts = []
    for i, row in enumerate(df.head(k).itertuples(index=False), 1):
        d = row._asdict()
        parts.append(f"[{i}] " + " | ".join(f"{c}: {d.get(c, '')}" for c in cols if c in d))
    return "\n".join(parts)


def export_bundle(df: pd.DataFrame, out_zip: str, payload_col: str | None = None,
                  name_col: str = "image_id", summary_cols: tuple[str, ...] = ()) -> str:
    """K5 (/root/reference/src/crawlers/processor.py:108-141): one zip with a
    summary.txt plus each row's binary payload under a sanitized name."""
    import io
    import zipfile

    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        lines = [f"TOTAL: {len(df)}"]
        for row in df.itertuples(index=False):
            d = row._asdict()
            lines.append(" | ".join(f"{c}={d.get(c, '')}" for c in (summary_cols or d.keys())
                                    if c != payload_col))
            if payload_col and d.get(payload_col) is not None:
                zf.writestr(f"payload/{sanitize_filename(str(d[name_col]))}.bin",
                            bytes(d[payload_col]))
        zf.writestr("summary.txt", "\n".join(lines))
    return out_zip


def save_barh_svg(df: pd.DataFrame, label_col: str, value_col: str, path: str,
                  title: str = "", top_n: int = 40, width: int = 900) -> str:
    """K9 (/root/reference/src/analysis/trends.py:73-164): ranking chart —
    rendered as a dependency-free SVG (no matplotlib in this sandbox; the
    aggregate table itself comes from the Dataset pipelines)."""
    rows = df.nlargest(top_n, value_col) if len(df) > top_n else df.sort_values(
        value_col, ascending=False)
    vmax = float(rows[value_col].max() or 1)
    bar_h, pad = 18, 4
    height = 40 + len(rows) * (bar_h + pad)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<text x="10" y="20" font-size="16" font-family="sans-serif">{_xml(title)}</text>',
    ]
    for i, row in enumerate(rows.itertuples(index=False)):
        d = row._asdict()
        y = 40 + i * (bar_h + pad)
        w = int((width - 320) * float(d[value_col]) / vmax)
        parts.append(
            f'<text x="10" y="{y + 13}" font-size="11" font-family="sans-serif">{_xml(d[label_col])}</text>'
            f'<rect x="300" y="{y}" width="{max(w,1)}" height="{bar_h}" fill="#4477aa"/>'
            f'<text x="{305 + w}" y="{y + 13}" font-size="11" font-family="sans-serif">{_xml(d[value_col])}</text>'
        )
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


def save_wordcloud_svg(freqs: pd.DataFrame, path: str, word_col: str = "word",
                       n_col: str = "n", top_n: int = 60, width: int = 1200,
                       height: int = 600) -> str:
    """K8 (/root/reference/src/analysis/analyzer.py:47-78): frequency cloud —
    deterministic grid-layout SVG stand-in for the WordCloud PNG."""
    rows = freqs.nlargest(top_n, n_col)
    nmax = float(rows[n_col].max() or 1)
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">']
    cols = 6
    cw, ch = width // cols, height // ((top_n + cols - 1) // cols)
    for i, row in enumerate(rows.itertuples(index=False)):
        d = row._asdict()
        size = 10 + int(26 * float(d[n_col]) / nmax)
        x = (i % cols) * cw + 10
        y = (i // cols) * ch + ch // 2
        parts.append(
            f'<text x="{x}" y="{y}" font-size="{size}" font-family="sans-serif">{_xml(d[word_col])}</text>'
        )
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


def save_stacked_barh_svg(pivot: pd.DataFrame, path: str, title: str = "",
                          width: int = 900) -> str:
    """K9 stacked-barh fallback (trends.py:101-125 semantics: row-normalised
    category shares per topic) — dependency-free SVG."""
    colors = ["#4477aa", "#ee6677", "#228833", "#ccbb44", "#66ccee", "#aa3377"]
    norm = pivot.div(pivot.sum(axis=1).replace(0, np.nan), axis=0).fillna(0)
    bar_h, pad = 18, 4
    height = 60 + len(norm) * (bar_h + pad)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<text x="10" y="20" font-size="16" font-family="sans-serif">{_xml(title)}</text>',
    ]
    for j, col in enumerate(norm.columns):  # legend
        parts.append(
            f'<rect x="{10 + j * 130}" y="30" width="12" height="12" fill="{colors[j % len(colors)]}"/>'
            f'<text x="{26 + j * 130}" y="40" font-size="11" font-family="sans-serif">{_xml(col)}</text>'
        )
    for i, (label, row) in enumerate(norm.iterrows()):
        y = 60 + i * (bar_h + pad)
        parts.append(
            f'<text x="10" y="{y + 13}" font-size="11" font-family="sans-serif">{_xml(label)}</text>'
        )
        x = 300.0
        for j, col in enumerate(norm.columns):
            w = (width - 320) * float(row[col])
            if w > 0:
                parts.append(
                    f'<rect x="{x:.1f}" y="{y}" width="{max(w, 0.5):.1f}" '
                    f'height="{bar_h}" fill="{colors[j % len(colors)]}"/>'
                )
            x += w
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


def save_stackplot_svg(pivot: pd.DataFrame, path: str, title: str = "",
                       width: int = 900, height: int = 420) -> str:
    """K9 stackplot fallback (trends.py:150-164: year×topic share area chart)
    — cumulative-sum polygons, dependency-free SVG."""
    colors = ["#4477aa", "#ee6677", "#228833", "#ccbb44", "#66ccee", "#aa3377"]
    vals = pivot.to_numpy(dtype=float)
    cum = np.concatenate([np.zeros((len(vals), 1)), np.cumsum(vals, axis=1)], axis=1)
    vmax = float(cum[:, -1].max() or 1.0)
    x0, y0, w, h = 60, 40, width - 80, height - 80
    n = len(pivot)
    xs = [x0 + w * i / max(n - 1, 1) for i in range(n)]
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<text x="10" y="20" font-size="16" font-family="sans-serif">{_xml(title)}</text>',
    ]
    for j, col in enumerate(pivot.columns):
        lo = [y0 + h * (1 - cum[i, j] / vmax) for i in range(n)]
        hi = [y0 + h * (1 - cum[i, j + 1] / vmax) for i in range(n)]
        pts = [f"{x:.1f},{y:.1f}" for x, y in zip(xs, hi)]
        pts += [f"{x:.1f},{y:.1f}" for x, y in zip(reversed(xs), reversed(lo))]
        parts.append(
            f'<polygon points="{" ".join(pts)}" fill="{colors[j % len(colors)]}" '
            f'fill-opacity="0.85"><title>{_xml(col)}</title></polygon>'
        )
    for i, label in enumerate(pivot.index):  # x ticks
        parts.append(
            f'<text x="{xs[i]:.0f}" y="{height - 12}" font-size="11" '
            f'font-family="sans-serif" text-anchor="middle">{_xml(label)}</text>'
        )
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


def _matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def save_barh(df: pd.DataFrame, label_col: str, value_col: str, path: str,
              title: str = "", top_n: int = 40) -> str:
    """K9 ranking chart with the REAL backend when available
    (/root/reference/src/analysis/trends.py:73-92: seaborn/matplotlib barh,
    height min(30, max(10, n*0.4))); falls back to the dependency-free SVG
    (path swaps to .svg) when matplotlib is absent (this sandbox)."""
    plt = _matplotlib()
    if plt is None:
        return save_barh_svg(df, label_col, value_col,
                             os.path.splitext(path)[0] + ".svg", title, top_n)
    rows = df.dropna(subset=[value_col]).sort_values(value_col, ascending=False).head(top_n)
    height = min(30, max(10, len(rows) * 0.4))
    plt.figure(figsize=(16, height))
    plt.barh(rows[label_col][::-1], rows[value_col][::-1])
    plt.title(title, fontsize=22, pad=20)
    plt.xlabel(value_col.replace("_", " ").title(), fontsize=16)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return path


def save_stacked_barh(pivot: pd.DataFrame, path: str, title: str = "") -> str:
    """K9 decision-breakdown chart, real backend when available
    (trends.py:96-125: row-normalised stacked barh); SVG fallback otherwise."""
    plt = _matplotlib()
    if plt is None:
        return save_stacked_barh_svg(pivot, os.path.splitext(path)[0] + ".svg", title)
    norm = pivot.div(pivot.sum(axis=1).replace(0, np.nan), axis=0).fillna(0)
    height = min(30, max(12, len(norm) * 0.5))
    norm.plot(kind="barh", stacked=True, colormap="viridis", width=0.85,
              figsize=(20, height))
    plt.title(title, fontsize=24, pad=40)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return path


def save_stackplot(pivot: pd.DataFrame, path: str, title: str = "") -> str:
    """K9 year×topic share area chart, real backend when available
    (trends.py:150-164); SVG fallback otherwise."""
    plt = _matplotlib()
    if plt is None:
        return save_stackplot_svg(pivot, os.path.splitext(path)[0] + ".svg", title)
    plt.figure(figsize=(16, 9))
    plt.stackplot(pivot.index, *[pivot[c] for c in pivot.columns], labels=list(pivot.columns))
    plt.legend(loc="upper left", ncol=3)
    plt.title(title, fontsize=20)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return path


def save_wordcloud(freqs: pd.DataFrame, path: str, word_col: str = "word",
                   n_col: str = "n", width: int = 1200, height: int = 600) -> str:
    """K8 with the REAL backend when available
    (/root/reference/src/analysis/analyzer.py:47-78: WordCloud 1200×600 PNG
    from a frequency dict); the deterministic SVG stand-in otherwise
    (path swaps to .svg)."""
    try:
        from wordcloud import WordCloud  # type: ignore
    except ImportError:
        return save_wordcloud_svg(freqs, os.path.splitext(path)[0] + ".svg",
                                  word_col, n_col)
    wc = WordCloud(width=width, height=height, background_color="white")
    wc.generate_from_frequencies(dict(zip(freqs[word_col], freqs[n_col])))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    wc.to_file(path)
    return path


def save_summary_table(df: pd.DataFrame, path_base: str, title: str = "",
                       bar_cols: tuple[str, ...] = (), pct_cols: tuple[str, ...] = ()) -> tuple[str, str]:
    """K9's CSV + styled-HTML summary pair
    (/root/reference/src/analysis/trends.py:127-148: utf-8-sig CSV and a
    pandas Styler HTML with in-cell bars). The CSS-gradient ``.bar`` styling
    needs no plotting backend; the colormap ``background_gradient`` (which
    requires matplotlib) is applied only when available."""
    os.makedirs(os.path.dirname(path_base) or ".", exist_ok=True)
    csv_path, html_path = f"{path_base}.csv", f"{path_base}.html"
    df.to_csv(csv_path, index=False, encoding="utf-8-sig")
    styler = df.style.set_caption(title)
    for c in bar_cols:
        if c in df.columns:
            styler = styler.bar(subset=[c], color="#6495ED")
    if pct_cols:
        styler = styler.format({c: "{:.2%}" for c in pct_cols if c in df.columns})
    if _matplotlib() is not None and pct_cols:
        styler = styler.background_gradient(
            subset=[c for c in pct_cols if c in df.columns], cmap="summer_r"
        )
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(styler.to_html())
    return csv_path, html_path


def save_search_results(df: pd.DataFrame, out_dir: str, query: str) -> str:
    """K10 (/root/reference/src/search/search_service.py:236-256): timestamped
    session markdown of search hits."""
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    path = os.path.join(out_dir, f"search_{stamp}.md")
    return save_markdown(df, path, f"Search results for: {query}")
