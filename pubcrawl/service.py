"""Serving layer — the reference's search/filter/paginate/session flows as a
library-level service (no web framework in this sandbox; these functions are
exactly what the reference's FastAPI routes and Streamlit session call).

Reference semantics being matched:
- query dispatch (/root/reference/src/api/main.py:90-110): a ``sem:`` prefix
  routes to semantic search, anything else to keyword search;
- stats summary (/root/reference/src/search/search_service.py:213-222):
  total_found + "CONF YEAR" → count distribution, most-common order;
- session flows (/root/reference/streamlit_app.py:68-245): cached results,
  conference/year filters applied client-side to the CURRENT result set,
  page clamped into [1, total_pages], new search resets filters + page.

The heavy lifting stays in the engine (search.keyword_search /
search.semantic_search run distributed over Datasets); the session only
holds the CURRENT RESULT PAGE-SET (top-k/filtered hits — driver-small by
construction, like the reference's).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Any

import numpy as np
import pandas as pd
import ray.data as rd

from . import search as searchmod


def stats_summary(results: pd.DataFrame) -> dict[str, Any]:
    """total_found + 'CONF YEAR' distribution in most-common order
    (search_service.py:213-222)."""
    if results is None or len(results) == 0:
        return {"total_found": 0, "distribution": {}}
    confs = results["conference"] if "conference" in results else ["N/A"] * len(results)
    years = results["year"] if "year" in results else ["N/A"] * len(results)
    counter = Counter(zip(confs, years))
    return {
        "total_found": int(len(results)),
        "distribution": {f"{c} {y}": n for (c, y), n in counter.most_common()},
    }


def paginate(results: pd.DataFrame, page: int, per_page: int = 10) -> tuple[pd.DataFrame, dict]:
    """Page slice + page info, with the reference's clamping (page forced
    into [1, total_pages]; total_pages 0 → empty page 1)."""
    total = len(results)
    total_pages = math.ceil(total / per_page) if total else 0
    page = max(1, min(page, total_pages) if total_pages else 1)
    lo = (page - 1) * per_page
    return results.iloc[lo : lo + per_page].reset_index(drop=True), {
        "page": page,
        "total_pages": total_pages,
        "total_items": total,
        "per_page": per_page,
    }


class SearchSession:
    """The Streamlit/FastAPI session flows over the Ray-Data engine.

    Holds dataset handles (lazy — searches execute distributed per call) and
    the current result set; ``search`` dispatches on the ``sem:`` prefix,
    ``set_filters`` applies conference/year filters to the CURRENT results,
    ``page`` returns the clamped page. A new search resets filters and page,
    mirroring streamlit_app.py:190-214.
    """

    def __init__(
        self,
        docs: rd.Dataset,
        vectors: rd.Dataset | None = None,
        embedder=None,
        id_col: str = "doc_id",
        text_col: str = "text",
        meta_cols: list[str] | None = None,
    ):
        self.docs = docs
        self.vectors = vectors
        self.embedder = embedder
        self.id_col = id_col
        self.text_col = text_col
        self.meta_cols = meta_cols
        self.results: pd.DataFrame = pd.DataFrame()
        self.filtered: pd.DataFrame = pd.DataFrame()
        self.query: str = ""
        self.current_page: int = 1

    # ---------------------------------------------------------------- search

    def search(self, query: str, top_n: int = 20, stem: bool = False) -> dict[str, Any]:
        q = query.strip()
        if q.lower().startswith("sem:"):
            actual = q[4:].strip()
            if not actual:
                raise ValueError("semantic query is empty")
            if self.vectors is None or self.embedder is None:
                raise ValueError("semantic search needs vectors + embedder")
            qv = np.asarray(self.embedder.encode([actual])[0])
            out = searchmod.semantic_search(
                self.docs, self.vectors, qv, id_col=self.id_col, k=top_n,
                meta_cols=self.meta_cols,
            )
        else:
            out = searchmod.keyword_search(
                self.docs, q, text_col=self.text_col, id_col=self.id_col,
                k=top_n, stem=stem,
            )
            if self.meta_cols and len(out):
                # attach display metadata (conference/year/...) — broadcast
                # join of the tiny hit list against the docs Dataset, rank
                # order preserved (the semantic path already does this)
                from . import relops

                hits = relops.broadcast_join(
                    self.docs.select_columns(
                        sorted(set([self.id_col, *self.meta_cols]))
                    ),
                    out,
                    on=self.id_col,
                )
                out = hits.to_pandas().sort_values("rank").reset_index(drop=True)
        self.results = out
        self.filtered = out
        self.query = query
        self.current_page = 1  # new search resets pagination (streamlit:214)
        return {"results": out, "stats": stats_summary(out), "message": "ok"}

    # ---------------------------------------------------------------- filters

    def set_filters(self, **column_values) -> pd.DataFrame:
        """Filter the CURRENT result set (client-side, like the Streamlit
        sidebar): column → allowed value or list of values. Resets to page 1."""
        out = self.results
        for col, val in column_values.items():
            if val is None or col not in out.columns:
                continue
            allowed = val if isinstance(val, (list, tuple, set)) else [val]
            out = out[out[col].isin(list(allowed))]
        self.filtered = out.reset_index(drop=True)
        self.current_page = 1
        return self.filtered

    # ------------------------------------------------------------- pagination

    def page(self, page: int | None = None, per_page: int = 10) -> tuple[pd.DataFrame, dict]:
        if page is not None:
            self.current_page = page
        rows, info = paginate(self.filtered, self.current_page, per_page)
        self.current_page = info["page"]  # clamped
        return rows, info

    # ---------------------------------------------------------------- context

    def prompt_context(self, k: int = 5) -> str:
        """The chat-context formatting flow (format_papers_for_prompt /
        analysis.format_for_prompt) over the current filtered results."""
        from . import analysis

        return analysis.format_for_prompt(self.filtered, k=k)
