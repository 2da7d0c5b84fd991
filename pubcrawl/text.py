"""Text analysis operators: quality features, token counting, language-ID.

All integer-exact so results compare bit-for-bit against a SQL oracle
(see queries.py): counts of regex matches, stopword hits, punctuation —
ratios are expressed as integer cross-multiplication comparisons, never
floats. Generalizes the reference tokenizer semantics
(/root/reference/src/analysis/analyzer.py:27-44)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data as rd

_TOKEN = re.compile(r"\w+")
_ALPHA = re.compile(r"[a-z]+")
_PUNCT = re.compile(r"[.!?,;:]")


def quality_features(
    ds: rd.Dataset, text_col: str, id_col: str, stopwords: frozenset[str]
) -> rd.Dataset:
    """Per-doc integer features: n_tokens (\\w+ matches), n_alpha ([a-z]+
    runs of the lowered text), n_stop (alpha runs in the stopword list),
    n_punct (.!?,;: chars)."""
    ref = ray.put(stopwords)

    class Feat:
        def __init__(self):
            self.stop = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            texts = df[text_col].fillna("")
            n_tokens = np.fromiter((len(_TOKEN.findall(t)) for t in texts), np.int64, len(df))
            alpha = [_ALPHA.findall(t.lower()) for t in texts]
            n_alpha = np.fromiter((len(a) for a in alpha), np.int64, len(df))
            stop = self.stop
            n_stop = np.fromiter(
                (sum(1 for w in a if w in stop) for a in alpha), np.int64, len(df)
            )
            n_punct = np.fromiter((len(_PUNCT.findall(t)) for t in texts), np.int64, len(df))
            return pd.DataFrame(
                {
                    id_col: df[id_col],
                    "n_tokens": n_tokens,
                    "n_alpha": n_alpha,
                    "n_stop": n_stop,
                    "n_punct": n_punct,
                }
            )

    return ds.map_batches(Feat, batch_format="pandas", concurrency=(1, 8))


def langid_en(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    stopwords: frozenset[str],
    *,
    num: int = 80,
    den: int = 1000,
) -> rd.Dataset:
    """Stopword-ratio language ID: predict 'en' iff n_stop*den > n_alpha*num
    (integer cross-multiplication — exact, oracle-matchable). An n-gram
    profile model would slot into the same stage shape."""
    feats = quality_features(ds, text_col, id_col, stopwords)

    def pred(df: pd.DataFrame) -> pd.DataFrame:
        is_en = df["n_stop"] * den > df["n_alpha"] * num
        return pd.DataFrame(
            {id_col: df[id_col], "pred_lang": np.where(is_en, "en", "other")}
        )

    return feats.map_batches(pred, batch_format="pandas")
