"""Driver-contract emulation: run each queries() entry and its oracle_sql()
side-by-side on the same parquet tables and demand row-count + column-name +
exact value equality (order-insensitive), mirroring CORRECTNESS_r{N}.json."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pubcrawl.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_pandas(result) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, con):
    ours = normalize(to_pandas(QUERIES[name](SF_DIR)))
    theirs = normalize(con.execute(ORACLE[name]).fetchdf())
    assert list(ours.columns) == list(theirs.columns), (
        f"column mismatch: {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"row count {len(ours)} vs {len(theirs)}"
    for c in ours.columns:
        # the driver's value-hash is dtype-sensitive: an un-CAST SUM() in the
        # oracle SQL lands as HUGEINT→float64 and fails hash_match even when
        # values are identical (VERDICT.md round 1, What's wrong #1)
        assert ours[c].dtype.kind == theirs[c].dtype.kind, (
            f"dtype mismatch col {c}: {ours[c].dtype} vs {theirs[c].dtype}"
        )
    for c in ours.columns:
        a, b = ours[c].to_numpy(), theirs[c].to_numpy()
        if np.issubdtype(ours[c].dtype, np.floating):
            assert np.allclose(a, b, rtol=0, atol=0, equal_nan=True), f"float col {c}"
        else:
            assert (a == b).all(), f"col {c} differs"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name):
    df = to_pandas(QUERIES[name](SF_DIR))
    assert df is not None and len(df) >= 0


def test_documents_have_enough_tokens_for_shingle_oracles():
    """The shingle-Jaccard SQL oracles (dedup_minhash_pairs, dedup_near_keep,
    pipeline_clean_corpus) are engine-equivalent only for docs with >= 3
    alphabetic tokens (below that the engine's <n-word mixed-hash shingle and
    SQL's empty 3-gram list diverge). Pin the generator precondition at every
    SF the driver touches so a future data change trips HERE, not at the
    gate."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            "SELECT MIN(len(regexp_extract_all(lower(text), '[a-z]+'))) "
            f"FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchone()[0]
        assert n >= 3, (sf, n)


def test_documents_text_is_ascii():
    """pipeline_clean_corpus's quality-gate oracle equates Python re \\w+
    (unicode-aware) with DuckDB/RE2 \\w+ (ASCII) — valid only while the
    documents text is pure ASCII at every SF the driver touches. Pin that
    precondition here so a corpus change trips this test, not the gate."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            "SELECT COUNT(*) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE octet_length(encode(text)) != length(text)"
        ).fetchone()[0]
        assert n == 0, (sf, n)


def test_doc_ids_below_planted_copy_offset():
    """dedup_simhash_pairs' planted-copy oracle filters recovered pairs to
    id_b - id_a == 1000000, which identifies EXACTLY the planted (doc, copy)
    pairs only while every natural doc_id is < 1000000 (two natural docs a
    million ids apart would alias a planted pair). Pin that precondition at
    every SF the driver touches."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mx = duckdb.sql(
            f"SELECT MAX(doc_id) FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchone()[0]
        assert mx < 1000000, (sf, mx)


def test_documents_lang_domain_is_static():
    """analysis_topic_report's oracle pivots langs with a STATIC column list
    (SQL can't emit dynamic pivot columns with the cat_ naming); the pandas
    side emits a cat_<lang> column per lang present among topic-matched docs.
    Both sides agree only while every SF's lang domain is exactly
    {de,en,es,fr,zh} AND each lang appears in every topic's matched docs.
    Pin the domain here; per-topic presence is implied at these corpus sizes
    and checked by the oracle equality test itself at sf0.001."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        langs = duckdb.sql(
            "SELECT DISTINCT lang FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') ORDER BY lang"
        ).df()["lang"].tolist()
        assert langs == ["de", "en", "es", "fr", "zh"], (sf, langs)
