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
            # token/alpha/punct counts as vectorized pandas str.count passes
            # (same regexes → identical counts to the findall loops)
            n_tokens = texts.str.count(_TOKEN.pattern).to_numpy(dtype=np.int64)
            # alpha runs exploded once: per-doc counts and stopword hits are
            # bincounts over the run→row index (no per-word Python loop)
            runs = texts.str.lower().str.findall(_ALPHA.pattern).explode()
            valid = runs.notna()
            idx = runs.index.to_numpy()[valid.to_numpy()]
            n_alpha = np.bincount(idx, minlength=len(df)).astype(np.int64)
            hits = runs[valid].isin(self.stop).to_numpy(dtype=np.float64)
            n_stop = np.bincount(idx, weights=hits, minlength=len(df)).astype(np.int64)
            n_punct = texts.str.count(_PUNCT.pattern).to_numpy(dtype=np.int64)
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


# ------------------------------------------- trained n-gram language ID


def _byte_trigram_hashes(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(unique trigram hashes, counts) of a document — byte trigrams over the
    utf-8 encoding (language-characteristic for latin AND cjk scripts alike),
    hashed in one vectorized fixed-length xxh64 pass over a sliding byte
    window (no per-gram Python loop)."""
    from .hashing import _xxh64_fixed_len

    raw = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(raw) < 3:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(raw, 3)
    h = _xxh64_fixed_len(np.ascontiguousarray(win))
    uniq, cnt = np.unique(h, return_counts=True)
    return uniq, cnt.astype(np.int64)


def langid_fit_trigrams(
    ds: rd.Dataset,
    text_col: str,
    label_col: str,
    top_k: int = 300,
) -> pd.DataFrame:
    """FIT a per-language byte-trigram profile, distributed: per-batch
    (label, trigram_hash, count) partials (the combiner — only distinct
    trigrams per label per batch shuffle, never text), a key-hash grouped
    sum, per-label top_k selection, then L2 normalization. The returned
    profile table (|langs| × top_k rows: label, h, w) is the model — tiny by
    construction, independent of corpus size. The distributed fit-aggregate /
    broadcast-predict split is the same shape a 100-TB feature pipeline
    uses for any count-based model."""
    from . import relops

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for label, g in df.groupby(label_col, sort=False):
            # vectorized label-level aggregation: concat every doc's (hash,
            # count) pairs, then one np.unique + add.at pass — no per-trigram
            # Python loop (the fit stage's hot path at corpus scale)
            per_doc = [_byte_trigram_hashes(t) for t in g[text_col]]
            hs = [u for u, _ in per_doc if len(u)]
            if not hs:
                continue
            all_h = np.concatenate(hs)
            all_c = np.concatenate([c for _, c in per_doc if len(c)])
            uniq, inv = np.unique(all_h, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, all_c)
            frames.append(pd.DataFrame(
                {label_col: label, "h": uniq.view(np.int64), "c": sums}
            ))
        if not frames:
            return pd.DataFrame({label_col: pd.Series([], dtype=object),
                                 "h": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"h": "int64", "c": "int64"})

    partials = ds.select_columns([text_col, label_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
    summed = relops.preagg_group_sum(
        partials.map_batches(lambda df: df.rename(columns={"c": "v"}),
                             batch_format="pandas", batch_size=None),
        [label_col, "h"], sum_cols={"v": "c"},
    )
    top = relops.topk_per_group(
        summed, [label_col], [("c", True), ("h", False)], top_k
    ).to_pandas()  # the model: |langs| x top_k rows — driver-small
    norm = top.groupby(label_col)["c"].transform(lambda s: np.sqrt((s.astype(float) ** 2).sum()))
    top["w"] = top["c"].astype(float) / norm
    return top[[label_col, "h", "w"]]


def langid_predict_trigrams(
    ds: rd.Dataset,
    profiles: pd.DataFrame,
    text_col: str,
    id_col: str,
    label_col: str = "lang",
) -> rd.Dataset:
    """PREDICT with a fitted profile table: the model broadcasts once
    (ray.put of a sorted hash array + |hashes| × |langs| weight matrix);
    each batch scores every doc with one searchsorted probe + one matmul —
    cosine between the doc's trigram counts and each language profile,
    deterministic argmax (ties → lexicographically first language)."""
    langs = sorted(profiles[label_col].unique())
    h_sorted = np.sort(profiles["h"].unique())
    wmat = np.zeros((len(h_sorted), len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        sub = profiles[profiles[label_col] == lang]
        idx = np.searchsorted(h_sorted, sub["h"].to_numpy())
        wmat[idx, j] = sub["w"].to_numpy()
    model_ref = ray.put((h_sorted, wmat, np.asarray(langs, dtype=object)))

    def pred(df: pd.DataFrame) -> pd.DataFrame:
        hs, wm, lg = ray.get(model_ref)
        per_doc = [_byte_trigram_hashes(t) for t in df[text_col]]
        lens = np.array([len(u) for u, _ in per_doc], dtype=np.int64)
        out = np.zeros(len(df), dtype=np.int64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            # ONE searchsorted + matmul over all docs' trigrams, per-doc
            # scores via reduceat segment sums (no per-doc numpy calls)
            all_u = np.concatenate([per_doc[i][0] for i in nonempty]).view(np.int64)
            all_c = np.concatenate([per_doc[i][1] for i in nonempty]).astype(np.float64)
            pos = np.searchsorted(hs, all_u)
            pos_c = np.minimum(pos, len(hs) - 1)
            hit = hs[pos_c] == all_u
            contrib = np.zeros((len(all_u), wm.shape[1]), dtype=np.float64)
            contrib[hit] = all_c[hit, None] * wm[pos_c[hit]]
            bounds = np.concatenate([[0], np.cumsum(lens[nonempty])])[:-1]
            scores = np.add.reduceat(contrib, bounds, axis=0)
            out[nonempty] = np.argmax(scores, axis=1)
        lg_arr = np.asarray(lg)
        return pd.DataFrame(
            {id_col: df[id_col], "pred_lang": lg_arr[out]}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        pred, batch_format="pandas", batch_size=None
    )


# ------------------------------------------------- PII / pattern redaction


def redact_patterns(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    patterns: dict[str, str],
    out_col: str = "clean_text",
) -> rd.Dataset:
    """Pattern redaction — the PII-scrubbing stage of a training-data
    pipeline: each named pattern's matches are replaced by ``[NAME]`` and
    counted. Embarrassingly parallel (pure per-batch map, regexes compiled
    once per task closure); patterns are RE2-compatible so the SQL oracle
    (DuckDB regexp_replace) replays them byte-for-byte.

    Output: (id, out_col, n_<name> per pattern) — the counts give the audit
    table (how much PII per doc) without a second pass."""
    compiled = [(name, re.compile(p), f"[{name.upper()}]") for name, p in patterns.items()]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: df[id_col]})
        texts = df[text_col].fillna("")
        counts = {name: np.zeros(len(df), dtype=np.int64) for name, _, _ in compiled}
        cleaned = []
        for i, t in enumerate(texts):
            for name, rx, repl in compiled:
                t, n = rx.subn(repl, t)
                counts[name][i] = n
            cleaned.append(t)
        out[out_col] = cleaned
        for name, _, _ in compiled:
            out[f"n_{name}"] = counts[name]
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas", batch_size=None
    )


def normalize_text(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    out_col: str = "norm_text",
    lowercase: bool = False,
) -> rd.Dataset:
    """Unicode + whitespace normalization — the canonicalization stage of a
    text-cleaning pipeline: NFC composition (decomposed accents fold to
    single codepoints), ASCII-whitespace-run collapse to single spaces, and
    strip (optional lowercase). The whitespace class is the explicit
    [ \\t\\n\\r\\f]+ so Python re and RE2 (the DuckDB oracle) agree — Python's
    \\s would also eat unicode spaces that RE2's does not."""
    import unicodedata

    ws = re.compile(r"[ \t\n\r\f]+")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df[text_col].fillna(""):
            t = unicodedata.normalize("NFC", t)
            t = ws.sub(" ", t).strip()
            out.append(t.lower() if lowercase else t)
        return pd.DataFrame({id_col: df[id_col], out_col: out})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas", batch_size=None
    )


# ------------------------------------- repetition quality + contamination


def _split_words(tbl, text_col: str):
    """Whitespace-split an Arrow string column → (flat word StringArray,
    doc_idx int64 per flat word, word lengths int64), empty tokens dropped —
    identical token stream to regexp_extract_all(text, '\\S+') in the SQL
    oracle. One Arrow kernel pass; no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = pc.fill_null(tbl[text_col], "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # Defensive compaction (round-5 flake fix): pyarrow 16.1.0's
    # utf8_split_whitespace can STABLY mis-classify a byte near the end of
    # certain zero-copy plasma-backed buffers (observed ~0.5% of tiny tail
    # batches: trailing " " returned as a token, so "  xx  " counted 2
    # words); the same logical value splits correctly after its bytes move
    # into freshly-allocated Arrow buffers, which take() guarantees.
    col = col.take(pa.array(np.arange(len(col), dtype=np.int64)))
    la = pc.utf8_split_whitespace(col)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    counts = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(la)
    doc_idx = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0  # split artifacts at string edges / double spaces
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx, lens = doc_idx[keep], lens[keep]
    return flat, doc_idx, lens


def _run_lengths(keys: np.ndarray, docs: np.ndarray):
    """Group the (doc, key) stream: → (run_doc, run_len) for each distinct
    (doc, key), via lexsort + boundary scan (exact, fully vectorized)."""
    if len(keys) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    order = np.lexsort((keys, docs))
    sd, sk = docs[order], keys[order]
    new = np.ones(len(sd), dtype=bool)
    new[1:] = (sd[1:] != sd[:-1]) | (sk[1:] != sk[:-1])
    run_id = np.cumsum(new) - 1
    return sd[new], np.bincount(run_id).astype(np.int64)


def repetition_features(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Gopher/C4-style repetition statistics, integer-exact per document:
    n_words, n_uniq_words, top_word_n (count of the most frequent word),
    top_bigram_n (count of the most frequent adjacent word pair),
    sum_word_len (Σ word lengths — mean word length as an exact integer
    numerator). The repetition gates of a 100-TB cleaning pipeline
    (duplicate-word / top-n-gram fraction filters, Rae et al. 2021 "Scaling
    Language Models" §A1.1) compare these integers against thresholds by
    cross-multiplication, never floats. Pure per-batch map — embarrassingly
    parallel, no shuffle. Documents with zero words are dropped (mirrors the
    SQL oracle, whose word-unnest loses them)."""
    import pyarrow as pa

    def fn(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        flat, doc_idx, lens = _split_words(tbl, text_col)
        words = flat.to_numpy(zero_copy_only=False)
        codes = pd.factorize(words)[0] if len(words) else np.array([], dtype=np.int64)
        n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
        sum_len = np.bincount(doc_idx, weights=lens, minlength=n).astype(np.int64)
        run_doc, run_len = _run_lengths(codes, doc_idx)
        n_uniq = np.bincount(run_doc, minlength=n).astype(np.int64)
        top_word = np.zeros(n, dtype=np.int64)
        if len(run_doc):
            np.maximum.at(top_word, run_doc, run_len)
        # adjacent bigrams: pairs that don't cross a document boundary
        top_bigram = np.zeros(n, dtype=np.int64)
        if len(codes) > 1:
            adj = doc_idx[1:] == doc_idx[:-1]
            v = np.int64(codes.max()) + 1
            bkey = codes[:-1][adj] * v + codes[1:][adj]
            bdoc, blen = _run_lengths(bkey, doc_idx[1:][adj])
            if len(bdoc):
                np.maximum.at(top_bigram, bdoc, blen)
        nz = n_words > 0
        return pa.table(
            {
                id_col: tbl[id_col].combine_chunks().filter(pa.array(nz))
                if isinstance(tbl[id_col], pa.ChunkedArray)
                else tbl[id_col].filter(pa.array(nz)),
                "n_words": pa.array(n_words[nz]),
                "n_uniq_words": pa.array(n_uniq[nz]),
                "top_word_n": pa.array(top_word[nz]),
                "top_bigram_n": pa.array(top_bigram[nz]),
                "sum_word_len": pa.array(sum_len[nz]),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def contamination_counts(
    ds: rd.Dataset,
    bench_texts: list[str],
    text_col: str,
    id_col: str,
    n: int = 4,
) -> rd.Dataset:
    """Benchmark-contamination check: per document, the number of DISTINCT
    word n-grams it shares with a (driver-small) benchmark corpus — the
    decontamination pass a training pipeline runs against its eval sets
    (word-level n-gram overlap, as in GPT-3 appendix C / PaLM §7). The
    benchmark text list is broadcast once via ray.put; each batch factorizes
    its words TOGETHER with the benchmark's so n-gram keys live in one dense
    code space (re-densified per combine step — no vocab-size overflow), then
    counts distinct doc-grams hitting the benchmark key set with one
    sorted-array isin. No shuffle; scales as a pure map stage."""
    import pyarrow as pa

    bench_ref = ray.put(list(bench_texts))

    class Contam:
        def __init__(self):
            bt = ray.get(bench_ref)
            self._bench_words = [t.split() for t in bt]

        def __call__(self, tbl: pa.Table) -> pa.Table:
            nrows = tbl.num_rows
            flat, doc_idx, _ = _split_words(tbl, text_col)
            words = flat.to_numpy(zero_copy_only=False)
            # append benchmark docs as pseudo-docs nrows..nrows+B-1
            bw = self._bench_words
            all_words = np.concatenate(
                [words] + [np.asarray(w, dtype=object) for w in bw]
            ) if bw else words
            all_docs = np.concatenate(
                [doc_idx]
                + [np.full(len(w), nrows + j, dtype=np.int64) for j, w in enumerate(bw)]
            ) if bw else doc_idx
            shared = np.zeros(nrows, dtype=np.int64)
            if len(all_words) >= n:
                codes = pd.factorize(all_words)[0]
                key = codes.astype(np.int64)
                docs = all_docs
                for _ in range(n - 1):
                    ok = docs[1:] == docs[:-1]
                    pair = np.stack([key[:-1][ok], codes[1:][ok]])
                    # re-densify so key values never overflow int64
                    _, key = np.unique(pair, axis=1, return_inverse=True)
                    docs = docs[1:][ok]
                    codes = codes[1:][ok]
                    if len(key) == 0:
                        break
                if len(key):
                    bench_keys = np.unique(key[docs >= nrows])
                    doc_mask = docs < nrows
                    hit = np.isin(key[doc_mask], bench_keys)
                    run_doc, _ = _run_lengths(key[doc_mask][hit], docs[doc_mask][hit])
                    if len(run_doc):
                        np.add.at(shared, run_doc, 1)
            return pa.table({id_col: tbl[id_col], "n_shared": pa.array(shared)})

    return ds.select_columns([id_col, text_col]).map_batches(
        Contam, batch_format="pyarrow", concurrency=(1, 8)
    )


def chunk_documents(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    chunk_words: int = 32,
    stride: int = 24,
) -> rd.Dataset:
    """Sequence packing / context chunking: split each document into word
    windows of ``chunk_words`` starting every ``stride`` words (overlap =
    chunk_words - stride), the chunking pass that prepares a corpus for
    fixed-context training. Fully vectorized — word offsets and per-chunk
    take-indices are numpy arithmetic over the Arrow split, and the chunk
    strings come from one pc.binary_join over a rebuilt ListArray (no
    per-chunk Python join). Pure map stage; documents with zero words emit
    no chunks."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if stride <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride must be positive")

    def fn(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        flat, doc_idx, _ = _split_words(tbl, text_col)
        counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        base = np.concatenate([[0], np.cumsum(counts)[:-1]])
        n_chunks = np.where(counts > 0, (np.maximum(counts - 1, 0) // stride) + 1, 0)
        cdoc = np.repeat(np.arange(n), n_chunks)
        chunk_base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        cid = np.arange(len(cdoc), dtype=np.int64) - np.repeat(chunk_base, n_chunks)
        starts = base[cdoc] + cid * stride
        ends = np.minimum(starts + chunk_words, base[cdoc] + counts[cdoc])
        lens = ends - starts
        offs = np.concatenate([[0], np.cumsum(lens)])
        take = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], lens) + np.repeat(starts, lens)
        words = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        la = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), words.take(pa.array(take))
        )
        ids = tbl[id_col].combine_chunks() if isinstance(tbl[id_col], pa.ChunkedArray) else tbl[id_col]
        return pa.table(
            {
                id_col: ids.take(pa.array(cdoc)),
                "chunk_id": pa.array(cid),
                "chunk_text": pc.binary_join(la, pa.scalar(" ")),
                "n_chunk_words": pa.array(lens),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


def tfidf_topk(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 5,
    token_pattern: str = r"[a-z0-9]+",
    n_partitions: int | None = None,
) -> rd.Dataset:
    """Per-document TF-IDF top terms → (id, term, tfidf_e6) rows.

    Three stages, no join: (1) per-batch vectorized tokenize (lowercase RE2-
    compatible pattern — byte-identical to SQL regexp_extract_all on the
    ASCII corpus) + per-doc term counts — complete per batch because a doc
    is one row; (2) ONE key-hash shuffle by term — every (doc, term, tf) row
    of a term co-locates, so the exact global document frequency is the
    partition-local row count per term and scoring needs no df join;
    (3) per-doc top-n via the topk_per_group combiner (≤ top_n rows per
    (doc, block) through the second shuffle). Scores are e6-quantized
    (banker's rounding == SQL round_even); ties break on term asc in both
    engines. The shuffles move (id, term, tf) triples only — at corpus scale
    the wide state is the posting list, never document text."""
    from . import relops

    n_docs = float(ds.count())
    pat = re.compile(token_pattern)

    def tf_of(df: pd.DataFrame) -> pd.DataFrame:
        e = df[text_col].fillna("").str.lower().str.findall(pat).explode()
        e = e[e.notna()]
        t = pd.DataFrame(
            {id_col: df.loc[e.index, id_col].to_numpy(), "term": e.to_numpy()}
        )
        return (
            t.groupby([id_col, "term"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )

    tf = ds.select_columns([id_col, text_col]).map_batches(
        tf_of, batch_format="pandas", batch_size=None
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("term")["term"].transform("size").to_numpy()
        s = df["tf"].to_numpy() * np.log(n_docs / dfreq)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "term": df["term"].to_numpy(),
                "tfidf_e6": np.round(s * 1e6).astype(np.int64),
            }
        )

    scored = relops.hash_partition_apply(tf, ["term"], score, n_partitions=n_partitions)
    return relops.topk_per_group(
        scored, [id_col], [("tfidf_e6", True), ("term", False)], top_n
    )


def unigram_logprob(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_pattern: str = r"[a-z0-9]+",
    n_partitions: int | None = None,
) -> rd.Dataset:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram LM → (id, n_tokens, nll_e6) — the CCNet-style perplexity
    quality gate (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data", LREC 2020) with the corpus itself as the
    LM, so the fit and the scoring are one engine plan.

    Join-free like :func:`tfidf_topk`: per-batch tokenize + per-doc term
    counts, ONE shuffle by term co-locates each term's rows so the GLOBAL
    term count is a partition-local sum — each partition emits per-(doc,
    term) log-prob contributions tf·ln(c_t/total); a second shuffle by doc
    sums them and divides by the doc's token count. ``total`` (corpus token
    count) is one combiner scalar over the tf table, which is materialized
    once and consumed twice (at 100 TB you would checkpoint the tf table to
    parquet between the two passes; the plan is otherwise unchanged). Scores
    are e6-quantized: summation-order drift (~1e-15 relative) sits ~8 orders
    below the quantum."""
    from . import relops

    pat = re.compile(token_pattern)

    def tf_of(df: pd.DataFrame) -> pd.DataFrame:
        e = df[text_col].fillna("").str.lower().str.findall(pat).explode()
        e = e[e.notna()]
        t = pd.DataFrame(
            {id_col: df.loc[e.index, id_col].to_numpy(), "term": e.to_numpy()}
        )
        return (
            t.groupby([id_col, "term"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )

    tf = (
        ds.select_columns([id_col, text_col])
        .map_batches(tf_of, batch_format="pandas", batch_size=None)
        .materialize()
    )
    total = float(
        tf.map_batches(
            lambda df: pd.DataFrame({"t": [int(df["tf"].sum())]}),
            batch_format="pandas", batch_size=None,
        ).to_pandas()["t"].sum()
    )

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        c_t = df.groupby("term")["tf"].transform("sum").to_numpy(dtype=np.float64)
        lp = df["tf"].to_numpy() * np.log(c_t / total)
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "lp": lp, "tf": df["tf"].to_numpy()}
        )

    contribs = relops.hash_partition_apply(tf, ["term"], contrib, n_partitions=n_partitions)

    def reduce_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False, sort=False).agg(
            lp=("lp", "sum"), n_tokens=("tf", "sum")
        )
        nll = -g["lp"].to_numpy() / g["n_tokens"].to_numpy()
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy().astype(np.int64),
                "nll_e6": np.round(nll * 1e6).astype(np.int64),
            }
        )

    return relops.hash_partition_apply(contribs, [id_col], reduce_doc, n_partitions=n_partitions)


def strip_boilerplate_lines(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 8,
    max_docs: int = 1,
    n_partitions: int | None = None,
) -> rd.Dataset:
    """C4/RefinedWeb-style boilerplate-line removal: split each document into
    non-overlapping ``line_words``-word lines (the corpus's line proxy —
    chunk_documents with stride == width), drop every line that appears in
    more than ``max_docs`` DISTINCT documents anywhere in the corpus (nav
    bars, license footers, share buttons), and reassemble the surviving lines
    in document order.

    Scale shape: two co-partitioned raw-row shuffles and nothing else —
    line-shuffle makes the global distinct-doc count of a line
    partition-local (no count join, no broadcast of a potentially-large
    boilerplate set), doc-shuffle reassembles. Text bytes move twice, the
    same order as any sort of the corpus; no driver materialization.

    Returns (id_col, clean_text, n_lines, n_dropped); documents with zero
    words emit no row (they have no lines on either engine).
    """
    from . import relops

    lines = chunk_documents(ds, text_col, id_col, chunk_words=line_words, stride=line_words)
    lines = lines.select_columns([id_col, "chunk_id", "chunk_text"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        # all equal lines are co-located here: exact distinct-doc count
        nd = df.groupby("chunk_text")[id_col].transform("nunique").to_numpy()
        return df.assign(__keep=nd <= max_docs)

    flagged = relops.hash_partition_apply(lines, ["chunk_text"], flag, n_partitions)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("chunk_id", kind="stable")
        n_lines = df.groupby(id_col, sort=True).size()
        kept = df[df["__keep"]]
        gk = kept.groupby(id_col, sort=True)
        clean = gk["chunk_text"].agg(" ".join).reindex(n_lines.index)
        n_kept = gk.size().reindex(n_lines.index).fillna(0).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: n_lines.index.to_numpy(),
                "clean_text": clean.fillna("").to_numpy(),
                "n_lines": n_lines.to_numpy(dtype=np.int64),
                "n_dropped": (n_lines.to_numpy(dtype=np.int64) - n_kept.to_numpy()),
            }
        )

    return relops.hash_partition_apply(flagged, [id_col], reassemble, n_partitions)


def mask_repeated_ngrams(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
    n_partitions: int | None = None,
) -> rd.Dataset:
    """Repeated-span masking — the word-level form of exact substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every OVERLAPPING n-word gram is counted corpus-wide, and each
    document drops every word covered by at least one gram occurring
    ``min_count``+ times anywhere (its own other copies included). Unlike
    strip_boilerplate_lines' fixed line grid, the overlapping grams catch
    repeated spans at ANY offset, and only the repeated span is removed, not
    its whole line.

    Scale shape: gram-shuffle (one raw-row exchange of (doc, pos, gram) —
    ~n× the corpus bytes; at 100 TB swap the gram text for its xxh64 and
    the plan is unchanged) makes each gram's global count partition-local;
    the surviving flag table (doc, pos of repeated grams only) is sparse,
    and one co-partitioned doc-shuffle unions it with the documents to mask
    and reassemble locally — no broadcast of a corpus-dependent gram set.

    Returns (id_col, clean_text, n_words, n_masked); zero-word documents
    emit no row (no words on either engine).
    """
    from . import relops

    grams = chunk_documents(ds, text_col, id_col, chunk_words=n, stride=1)

    def full_windows(tbl: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        t = tbl.filter(pc.equal(tbl["n_chunk_words"], pa.scalar(n, pa.int64())))
        return pa.table(
            {id_col: t[id_col], "pos": t["chunk_id"], "gram": t["chunk_text"]}
        )

    grams = grams.map_batches(full_windows, batch_format="pyarrow")

    def repeated(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby("gram")["gram"].transform("size").to_numpy()
        hit = df[cnt >= min_count]
        return pd.DataFrame(
            {id_col: hit[id_col].to_numpy(), "pos": hit["pos"].to_numpy(dtype=np.int64)}
        )

    flags = relops.hash_partition_apply(grams, ["gram"], repeated, n_partitions)

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: df[id_col], "__text": df[text_col], "pos": np.int64(-1),
             "__side": np.int8(0)}
        )

    def tag_flags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: df[id_col], "__text": None, "pos": df["pos"].to_numpy(dtype=np.int64),
             "__side": np.int8(1)}
        )

    docs_t = ds.select_columns([id_col, text_col]).map_batches(
        tag_docs, batch_format="pandas", batch_size=None
    )
    flags_t = flags.map_batches(tag_flags, batch_format="pandas", batch_size=None)

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["__side"] == 0]
        starts = df[df["__side"] == 1]
        start_map = {k: g["pos"].to_numpy() for k, g in starts.groupby(id_col, sort=False)}
        ids, texts, n_words, n_masked = [], [], [], []
        for did, raw in zip(docs[id_col].to_numpy(), docs["__text"].to_numpy()):
            words = str(raw).split()
            if not words:
                continue  # zero-word docs emit no row (oracle parity)
            s = start_map.get(did)
            if s is None:
                kept, masked = " ".join(words), 0
            else:
                # difference-array span cover: O(words) per doc, numpy only
                cover = np.zeros(len(words) + 1, dtype=np.int32)
                cover[s] += 1
                cover[np.minimum(s + n, len(words))] -= 1
                covered = np.cumsum(cover[:-1]) > 0
                masked = int(covered.sum())
                kept = " ".join(np.asarray(words, dtype=object)[~covered])
            ids.append(did)
            texts.append(kept)
            n_words.append(len(words))
            n_masked.append(masked)
        return pd.DataFrame(
            {
                id_col: np.asarray(ids),
                "clean_text": pd.Series(texts, dtype=object),
                "n_words": np.asarray(n_words, dtype=np.int64),
                "n_masked": np.asarray(n_masked, dtype=np.int64),
            }
        )

    return relops.hash_partition_apply(docs_t.union(flags_t), [id_col], mask, n_partitions)


# ----------------------------- all-pairs TF-IDF cosine (sparse similarity join)


def tfidf_cosine_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 2,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    tau_e12: int = 800_000_000_000,
    token_pattern: str = r"[a-z0-9]+",
    n_partitions: int | None = None,
) -> rd.Dataset:
    """All-pairs TF-IDF cosine similarity join via the inverted index
    (Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search", shaped
    for Ray Data) → (doc_a, doc_b, cos_e6) rows with cosine ≥ tau.

    Four key-hash shuffles of (id, term, weight) triples — document text
    never moves after tokenization:
      1. by term: exact document frequency is the partition-local count
         (no df join); the df guard (min_df ≤ df ≤ max_df_frac·N) is the
         posting-list blowup bound — a term's pair fan-out is df², so the
         guard caps per-term work exactly like dedup's max_shingle_df;
      2. by doc: the L2 norm over the FILTERED vocabulary;
      3. by term again: each posting list emits its upper-triangle partial
         products (vectorized outer product per term);
      4. by (doc_a, doc_b): combiner sum folds partial products into the
         final dot — the only stage whose key domain is pairs, and it only
         ever sees pairs that share ≥1 surviving term.

    Exact-replay protocol — ZERO float drift anywhere, not just below a
    quantum: idf is e9-quantized; the weight w_e6 = round(tf·idf·1e6) is an
    int64 (identical on both engines since tf and the quantized idf are);
    the norm is √(Σ w_e6²) of an EXACT integer sum (order-free; int64-safe
    while Σ(tf·idf·1e6)² < 2^63 — holds for docs up to ~10⁴ distinct terms
    at these idf ranges; beyond that, chunk docs or drop to e4 units);
    normalized weights and their pairwise products are then bit-identical
    doubles, each product is e12-rounded to an int, and the dot is an int64
    sum. DuckDB replays every step bit-for-bit."""
    from . import relops

    n_docs = ds.count()
    max_df = int(np.ceil(max_df_frac * n_docs))
    pat = re.compile(token_pattern)

    def tf_of(df: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_term = [], []
        for did, txt in zip(df[id_col].to_numpy(), df[text_col].fillna("")):
            ws = pat.findall(txt.lower())
            if len(ws) < ngram:
                continue
            grams = [" ".join(ws[i:i + ngram]) for i in range(len(ws) - ngram + 1)]
            rows_id.extend([did] * len(grams))
            rows_term.extend(grams)
        t = pd.DataFrame({id_col: np.asarray(rows_id, dtype=np.int64),
                          "term": rows_term})
        return (t.groupby([id_col, "term"], as_index=False, sort=False)
                .size().rename(columns={"size": "tf"}))

    tf = ds.select_columns([id_col, text_col]).map_batches(
        tf_of, batch_format="pandas", batch_size=None)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("term")["term"].transform("size").to_numpy()
        keep = (dfreq >= min_df) & (dfreq <= max_df)
        d = df[keep]
        idf = np.round(np.log(n_docs / dfreq[keep]) * 1e9) / 1e9
        we6 = np.round(d["tf"].to_numpy(np.float64) * idf * 1e6).astype(np.int64)
        return pd.DataFrame({id_col: d[id_col].to_numpy(),
                             "term": d["term"].to_numpy(), "we6": we6})

    w = relops.hash_partition_apply(tf, ["term"], weigh,
                                    n_partitions=n_partitions)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        we6 = df["we6"].to_numpy(np.int64)
        s = df.assign(__sq=we6 * we6).groupby(id_col)["__sq"].transform("sum")
        ok = s.to_numpy() > 0
        d = df[ok]
        wn = d["we6"].to_numpy(np.int64) / np.sqrt(s.to_numpy(np.float64)[ok])
        return pd.DataFrame({id_col: d[id_col].to_numpy(),
                             "term": d["term"].to_numpy(), "wn": wn})

    wn = relops.hash_partition_apply(w, [id_col], norm,
                                     n_partitions=n_partitions)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("term", sort=False):
            ids = g[id_col].to_numpy(np.int64)
            o = np.argsort(ids, kind="stable")
            ids, v = ids[o], g["wn"].to_numpy(np.float64)[o]
            if len(ids) < 2:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({
                "doc_a": ids[iu], "doc_b": ids[ju],
                "prod": np.round(v[iu] * v[ju] * 1e12).astype(np.int64),
            }))
        if not outs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "prod": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    pp = relops.hash_partition_apply(wn, ["term"], pairs,
                                     n_partitions=n_partitions)
    dots = relops.preagg_group_sum(pp, ["doc_a", "doc_b"],
                                   {"prod": "dot_e12"},
                                   n_partitions=n_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["dot_e12"] >= tau_e12]
        return pd.DataFrame({
            "doc_a": d["doc_a"].to_numpy(np.int64),
            "doc_b": d["doc_b"].to_numpy(np.int64),
            "cos_e6": np.round(d["dot_e12"].to_numpy(np.float64) / 1e6
                               ).astype(np.int64),
        })

    return dots.map_batches(finish, batch_format="pandas", batch_size=None)


# ---------------------------------------- multinomial Naive Bayes classifier


def nb_fit_predict(
    ds: rd.Dataset,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    holdout_mod: int = 3,
    token_pattern: str = r"[a-z0-9]+",
    n_partitions: int | None = None,
) -> rd.Dataset:
    """Multinomial Naive Bayes with add-one smoothing, fit and scored in one
    distributed plan (McCallum & Nigam 1998): train = rows with
    ``id % holdout_mod != 0``, test = the rest → (id, true label, predicted
    label, winning score).

    Exact-replay protocol: every log term is quantized to an e9 integer
    (``round_even(ln((c+1)/(tot_c+V))·1e9)``) BEFORE any summation, so
    per-doc scores are exact integer sums — argmax ties break by label ASC
    and the SQL oracle replays bit-for-bit (the perplexity/PMI nano-unit
    recipe).

    Distributed shape: train token counts are a (label, term) combiner
    aggregate; the model materializes per TERM partition (zero counts
    filled per class inside the term group — classes/totals/vocab-size are
    three tiny driver scalars broadcast into the closure, never a shuffle);
    scoring is one term-hash join of test tf rows against the model and one
    (doc, class) combiner sum — OOV test terms drop out of the inner join
    on both sides, the standard multinomial-NB treatment."""
    from . import relops

    pat = re.compile(token_pattern)

    base = ds.select_columns([id_col, label_col, text_col])
    train = base.map_batches(
        lambda df, _m=holdout_mod: df[df[id_col] % _m != 0],
        batch_format="pandas", batch_size=None)
    test = base.map_batches(
        lambda df, _m=holdout_mod: df[df[id_col] % _m == 0],
        batch_format="pandas", batch_size=None)

    def tok_counts(keys: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            e = df[text_col].fillna("").str.lower().str.findall(pat).explode()
            e = e[e.notna()]
            t = pd.DataFrame({k: df.loc[e.index, k].to_numpy() for k in keys})
            t["term"] = e.to_numpy()
            return (t.groupby([*keys, "term"], as_index=False, sort=False)
                    .size().rename(columns={"size": "tf"}))
        return fn

    # -- fit: (label, term) counts; per-class token totals; vocab size; priors
    cnt = relops.preagg_group_sum(
        train.map_batches(tok_counts([label_col]), batch_format="pandas",
                          batch_size=None),
        [label_col, "term"], sum_cols={"tf": "c"}, n_partitions=n_partitions,
    ).materialize()
    tc = {r[label_col]: int(r["c"])
          for _, r in relops.preagg_group_sum(
              cnt, [label_col], sum_cols={"c": "c"}).to_pandas().iterrows()}
    vocab_n = int(relops.distinct(cnt, ["term"]).count())
    nd = relops.preagg_group_sum(
        train, [label_col], count_as="n").to_pandas()
    n_train = int(nd["n"].sum())
    prior_e9 = {r[label_col]: int(np.round(np.log(int(r["n"]) / float(n_train)) * 1e9))
                for _, r in nd.iterrows()}
    classes = sorted(tc)

    def mk_model(df: pd.DataFrame) -> pd.DataFrame:
        # zero-fill the (term × class) grid inside the term partition
        terms = df["term"].drop_duplicates().to_numpy()
        grid = pd.MultiIndex.from_product(
            [terms, classes], names=["term", "cls"]).to_frame(index=False)
        have = df.rename(columns={label_col: "cls"})[["term", "cls", "c"]]
        g = grid.merge(have, on=["term", "cls"], how="left")
        c = g["c"].fillna(0).to_numpy(np.int64)
        den = np.array([tc[k] + vocab_n for k in g["cls"]], dtype=np.float64)
        g["lnp_e9"] = np.round(np.log((c + 1) / den) * 1e9).astype(np.int64)
        return g[["term", "cls", "lnp_e9"]]

    model = relops.hash_partition_apply(cnt, ["term"], mk_model,
                                        n_partitions=n_partitions)

    # -- score: term-hash join, (doc, class) combiner sum, argmax per doc
    stf = test.map_batches(tok_counts([id_col, label_col]),
                           batch_format="pandas", batch_size=None)
    joined = relops.hash_join(stf, model, on="term",
                              left_cols=[id_col, label_col, "tf"],
                              right_cols=["cls", "lnp_e9"],
                              n_buckets=n_partitions)
    contrib = joined.map_batches(
        lambda df: pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            label_col: df[label_col].to_numpy(),
            "cls": df["cls"].to_numpy(),
            "sc": df["tf"].to_numpy(np.int64) * df["lnp_e9"].to_numpy(np.int64),
        }),
        batch_format="pandas", batch_size=None)
    score = relops.preagg_group_sum(
        contrib, [id_col, label_col, "cls"], sum_cols={"sc": "sc"},
        n_partitions=n_partitions,
    ).map_batches(
        lambda df: df.assign(score_e9=(df["sc"].to_numpy(np.int64)
                                       + np.array([prior_e9[k] for k in df["cls"]],
                                                  dtype=np.int64)))
        .drop(columns=["sc"]),
        batch_format="pandas", batch_size=None)
    win = relops.topk_per_group(score, [id_col],
                                order=[("score_e9", True), ("cls", False)], k=1,
                                n_partitions=n_partitions)
    return win.map_batches(
        lambda df: pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            label_col: df[label_col].to_numpy(),
            "pred_" + label_col: df["cls"].to_numpy(),
            "score_e9": df["score_e9"].to_numpy(np.int64),
        }),
        batch_format="pandas", batch_size=None)


# ------------------------------------------------- phrase (adjacency) search


def phrase_hits(
    ds: rd.Dataset,
    first: str,
    second: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_pattern: str = r"[a-z0-9]+",
) -> rd.Dataset:
    """Exact two-word phrase search in token space → (id, n_hits) for
    documents containing the token ``first`` immediately followed by
    ``second`` (K6's FTS index generalized to positional adjacency — the
    reference's FTS5 table supports phrase queries the same way,
    /root/reference/src/search/search_service.py:125-151).

    Embarrassingly parallel: a document's token stream lives entirely in its
    row, so adjacency is one vectorized pass per batch — flatten the token
    lists, AND the shifted equality masks, guard the document boundary with
    the parent-index array, bincount per doc. No shuffle, no positions
    materialized."""

    pat = re.compile(token_pattern)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        e = df[text_col].fillna("").str.lower().str.findall(pat)
        counts = e.str.len().to_numpy(np.int64)
        ex = e.explode()
        flat = ex[ex.notna()].to_numpy()  # explode emits one NaN per empty list
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), counts)
        if len(flat) < 2:
            return pd.DataFrame({id_col: np.array([], dtype=np.int64),
                                 "n_hits": np.array([], dtype=np.int64)})
        hit = ((flat[:-1] == first) & (flat[1:] == second)
               & (doc_idx[:-1] == doc_idx[1:]))
        per_doc = np.bincount(doc_idx[:-1][hit], minlength=len(df))
        keep = per_doc > 0
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64)[keep],
                             "n_hits": per_doc[keep].astype(np.int64)})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas", batch_size=None)
