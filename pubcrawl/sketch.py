"""Mergeable cardinality sketches: HyperLogLog per-group distinct counting.

The 100-TB path for COUNT(DISTINCT) when the distinct domain itself is too
large for relops.group_count_distinct's exact (group, value) dedup shuffle:
each batch reduces to one (group, 2^p-byte register blob) row, registers merge
by elementwise max (associative + commutative + idempotent), so the shuffle
volume is O(groups × batches × 2^p bytes) — independent of row count and of
the distinct domain. Determinism: registers depend only on the SET of hashed
values, never on partitioning or arrival order, so estimates are bit-stable
across repartitionings (asserted in tests/test_ops_units.py).

Estimator: Flajolet et al. HyperLogLog with the standard small-range
linear-counting correction; 64-bit hashes (xxh64) need no large-range
correction. Relative error ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from . import relops
from .hashing import _xxh64_fixed_len, xxh64_arrow


def _hash_values(values) -> np.ndarray:
    """uint64 xxh64 of a value column, vectorized for both the common key
    dtypes: integers hash their 8 little-endian bytes through the fixed-length
    numpy path; strings go through the length-grouped arrow path."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)) and pa.types.is_integer(values.type):
        ints = values.to_numpy(zero_copy_only=False).astype("<i8")
        return _xxh64_fixed_len(ints.view(np.uint8).reshape(-1, 8))
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        return _xxh64_fixed_len(values.astype("<i8").view(np.uint8).reshape(-1, 8))
    if isinstance(values, np.ndarray):
        values = pa.array(values)
    return xxh64_arrow(values)


def _clz_after_shift(h: np.ndarray, p: int) -> np.ndarray:
    """rank = (# leading zeros of h << p) + 1, capped at 64-p+1 — vectorized
    6-step binary search (no float conversion: exact for all 64-bit values)."""
    w = h << np.uint64(p)
    rank = np.ones(len(w), dtype=np.uint8)
    shift = 32
    probe = np.uint64(0xFFFFFFFF00000000)
    while shift:
        mask = (w & probe) == 0
        rank[mask] += shift
        w = np.where(mask, w << np.uint64(shift), w)
        shift //= 2
        probe = (probe << np.uint64(shift)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return np.minimum(rank, 64 - p + 1).astype(np.uint8)


def hll_registers(values: pa.Array | pa.ChunkedArray, p: int = 12) -> np.ndarray:
    """One register array (2^p uint8) for a batch of values."""
    m = 1 << p
    h = _hash_values(values).view(np.uint64)
    reg = np.zeros(m, dtype=np.uint8)
    if len(h):
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        np.maximum.at(reg, idx, _clz_after_shift(h, p))
    return reg


def hll_estimate(reg: np.ndarray) -> int:
    """Bias-corrected HLL estimate from a register array."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if e <= 2.5 * m:
        v = int(np.count_nonzero(reg == 0))
        if v:
            e = m * np.log(m / v)
    return int(round(e))


def hll_group_distinct(
    ds: rd.Dataset,
    group_keys: list[str],
    val_col: str,
    *,
    p: int = 12,
    out: str = "approx_distinct",
    n_partitions: int = 8,
) -> rd.Dataset:
    """Approximate per-group COUNT(DISTINCT val) via mergeable HLL sketches:
    per-batch (group → registers) partials, key-hash shuffle of the blobs,
    elementwise-max merge + estimate per group."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(group_keys, sort=False):
            reg = hll_registers(g[val_col].to_numpy(), p=p)
            rows.append(list(key if isinstance(key, tuple) else (key,)) + [reg.tobytes()])
        return pd.DataFrame(rows, columns=group_keys + ["__reg"])

    partials = ds.select_columns(group_keys + [val_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(group_keys, sort=False):
            regs = np.stack([np.frombuffer(b, dtype=np.uint8) for b in g["__reg"]])
            merged = regs.max(axis=0)
            rows.append(
                list(key if isinstance(key, tuple) else (key,)) + [hll_estimate(merged)]
            )
        out_df = pd.DataFrame(rows, columns=group_keys + [out])
        out_df[out] = out_df[out].astype("int64")
        return out_df

    return relops.hash_partition_apply(partials, group_keys, final, n_partitions=n_partitions)


# ------------------------------------------- bottom-k hash quantile sketch


def bottomk_group_quantiles(
    ds,
    group_keys: list[str],
    val_col: str,
    key_col: str,
    qs: dict[str, float],
    k: int = 2048,
    n_partitions: int = 8,
):
    """Approximate per-group quantiles via a DETERMINISTIC bottom-k hash
    sample — the quantile counterpart of :func:`hll_group_distinct` for the
    case where even the (group, value) histogram domain is too big to
    shuffle.

    Sketch = the k rows whose ``xxh64(key_col)`` is smallest within the
    group: a uniform random-but-deterministic sample (the hash is the random
    tape), mergeable by "keep the k smallest of the union", hence
    order- and partitioning-independent — rerunning with different block
    sizes gives bit-identical output. Error is the usual sampling bound
    O(sqrt(q(1-q)/k)) on the rank. Per-batch partials carry ≤ k
    (hash, value) pairs per group; the merge keeps the global bottom-k and
    reads quantiles off the sorted sample at rank round((m-1)·q).
    """
    from .hashing import xxh64_many
    from . import relops

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = xxh64_many([str(v) for v in df[key_col]]).view(np.int64)
        d = pd.DataFrame({k_: df[k_] for k_ in group_keys})
        d["__h"] = h
        d["__v"] = df[val_col].to_numpy()
        d = d.sort_values("__h", kind="mergesort")
        return d.groupby(group_keys, sort=False).head(k)

    partials = ds.select_columns(group_keys + [val_col, key_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("__h", kind="mergesort")
        d = d.groupby(group_keys, sort=False).head(k)
        rows = []
        for key, g in d.groupby(group_keys, sort=False):
            v = np.sort(g["__v"].to_numpy())
            m = len(v)
            rec = list(key if isinstance(key, tuple) else (key,))
            for _, q in qs.items():
                rec.append(v[int(round((m - 1) * q))])
            rows.append(rec)
        return pd.DataFrame(rows, columns=group_keys + list(qs))

    return relops.hash_partition_apply(partials, group_keys, final, n_partitions=n_partitions)


# ------------------------------------------- Misra-Gries heavy hitters


def _mg_compress(df: pd.DataFrame, col: str, k_counters: int) -> pd.DataFrame:
    """One batch's Misra-Gries partial: exact value counts compressed to ≤
    k_counters counters (subtract the (k+1)-th largest count, drop ≤0), plus
    the batch's RAW row count carried on the first partial row so the total n
    (hence the n/k slack) never needs a third pass over the upstream pipeline.

    Invariant (exactness of mg_topk_exact depends on it): the summed __rows
    over all partials equals the total input row count, EVEN when compression
    keeps zero counters — e.g. an all-unique batch of > k_counters values,
    where every count equals the (k+1)-th largest. That case emits a single
    zero-count sentinel row (harmless to every sketch sum) to carry __rows."""
    n = len(df)
    vals, cnts = np.unique(df[col].to_numpy(), return_counts=True)
    if len(vals) > k_counters:
        thresh = np.partition(cnts, -k_counters - 1)[-k_counters - 1]
        keep = cnts > thresh
        vals, cnts = vals[keep], cnts[keep] - thresh
        if len(vals) == 0 and n:
            vals = df[col].to_numpy()[:1]
            cnts = np.zeros(1, dtype=np.int64)
    out = pd.DataFrame({col: vals, "__c": cnts.astype(np.int64)})
    rows = np.zeros(len(out), dtype=np.int64)
    if len(rows):
        rows[0] = n
    out["__rows"] = rows
    return out


def mg_topk_exact(
    ds,
    col: str,
    topn: int,
    k_counters: int = 4096,
    n_partitions: int = 8,
    max_candidates: int = 200_000,
):
    """Exact global top-n by count WITHOUT a full-domain shuffle: Misra-Gries
    candidate generation + an exact recount of candidates only.

    Pass 1: each batch's exact value counts are MG-compressed to ≤
    ``k_counters`` counters (subtract the (k+1)-th largest count, drop ≤0);
    for any value v the summed sketch satisfies
    ``true(v) - n/k ≤ sketch(v) ≤ true(v)``. With T = the topn-th largest
    sketch count, every true top-n value v has ``sketch(v) + n/k ≥ true(v)
    ≥ T`` (since sketch ≤ true makes T ≤ the topn-th true count), so the
    candidate set ``{v : sketch(v) + n/k ≥ T}`` PROVABLY contains the true
    top-n — unconditionally; skew only affects the candidate-set size, never
    correctness. Pass 2 broadcast-semi-joins the candidates and recounts
    them exactly (combiner aggregate), so the returned counts are exact.

    Shuffle volume: ≤ k_counters rows per block in pass 1, candidate rows
    only in pass 2 — the domain (e.g. a 10^9-token vocabulary) never moves.
    """
    from . import relops

    def compress(df: pd.DataFrame) -> pd.DataFrame:
        return _mg_compress(df, col, k_counters)

    # materialize: partials are ≤ k rows per block by construction, and they
    # are consumed three times (n derivation, threshold top-k, candidate
    # filter) — pinning them means the upstream runs ONCE here; the exact
    # recount below is the only other upstream pass
    partials = ds.select_columns([col]).map_batches(
        compress, batch_format="pandas", batch_size=None
    ).materialize()
    n_rows = int(
        partials.map_batches(
            lambda df: pd.DataFrame({"s": [int(df["__rows"].sum())]}),
            batch_format="pandas", batch_size=None,
        ).to_pandas()["s"].sum()
    )
    sketchd = relops.hash_partition_apply(
        partials.select_columns([col, "__c"]),
        [col],
        lambda df: df.groupby(col, as_index=False, sort=False)["__c"].sum(),
        n_partitions=n_partitions,
    )
    slack = n_rows // k_counters + 1
    top_sketch = relops.topk(sketchd, [("__c", True), (col, False)], topn).to_pandas()
    t_bound = int(top_sketch["__c"].min()) if len(top_sketch) else 0
    cand_ds = sketchd.map_batches(
        lambda df: df[df["__c"] + slack >= t_bound][[col]],
        batch_format="pandas", batch_size=None,
    )
    n_cand = cand_ds.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"mg_topk_exact: {n_cand} candidates exceed max_candidates="
            f"{max_candidates} — the distribution is too flat for this "
            f"k_counters (topn-th sketch count {t_bound} is within the n/k "
            f"slack {slack} of the tail). Raise k_counters so n/k drops "
            "below the topn-th true frequency, or raise max_candidates."
        )
    cand = cand_ds.to_pandas()[col]  # driver-small: guarded above
    recount = relops.preagg_group_sum(
        relops.semi_join_broadcast(ds.select_columns([col]), cand, col),
        [col], count_as="n", n_partitions=n_partitions,
    )
    return relops.topk(recount, [("n", True), (col, False)], topn)


# --------------------------------------------------- mergeable Bloom filter


_BLOOM_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _bloom_positions(vals: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(vals), n_hashes) bit positions via double hashing of the int64
    values (h1 + i·h2 scheme — standard Kirsch-Mitzenmacher)."""
    v = vals.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h1 = v * _BLOOM_MIX
        h1 ^= h1 >> np.uint64(33)
        h2 = (v ^ (v >> np.uint64(29))) * np.uint64(0xC4CEB9FE1A85EC53) | np.uint64(1)
        idx = (h1[:, None] + np.arange(n_hashes, dtype=np.uint64)[None, :] * h2[:, None])
    return (idx % np.uint64(n_bits)).astype(np.int64)


def bloom_build(ds, col: str, n_bits: int = 1 << 20, n_hashes: int = 5) -> np.ndarray:
    """Build a Bloom filter over an integer key column, distributed: each
    batch produces its local bit array (the combiner), arrays merge by OR on
    the driver — one fixed-size blob per block moves, never the keys. Use
    when the key set is too large to broadcast exactly (semi_join_broadcast)
    but a prefilter can slash a hash join's shuffle volume.

    No false negatives (every inserted key probes 1s only); FP rate is the
    standard (1 - e^{-kn/m})^k."""
    nbytes = n_bits // 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _bloom_positions(df[col].to_numpy(), n_bits, n_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"__bloom": [bits.tobytes()]})

    import ray

    @ray.remote
    def or_merge(*blobs) -> bytes:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in blobs:
            t = b if isinstance(b, (bytes, bytearray)) else b["__bloom"][0].as_py()
            acc |= np.frombuffer(t, dtype=np.uint8)
        return acc.tobytes()

    refs = list(
        ds.select_columns([col]).map_batches(
            partial, batch_format="pandas", batch_size=None
        ).to_arrow_refs()
    )
    # tree reduce: the driver never holds more than the final blob — at
    # 10k blocks a flat driver OR would stream ~GBs through one process
    fan = 16
    while len(refs) > fan:
        refs = [or_merge.remote(*refs[i : i + fan]) for i in range(0, len(refs), fan)]
    final = ray.get(or_merge.remote(*refs))  # normalizes table/bytes leaves
    return np.frombuffer(final, dtype=np.uint8).copy()


def bloom_prefilter(ds, col: str, bloom: np.ndarray, n_hashes: int = 5):
    """Keep only rows whose key MIGHT be in the filter (no false negatives):
    the bit array ships once via ray.put; membership is a vectorized gather
    + bit test per batch."""
    import ray

    n_bits = len(bloom) * 8
    ref = ray.put(bloom)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(ref)
        pos = _bloom_positions(df[col].to_numpy(), n_bits, n_hashes)
        hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return df[hit.all(axis=1)]

    return ds.map_batches(filt, batch_format="pandas", batch_size=None)


# --------------------------------------------------- Count-Min sketch


def _cms_positions(keys, depth: int, width: int) -> np.ndarray:
    """Counter positions, one row of the sketch per md5 seed: position =
    int(md5(f"{row}|{key}").hexdigest()[:8], 16) % width. md5 is chosen over
    xxh64 DELIBERATELY — the identical derivation is expressible in ANSI SQL
    (``CAST(('0x' || substr(md5(seed || '|' || key), 1, 8)) AS BIGINT) %
    width``), which is what lets a DuckDB oracle certify the whole sketch
    end-to-end (the relops.sample_hash / split_assign md5-parity pattern).
    Called on DISTINCT keys only (post-combiner), never per row."""
    import hashlib

    out = np.empty((depth, len(keys)), dtype=np.int64)
    for d in range(depth):
        pre = f"{d}|"
        out[d] = [
            int(hashlib.md5((pre + str(k)).encode()).hexdigest()[:8], 16) % width
            for k in keys
        ]
    return out


def count_min_counts(
    ds: rd.Dataset,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    out: str = "est",
) -> pd.DataFrame:
    """Count-Min sketch frequency estimates (Cormode & Muthukrishnan 2005):
    each batch pre-aggregates exact (key, count) partials (the combiner) and
    folds them into one depth×width int64 counter grid with weighted adds;
    grids merge by elementwise SUM — associative, commutative, order-free —
    through a tree reduce, so shuffle volume is one fixed-size blob per
    block, independent of row count AND of the key domain (the property that
    makes CMS the 100-TB path when even Misra-Gries' k counters per key
    domain is too wide). Point estimate = min over rows of the counter at
    the key's md5 positions; one-sided error (est >= true always,
    P[est > true + eps*N] <= (1/2)^depth at width = e/eps).

    Returns (key, n, est) for every distinct key — the exact side is a
    bounded preagg_group_sum whose driver materialization is the key DOMAIN,
    not the row count (the same bound any point-query consumer needs)."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False).size()
        grid = np.zeros((depth, width), dtype=np.int64)
        if len(g):
            pos = _cms_positions(g.index.to_numpy(), depth, width)
            for d in range(depth):
                np.add.at(grid[d], pos[d], g.to_numpy())
        return pd.DataFrame({"__cms": [grid.tobytes()]})

    @ray.remote
    def add_merge(*blobs) -> bytes:
        acc = np.zeros(depth * width, dtype=np.int64)
        for b in blobs:
            t = b if isinstance(b, (bytes, bytearray)) else b["__cms"][0].as_py()
            acc += np.frombuffer(t, dtype=np.int64)
        return acc.tobytes()

    refs = list(
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pandas", batch_size=None)
        .to_arrow_refs()
    )
    fan = 16
    while len(refs) > fan:
        refs = [add_merge.remote(*refs[i : i + fan]) for i in range(0, len(refs), fan)]
    grid = np.frombuffer(ray.get(add_merge.remote(*refs)), dtype=np.int64).reshape(
        depth, width
    )

    exact = relops.preagg_group_sum(
        ds.select_columns([key_col]), [key_col], count_as="n"
    ).to_pandas()  # bounded by the key domain (the point-query list), not rows
    pos = _cms_positions(exact[key_col].to_numpy(), depth, width)
    exact[out] = grid[np.arange(depth)[:, None], pos].min(axis=0).astype("int64")
    exact["n"] = exact["n"].astype("int64")
    return exact.sort_values(key_col, kind="mergesort").reset_index(drop=True)
