"""Similarity search over embedding columns (list<float>).

- ``brute_topk`` — baseline exact cosine top-k: the query matrix is broadcast
  once (ray.put); each batch does one numpy matmul and emits its local top-k
  PARTIALS; a tiny final reduce merges them. The shuffle moves k rows per
  (query, batch), never the corpus.
- ``cosine_pairs`` — all-pairs near-dup above a threshold: full normalized
  matrix broadcast (N×d float32 — 12.8 MB at N=50k,d=64), per-batch
  block×matrix matmul. Quadratic flops but linear object movement.
- ``ivf_topk`` — the scale path: seeded k-means (driver-side on a sample,
  deterministic) → per-batch cluster assignment → search only the nprobe
  closest centroids' inverted lists (groupby cluster). Approximate; recall
  controlled by nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _stack(df_emb) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in df_emb])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k: → (query_id, vec_id, cos_sim) with deterministic
    tiebreak (cos desc, vec_id asc). cos rounded to 6 dp."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    class Score:
        def __init__(self):
            self.q, self.qids = ray.get(q_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_stack(df[emb_col]))
            sims = m @ self.q.T  # (batch, nq)
            ids = df[id_col].to_numpy()
            out = []
            for qi, qid in enumerate(self.qids):
                s = sims[:, qi]
                mask = np.ones(len(ids), dtype=bool)
                if exclude_self:
                    mask &= ids != qid
                order = np.lexsort((ids[mask], -s[mask]))[:k]  # local top-k partial
                sel = np.flatnonzero(mask)[order]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, id_col: ids[sel], "cos_sim": s[sel]}
                    )
                )
            return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
                {"query_id": [], id_col: [], "cos_sim": []}
            )

    partials = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    out = (
        partials.sort_values(["query_id", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False, sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out


def cosine_pairs(
    ds: rd.Dataset,
    threshold: float = 0.985,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """All-pairs cosine >= threshold (id_a < id_b), near-dup detection."""
    full = ds.select_columns([id_col, emb_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    mat = _normalize(_stack(full[emb_col])).astype(np.float64)
    m_ref = ray.put((ids_all, mat))

    class Pairs:
        def __init__(self):
            self.ids, self.mat = ray.get(m_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            block = _normalize(_stack(df[emb_col]))
            bids = df[id_col].to_numpy()
            sims = block @ self.mat.T
            bi, fj = np.nonzero(sims >= threshold)
            a, b = bids[bi], self.ids[fj]
            keep = a < b
            return pd.DataFrame(
                {
                    "id_a": a[keep],
                    "id_b": b[keep],
                    "cos_sim": np.round(sims[bi, fj][keep], 6),
                }
            )

    out = ds.map_batches(Pairs, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Deterministic seeded Lloyd's k-means on a (driver-side) sample."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=n_clusters, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            pts = sample[assign == c]
            if len(pts):
                cents[c] = pts.mean(0)
    return cents


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_limit: int = 4096,
) -> pd.DataFrame:
    """IVF approximate top-k: centroids from a deterministic sample; each
    batch scores only rows whose cluster is among the query's nprobe nearest
    centroids — at scale the inverted lists become the partitioning key."""
    sample = _stack(ds.limit(sample_limit).to_pandas()[emb_col])
    cents = _normalize(kmeans_fit(_normalize(sample), n_clusters))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qn, np.asarray(query_ids), cents, probes))

    class Score:
        def __init__(self):
            self.q, self.qids, self.cents, self.probes = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_stack(df[emb_col]))
            ids = df[id_col].to_numpy()
            clusters = (m @ self.cents.T).argmax(1)
            out = []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(clusters, self.probes[qi]) & (ids != qid)
                if not mask.any():
                    continue
                s = m[mask] @ self.q[qi]
                sub = ids[mask]
                order = np.lexsort((sub, -s))[:k]
                out.append(pd.DataFrame({"query_id": qid, id_col: sub[order], "cos_sim": s[order]}))
            return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
                {"query_id": [], id_col: [], "cos_sim": []}
            )

    partials = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    out = (
        partials.sort_values(["query_id", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False, sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out
