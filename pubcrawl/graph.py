"""Distributed graph operators over edge-list Datasets.

The web-scale counterpart of the crawl engine's link discovery: once a crawl
has produced a link graph, ranking / degree analytics over it are wide
operations that must be expressed as explicit key-hash shuffles — the same
machinery as relops.hash_partition_apply and dedup.min_label_propagation.

PageRank here is textbook power iteration (Page et al. 1999), shaped for Ray
Data:

- graph state ((id, rank, deg)) and edges are co-partitioned by key-hash per
  iteration — 2 shuffle waves/iteration, no driver-side tables;
- the driver only ever holds two scalars: N (node count, once) and the
  dangling-mass sum (one float per iteration, via a tiny partial-sum
  aggregate) — the same driver contract as min_label_propagation's fixpoint
  probe;
- float determinism: for a FIXED partitioning the reduction order is fixed,
  so reruns are bit-identical; across different partitionings results agree
  to float tolerance (asserted vs a dense numpy oracle in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from . import relops


def _scalar_sum(ds: rd.Dataset, col: str) -> float:
    """Sum one numeric column to a driver scalar via per-block partials."""
    part = ds.map_batches(
        lambda df: pd.DataFrame({"s": [float(df[col].sum())]}),
        batch_format="pandas", batch_size=None,
    ).to_pandas()
    return float(part["s"].sum()) if len(part) else 0.0


def pagerank(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    n_partitions: int | None = None,
    dangling: bool = True,
    reset_id: int | None = None,
) -> rd.Dataset:
    """PageRank over an integer-id edge list → Dataset of (id, rank).

    Update per iteration (handling dangling nodes by spreading their mass
    uniformly, the standard correction):

        rank'(v) = (1-d)/N + d·(dangling/N + Σ_{u→v} rank(u)/deg(u))

    ``reset_id`` switches to PERSONALIZED PageRank (random walk with
    restart): all initial mass and the whole teleport term concentrate on
    that one node — rank'(v) = [v==r]·((1-d) + d·dangling) + d·Σ msgs —
    instead of spreading 1/N. The plan is unchanged; only the base term
    moves from a global scalar to a one-node bonus.

    Plan per iteration: (1) dangling = Σ rank over deg==0 nodes (per-block
    partial sums, ONE float to the driver); (2) contributions: edges and
    state co-partition by src — each partition emits (dst, rank/deg)
    messages; (3) new state: messages and state co-partition by id — each
    partition sums incoming messages and applies the base term, carrying deg
    forward. Multi-edges each carry a contribution (multigraph semantics,
    matching the dense oracle in tests)."""
    state = _init_state(edges, src, dst, n_partitions)
    n_nodes = state.count()
    base_nodes = float(n_nodes) if n_nodes else 1.0

    # initial rank: 1/N each, or all mass on the reset node (personalized)
    if reset_id is None:
        def init(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(rank=np.float64(1.0 / base_nodes))
    else:
        def init(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                rank=np.where(df["id"].to_numpy() == reset_id, 1.0, 0.0))
    state = state.map_batches(init, batch_format="pandas",
                              batch_size=None).materialize()

    # BOTH union sides carry the identical column set (zero-filled where the
    # side has no value): a mixed-side pandas concat would otherwise
    # NaN-promote the absent int64 columns to float64, and 64-bit node ids
    # (xxh64 hashes) above 2^53 silently lose low bits in the round-trip —
    # messages would then address nonexistent ids and vanish
    e = edges.map_batches(
        lambda df: pd.DataFrame(
            {"__k": df[src], "__dst": df[dst],
             "rank": np.float64(0.0), "deg": np.int64(0), "__side": np.int8(0)}
        ),
        batch_format="pandas", batch_size=None,
    ).materialize()  # edges are reused every iteration

    if n_partitions is None:
        # size ONCE from the (materialized) edge count: per-iteration
        # auto-counting would add a task wave per shuffle per iteration
        n_partitions = relops.auto_partitions(relops._count_refs(e.to_arrow_refs()))

    for _ in range(iters):
        if dangling:
            d_mass = _scalar_sum(
                state.map_batches(
                    lambda df: df[df["deg"] == 0][["rank"]], batch_format="pandas",
                    batch_size=None,
                ),
                "rank",
            )
        else:
            # caller vouches the graph has no zero-out-degree node (e.g. a
            # symmetric edge list): the per-iteration scalar-gather wave is
            # pure overhead because the sum is identically 0.0 — identical
            # result, one task wave fewer per iteration
            d_mass = 0.0
        if reset_id is None:
            base, bonus = (1.0 - damping) / base_nodes \
                + damping * d_mass / base_nodes, 0.0
        else:
            # personalized: the entire teleport (restart + dangling) mass
            # lands on the reset node, nothing on the rest
            base, bonus = 0.0, (1.0 - damping) + damping * d_mass

        s_tag = state.map_batches(
            lambda df: pd.DataFrame(
                {"__k": df["id"], "__dst": np.int64(0),
                 "rank": df["rank"], "deg": df["deg"], "__side": np.int8(1)}
            ),
            batch_format="pandas", batch_size=None,
        )

        def contribs(df: pd.DataFrame) -> pd.DataFrame:
            ed = df[df["__side"] == 0][["__k", "__dst"]]
            st = df[df["__side"] == 1][["__k", "rank", "deg"]]
            st = st[st["deg"] > 0]
            m = ed.merge(st, on="__k", how="inner")
            if not len(m):
                return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                     "msg": pd.Series([], dtype="float64")})
            assert m["__dst"].dtype == np.int64  # schema-uniform union upholds this
            return pd.DataFrame(
                {"id": m["__dst"].to_numpy(),
                 "msg": m["rank"].to_numpy() / m["deg"].to_numpy()}
            )

        msgs = relops.hash_partition_apply(
            e.union(s_tag), ["__k"], contribs, n_partitions=n_partitions
        )

        empty_msg = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                  "msg": pd.Series([], dtype="float64"),
                                  "deg": pd.Series([], dtype="int64"),
                                  "__side": pd.Series([], dtype="int8")})
        m_tag = msgs.map_batches(
            lambda df: df.assign(deg=np.int64(0), __side=np.int8(0))
            if "id" in df.columns else empty_msg.copy(),
            batch_format="pandas", batch_size=None,
        )
        st_tag = state.map_batches(
            lambda df: pd.DataFrame({"id": df["id"], "msg": np.float64(0.0),
                                     "deg": df["deg"], "__side": np.int8(1)}),
            batch_format="pandas", batch_size=None,
        )

        def apply_rank(df: pd.DataFrame) -> pd.DataFrame:
            # every message id is a node id, so a partition with messages
            # always has its state rows too; the reverse may not hold
            st = df[df["__side"] == 1][["id", "deg"]]
            mm = df[df["__side"] == 0]
            if len(mm):
                # deterministic reduction: sum message values in id order
                mm = mm.sort_values(["id", "msg"], kind="mergesort")
                acc = mm.groupby("id", sort=False)["msg"].sum()
                s = st.merge(acc.rename("in_msg"), left_on="id",
                             right_index=True, how="left")
            else:
                s = st.assign(in_msg=np.nan)
            s["rank"] = base + damping * s["in_msg"].fillna(0.0).to_numpy()
            if reset_id is not None:
                s["rank"] += np.where(s["id"].to_numpy() == reset_id, bonus, 0.0)
            return s[["id", "deg", "rank"]].astype({"deg": "int64"})

        state = relops.hash_partition_apply(
            m_tag.union(st_tag), ["id"], apply_rank, n_partitions=n_partitions
        ).materialize()

    return state.map_batches(
        lambda df: df[["id", "rank"]], batch_format="pandas", batch_size=None
    )


def _init_state(
    edges: rd.Dataset, src: str, dst: str, n_partitions: int | None
) -> rd.Dataset:
    """(id, deg) for every node: out-degree per src, 0 for pure sinks —
    combiner partials per batch, one key-hash shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"id": np.concatenate([df[src].to_numpy(), df[dst].to_numpy()]),
             "deg": np.concatenate(
                 [np.ones(len(df), dtype=np.int64), np.zeros(len(df), dtype=np.int64)]
             )}
        )
        return d.groupby("id", as_index=False, sort=False).sum()

    partials = edges.map_batches(partial, batch_format="pandas", batch_size=None)
    return relops.hash_partition_apply(
        partials,
        ["id"],
        lambda df: df.groupby("id", as_index=False, sort=False)["deg"].sum(),
        n_partitions=n_partitions,
    )


def pagerank_dense_oracle(
    edges_df: pd.DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> pd.DataFrame:
    """Sequential dense-numpy reference for tests: identical update rule."""
    ids = np.unique(np.concatenate([edges_df[src].to_numpy(), edges_df[dst].to_numpy()]))
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    si = edges_df[src].map(idx).to_numpy()
    di = edges_df[dst].map(idx).to_numpy()
    deg = np.bincount(si, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / deg[si])
        r = (1 - damping) / n + damping * (dangling / n + contrib)
    return pd.DataFrame({"id": ids, "rank": r})


def triangle_counts(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int | None = None,
) -> rd.Dataset:
    """Per-node triangle participation counts — the degree-ordered wedge
    algorithm (Cohen 2009 / Suri & Vassilvitskii 2011 "node-iterator++"):

      1. canonicalize + distinct undirected edges (one key shuffle),
      2. degrees per node (combiner aggregate — the node table, orders of
         magnitude smaller than the edge table, is the ONLY driver-side
         materialization; at trillion-edge scale swap the broadcast rank map
         for a co-partitioned hash_join on each endpoint),
      3. orient every edge low-rank → high-rank where rank = (degree, id):
         out-degrees are then bounded by O(√m), so total wedge volume is
         O(m^1.5) even on power-law graphs — THE property that makes
         triangle counting feasible at scale (id-ordering alone blows up on
         one hub node),
      4. wedges per source (co-partitioned group apply): rank-sorted
         out-neighbor pairs (a, b) — each candidate triangle generated
         exactly once, at its lowest-rank vertex,
      5. close: semi join wedge (a, b) against the oriented edge set on a
         packed int64 key (ids must fit 31 bits; assert-guarded),
      6. each closed wedge emits its three vertices; a combiner count yields
         (id, n_tri) for every triangle-participating node.
    """
    import ray

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        u = df[src].to_numpy()
        v = df[dst].to_numpy()
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        return pd.DataFrame({"u": lo[keep], "v": hi[keep]})

    e = relops.distinct(
        edges.map_batches(canon, batch_format="pandas", batch_size=None), ["u", "v"]
    )

    ends = e.map_batches(
        lambda df: pd.DataFrame(
            {"id": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()])}
        ),
        batch_format="pandas", batch_size=None,
    )
    deg = relops.preagg_group_sum(ends, ["id"], count_as="deg").to_pandas()
    ids = deg["id"].to_numpy()
    order = np.lexsort((ids, deg["deg"].to_numpy()))
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = np.arange(len(ids))
    pack = np.int64(ids.max()) + 1 if len(ids) else np.int64(1)
    assert pack < (1 << 31), "packed closing-edge key needs ids < 2^31"
    ref = ray.put(pd.Series(rank, index=ids))

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        ru = r.reindex(df["u"].to_numpy()).to_numpy()
        rv = r.reindex(df["v"].to_numpy()).to_numpy()
        swap = ru > rv
        x = np.where(swap, df["v"], df["u"]).astype(np.int64)
        y = np.where(swap, df["u"], df["v"]).astype(np.int64)
        return pd.DataFrame({"x": x, "y": y, "ry": np.where(swap, ru, rv)})

    oe = e.map_batches(orient, batch_format="pandas", batch_size=None)

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for x, g in df.groupby("x", sort=False):
            nb = g.sort_values("ry")["y"].to_numpy()
            d = len(nb)
            if d < 2:
                continue
            i, j = np.triu_indices(d, k=1)
            frames.append(pd.DataFrame({"x": np.int64(x), "a": nb[i], "b": nb[j]}))
        if not frames:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("x", "a", "b")})
        return pd.concat(frames, ignore_index=True)

    wd = relops.hash_partition_apply(oe, ["x"], wedges, n_partitions=n_partitions)
    wd = wd.map_batches(
        lambda df: df.assign(__k=df["a"].to_numpy() * pack + df["b"].to_numpy()),
        batch_format="pandas", batch_size=None,
    )
    ek = oe.map_batches(
        lambda df: pd.DataFrame({"__k": df["x"].to_numpy() * pack + df["y"].to_numpy()}),
        batch_format="pandas", batch_size=None,
    )
    tri = relops.semi_join_partitioned(wd, ek, on="__k", n_partitions=n_partitions)

    tri_ids = tri.map_batches(
        lambda df: pd.DataFrame(
            {"id": np.concatenate([df["x"].to_numpy(), df["a"].to_numpy(),
                                   df["b"].to_numpy()]).astype(np.int64)}
        ),
        batch_format="pandas", batch_size=None,
    )
    return relops.preagg_group_sum(tri_ids, ["id"], count_as="n_tri")


# ------------------------------------------------------ HITS hubs / authorities


def hits(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    n_partitions: int | None = None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """HITS hubs & authorities (Kleinberg 1999, the bipartite counterpart of
    :func:`pagerank`) over an edge list → (hubs (src, h), auths (dst, a)).

    Per iteration, two half-steps, each a co-partitioned message wave:
    ``a(i) = Σ_{u→i} h(u)`` (edges ⋈ hubs by src, combiner group-sum by
    dst), L2-normalize; then ``h(u) = Σ_{u→i} a(i)`` symmetrically. The
    driver only ever holds one scalar per half-step (the squared-norm
    partial sum — pagerank's dangling-mass contract); state and messages
    move as (id, score) rows, never the graph.

    Exact-replay protocol (SQL-oracle-ready, the kmeans/pagerank recipe):
    scores are quantized to 1e-9 after every normalize, so both engines
    start each half-step from identical float64 values; init h0 = 1.0 on
    every distinct src. Returned scores are exact multiples of 1e-9.

    Plan per half-step (pagerank's fused contribs shape, not a generic
    join + group-sum composition): edges are tagged ONCE per direction
    before the loop (uniform int64/float64 schema on both union sides — the
    pagerank NaN-promotion discipline); state tags lazily and
    co-partitions with the pre-tagged edges by the sending endpoint; the
    merge task joins AND emits per-receiver PARTIAL sums, so the second
    shuffle moves one row per (partition, receiver); a final co-partitioned
    sum yields the raw scores, one scalar (the squared norm) reaches the
    driver, and the quantize map stays lazy (consumed once by the next
    tag)."""
    e = edges.select_columns([src, dst]).materialize()
    if n_partitions is None:
        n_partitions = relops.auto_partitions(relops._count_refs(e.to_arrow_refs()))

    def tag_edges(k: str, o: str) -> rd.Dataset:
        return e.map_batches(
            lambda df, _k=k, _o=o: pd.DataFrame(
                {"__k": df[_k].to_numpy(np.int64), "__o": df[_o].to_numpy(np.int64),
                 "__v": np.float64(0.0), "__side": np.int8(0)}
            ),
            batch_format="pandas", batch_size=None,
        ).materialize()  # reused every iteration

    e_by_src = tag_edges(src, dst)
    e_by_dst = tag_edges(dst, src)

    def tag_state(state: rd.Dataset, key: str, val: str) -> rd.Dataset:
        return state.map_batches(
            lambda df, _k=key, _v=val: pd.DataFrame(
                {"__k": df[_k].to_numpy(np.int64), "__o": np.int64(0),
                 "__v": df[_v].to_numpy(np.float64), "__side": np.int8(1)}
            ),
            batch_format="pandas", batch_size=None,
        )

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        ed = df.loc[df["__side"] == 0, ["__k", "__o"]]
        st = df.loc[df["__side"] == 1, ["__k", "__v"]]
        m = ed.merge(st, on="__k", how="inner")
        p = m.groupby("__o", as_index=False, sort=False)["__v"].sum()
        return pd.DataFrame({"id": p["__o"].to_numpy(np.int64),
                             "raw": p["__v"].to_numpy(np.float64)})

    def half_step(e_tagged: rd.Dataset, state: rd.Dataset, key: str,
                  val: str) -> rd.Dataset:
        partials = relops.hash_partition_apply(
            e_tagged.union(tag_state(state, key, val)), ["__k"], fuse,
            n_partitions=n_partitions,
        )
        return relops.hash_partition_apply(
            partials, ["id"],
            lambda df: df.groupby("id", as_index=False, sort=False)["raw"].sum(),
            n_partitions=n_partitions,
        ).materialize()  # consumed twice: norm gather + quantize

    def _l2(ds: rd.Dataset) -> float:
        sq = ds.map_batches(
            lambda df: pd.DataFrame({"sq": df["raw"].to_numpy(np.float64) ** 2}),
            batch_format="pandas", batch_size=None,
        )
        return float(np.sqrt(_scalar_sum(sq, "sq")))

    def quantized(raw: rd.Dataset, out_key: str, out_val: str,
                  nrm: float) -> rd.Dataset:
        return raw.map_batches(
            lambda df, _n=nrm: pd.DataFrame(
                {out_key: df["id"].to_numpy(np.int64),
                 out_val: np.round(df["raw"].to_numpy(np.float64) / _n * 1e9) / 1e9}
            ),
            batch_format="pandas", batch_size=None,
        )

    hubs = relops.distinct(e, [src]).map_batches(
        lambda df: pd.DataFrame({src: df[src], "h": np.float64(1.0)}),
        batch_format="pandas", batch_size=None,
    ).materialize()
    auths = None
    for _ in range(iters):
        ar = half_step(e_by_src, hubs, src, "h")
        auths = quantized(ar, dst, "a", _l2(ar))
        hr = half_step(e_by_dst, auths, dst, "a")
        hubs = quantized(hr, src, "h", _l2(hr))
    return hubs, auths


# ------------------------------------------------- multi-source BFS hop distance


def bfs_hops(
    edges: rd.Dataset,
    seeds: rd.Dataset,
    hops: int,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int = 4,
) -> rd.Dataset:
    """Layered multi-source BFS over an edge list → Dataset of (id, hop) for
    every node within ``hops`` of a seed (minimum hop distance — guaranteed
    by the layering, no per-node min needed). ``seeds`` is a Dataset with an
    ``id`` column.

    This is the crawl engine's frontier-expansion loop as a reusable graph
    operator: per level, frontier keys co-partition-join the edge list,
    neighbors dedup distinct, and the visited set subtracts via the
    partitioned ANTI join — each level is three key-hash shuffles of id
    columns only (no payloads, no driver gathers; the frontier/visited
    Datasets are materialized between levels because each is consumed
    twice)."""
    e = edges.select_columns([src, dst]).materialize()
    frontier = seeds.select_columns(["id"]).materialize()

    def mk_layer(hop: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"id": df["id"].astype("int64"),
                                 "hop": np.int64(hop)})
        return fn

    visited = frontier.map_batches(mk_layer(0), batch_format="pandas",
                                   batch_size=None).materialize()
    for hop in range(1, hops + 1):
        fk = frontier.map_batches(
            lambda df: pd.DataFrame({src: df["id"]}),
            batch_format="pandas", batch_size=None,
        )
        nbr = relops.distinct(
            relops.hash_join(e, fk, on=src, left_cols=[dst], right_cols=[],
                             n_buckets=n_partitions),
            [dst],
        ).map_batches(lambda df: pd.DataFrame({"id": df[dst]}),
                      batch_format="pandas", batch_size=None)
        frontier = relops.semi_join_partitioned(
            nbr, visited.select_columns(["id"]), on="id", anti=True,
            n_partitions=n_partitions,
        ).materialize()
        visited = visited.union(
            frontier.map_batches(mk_layer(hop), batch_format="pandas",
                                 batch_size=None)
        ).materialize()
    return visited


# --------------------------------------- ALS matrix factorization (implicit, k=2)


def als_implicit(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    lam: float = 0.1,
    alpha: float = 10.0,
    n_partitions: int | None = None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Implicit-feedback alternating least squares over a bipartite
    interaction edge list (Hu/Koren/Volinsky 2008, rank k=2: every
    unobserved pair is a 0 at confidence 1, every observed pair a 1 at
    confidence 1+α) → (user factors (src, f1, f2), item factors (dst, f1,
    f2)). The confidence split is what makes the factorization informative
    — a positive-only least squares would fit the all-ones matrix and
    collapse every score to ~1.

    Each half-step solves one side's per-entity system

        (λI + YᵀY + α·Σ_{observed} y yᵀ) x = (1+α)·Σ_{observed} y

    in closed 2×2 form. YᵀY is the paper's Gram trick — the global 2×2
    over ALL fixed-side factors, a 3-float driver scalar gathered once per
    half-step (the pagerank dangling-mass contract); the observed-pair
    sums run as TWO co-partitioned waves (the :func:`hits` fused-contribs
    plan): edges pre-tagged by the fixed endpoint union the factor rows,
    the merge task joins AND emits the five PARTIAL sufficient statistics
    per solving entity, and a second co-partitioned task folds partials,
    adds ridge+Gram, solves, and e9-quantizes. Neither factor table is
    ever broadcast or gathered — both sides flow as (id, f1, f2) rows.

    Exact-replay protocol: item factors init to the integer-arithmetic tape
    ``(1.0, ((id·2654435761) mod 1000)/1000)``; factors are e9-quantized
    after every solve, so both engines start each half-step from identical
    doubles and the closed-form expression shape is shared; the ~1e-15
    relative drift from differing summation order sits far below the e9
    quantum at these factor magnitudes."""
    e = edges.select_columns([src, dst]).materialize()
    if n_partitions is None:
        n_partitions = relops.auto_partitions(relops._count_refs(e.to_arrow_refs()))

    def tag_edges(k: str, o: str) -> rd.Dataset:
        return e.map_batches(
            lambda df, _k=k, _o=o: pd.DataFrame(
                {"__k": df[_k].to_numpy(np.int64), "__o": df[_o].to_numpy(np.int64),
                 "__f1": np.float64(0.0), "__f2": np.float64(0.0),
                 "__side": np.int8(0)}
            ),
            batch_format="pandas", batch_size=None,
        ).materialize()  # reused every half-step

    e_by_dst = tag_edges(dst, src)  # user solve: join factors by item
    e_by_src = tag_edges(src, dst)  # item solve: join factors by user

    def tag_factors(state: rd.Dataset, key: str) -> rd.Dataset:
        return state.map_batches(
            lambda df, _k=key: pd.DataFrame(
                {"__k": df[_k].to_numpy(np.int64), "__o": np.int64(0),
                 "__f1": df["f1"].to_numpy(np.float64),
                 "__f2": df["f2"].to_numpy(np.float64), "__side": np.int8(1)}
            ),
            batch_format="pandas", batch_size=None,
        )

    def suffstats(df: pd.DataFrame) -> pd.DataFrame:
        ed = df.loc[df["__side"] == 0, ["__k", "__o"]]
        st = df.loc[df["__side"] == 1, ["__k", "__f1", "__f2"]]
        m = ed.merge(st, on="__k", how="inner")
        f1 = m["__f1"].to_numpy(np.float64)
        f2 = m["__f2"].to_numpy(np.float64)
        p = pd.DataFrame({
            "id": m["__o"].to_numpy(np.int64),
            "a11": f1 * f1, "a12": f1 * f2, "a22": f2 * f2,
            "b1": f1, "b2": f2,
        })
        return p.groupby("id", as_index=False, sort=False).sum()

    def make_solve(gram: tuple[float, float, float]):
        g11, g12, g22 = gram

        def solve(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("id", as_index=False, sort=False).sum()
            a11 = lam + g11 + alpha * g["a11"].to_numpy(np.float64)
            a12 = g12 + alpha * g["a12"].to_numpy(np.float64)
            a22 = lam + g22 + alpha * g["a22"].to_numpy(np.float64)
            b1 = (1.0 + alpha) * g["b1"].to_numpy(np.float64)
            b2 = (1.0 + alpha) * g["b2"].to_numpy(np.float64)
            det = a11 * a22 - a12 * a12
            return pd.DataFrame({
                "id": g["id"].to_numpy(np.int64),
                "f1": np.round((b1 * a22 - b2 * a12) / det * 1e9) / 1e9,
                "f2": np.round((b2 * a11 - b1 * a12) / det * 1e9) / 1e9,
            })

        return solve

    def gram_of(factors: rd.Dataset) -> tuple[float, float, float]:
        p = factors.map_batches(
            lambda df: pd.DataFrame(
                {"g11": [float((df["f1"].to_numpy(np.float64) ** 2).sum())],
                 "g12": [float((df["f1"].to_numpy(np.float64)
                                * df["f2"].to_numpy(np.float64)).sum())],
                 "g22": [float((df["f2"].to_numpy(np.float64) ** 2).sum())]}
            ),
            batch_format="pandas", batch_size=None,
        ).to_pandas()  # 3 floats per block
        return (float(p["g11"].sum()), float(p["g12"].sum()),
                float(p["g22"].sum()))

    def half_step(e_tagged: rd.Dataset, factors: rd.Dataset, fkey: str,
                  out_key: str) -> rd.Dataset:
        gram = gram_of(factors)
        partials = relops.hash_partition_apply(
            e_tagged.union(tag_factors(factors, fkey)), ["__k"], suffstats,
            n_partitions=n_partitions,
        )
        solved = relops.hash_partition_apply(
            partials, ["id"], make_solve(gram), n_partitions=n_partitions,
        )
        return solved.map_batches(
            lambda df, _k=out_key: pd.DataFrame(
                {_k: df["id"].to_numpy(np.int64), "f1": df["f1"],
                 "f2": df["f2"]}
            ),
            batch_format="pandas", batch_size=None,
        ).materialize()  # consumed by the next half-step AND the caller

    item_f = relops.distinct(e, [dst]).map_batches(
        lambda df: pd.DataFrame({
            dst: df[dst].to_numpy(np.int64),
            "f1": np.float64(1.0),
            "f2": ((df[dst].to_numpy(np.int64) * 2654435761) % 1000) / 1000.0,
        }),
        batch_format="pandas", batch_size=None,
    ).materialize()
    user_f = None
    for _ in range(iters):
        user_f = half_step(e_by_dst, item_f, dst, src)
        item_f = half_step(e_by_src, user_f, src, dst)
    return user_f, item_f


# ------------------------------------------------------------ k-core peeling


def kcore_peel(
    edges: rd.Dataset,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int = 4,
) -> rd.Dataset:
    """Fixed-round k-core peeling over a symmetric edge list → Dataset of
    (id, deg) for nodes surviving ``rounds`` prune passes (Seidman 1983;
    Batagelj-Zaversnik's iterative formulation, shaped for Ray Data): each
    round keeps only edges whose BOTH endpoints are alive (two partitioned
    SEMI joins — the anti-join machinery run positively), recounts degrees
    with the group-count combiner, and drops nodes below k. A fixed round
    budget instead of a convergence probe keeps the computation
    deterministic and SQL-replayable — once the peel has converged the
    remaining rounds are no-ops in both engines, and before convergence
    both engines replay the identical prefix."""
    e = edges.select_columns([src, dst]).materialize()
    deg = relops.preagg_group_sum(e, [src], count_as="deg",
                                  n_partitions=n_partitions)
    alive = deg.map_batches(
        lambda df, _k=k: df.loc[df["deg"] >= _k, [src, "deg"]]
        .rename(columns={src: "id"}),
        batch_format="pandas", batch_size=None,
    ).materialize()
    for _ in range(rounds):
        a_src = alive.map_batches(
            lambda df: pd.DataFrame({src: df["id"]}),
            batch_format="pandas", batch_size=None)
        a_dst = alive.map_batches(
            lambda df: pd.DataFrame({dst: df["id"]}),
            batch_format="pandas", batch_size=None)
        ea = relops.semi_join_partitioned(
            relops.semi_join_partitioned(e, a_src, on=src,
                                         n_partitions=n_partitions),
            a_dst, on=dst, n_partitions=n_partitions)
        deg = relops.preagg_group_sum(ea, [src], count_as="deg",
                                      n_partitions=n_partitions)
        alive = deg.map_batches(
            lambda df, _k=k: df.loc[df["deg"] >= _k, [src, "deg"]]
            .rename(columns={src: "id"}),
            batch_format="pandas", batch_size=None,
        ).materialize()  # consumed by both next-round semi joins
    return alive


# ------------------------------------------- weighted SSSP (Bellman-Ford rounds)


def sssp_rounds(
    edges: rd.Dataset,
    seed_mod: int = 101,
    weight_mod: int = 9,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int = 4,
) -> rd.Dataset:
    """Multi-source weighted single-source-shortest-paths via ``rounds``
    synchronous Bellman-Ford relaxation waves → (id, dist) for every node
    reached within that many hops (distances are exact for paths of ≤
    ``rounds`` edges — the distributed Δ-free Bellman-Ford of Lipton et al.
    / the Pregel SSSP example, integer-exact end to end).

    Seeds are the nodes with ``id % seed_mod == 0`` at distance 0; the edge
    weight is the pure key function ``(src + dst) % weight_mod + 1``, so a
    relaxation wave ships only (id, dist) int64 pairs — weights rematerialize
    from the keys on the consuming side and are never stored or shuffled
    (the same key-column-only discipline as the crawl frontier). Per round:
    one co-partitioned dist⋈edges join emits candidate distances, a
    per-batch min combiner prunes them to one row per (block × node), and a
    key-hash min-fold against the current state keeps the smaller of
    old/new — two shuffles per round, no driver-side state."""
    e = edges.select_columns([src, dst]).materialize()

    seeds = relops.distinct(
        e.map_batches(
            lambda df, _m=seed_mod: pd.DataFrame(
                {"id": df.loc[df[src] % _m == 0, src].to_numpy(np.int64)}),
            batch_format="pandas", batch_size=None),
        ["id"],
    ).map_batches(
        lambda df: pd.DataFrame({"id": df["id"].to_numpy(np.int64),
                                 "dist": np.zeros(len(df), dtype=np.int64)}),
        batch_format="pandas", batch_size=None,
    )
    dist = seeds.materialize()

    for _ in range(rounds):
        dsrc = dist.map_batches(
            lambda df: pd.DataFrame({src: df["id"].to_numpy(np.int64),
                                     "d": df["dist"].to_numpy(np.int64)}),
            batch_format="pandas", batch_size=None)
        msgs = relops.hash_join(e, dsrc, on=src, left_cols=[dst],
                                right_cols=["d"], n_buckets=n_partitions)

        def relax(df: pd.DataFrame, _m=weight_mod) -> pd.DataFrame:
            s = df[src].to_numpy(np.int64)
            t = df[dst].to_numpy(np.int64)
            cand = df["d"].to_numpy(np.int64) + (s + t) % _m + 1
            p = pd.DataFrame({"id": t, "dist": cand})
            return p.groupby("id", as_index=False, sort=False)["dist"].min()

        partial = msgs.map_batches(relax, batch_format="pandas", batch_size=None)

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("id", as_index=False, sort=False)["dist"].min()
            return pd.DataFrame({"id": g["id"].to_numpy(np.int64),
                                 "dist": g["dist"].to_numpy(np.int64)})

        dist = relops.hash_partition_apply(
            dist.union(partial), ["id"], fold, n_partitions=n_partitions
        ).materialize()
    return dist
