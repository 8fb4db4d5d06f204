"""Iterative graph propagation — fixed-point PageRank over an edge table.

Second iterative-dataflow family next to connected components
(dedup.connected_components): where CC converges by pointer jumping in
O(log d) rounds, PageRank runs a FIXED number of power-iteration
rounds, each one join + one aggregation — the canonical "iterate a
DataFrame under localCheckpoint" pattern.

Determinism: ranks are kept in INTEGER micro-units and every division
is an explicit floor, so the result is a pure function of the edge
multiset — no float summation order anywhere.  That is what makes the
cross-engine gate exact (the DuckDB oracle unrolls the same iterations)
and, more importantly at scale, what makes re-runs/checkpoint-resumes
byte-identical:

    contrib(u)   = floor(rank(u) / outdeg(u))
    rank'(v)     = R0*(1-d) + floor(d_num * sum(contrib(u->v)) / d_den)

with R0 = 1_000_000 micro-units, d = d_num/d_den = 85/100.  Dangling
nodes (no out-edges) keep their mass out of circulation, the standard
simplification when ranks are used for RELATIVE ordering (dedup rep
selection, crawl prioritization) rather than as a probability vector.

Scale shape per round: one shuffle for the contribution join on src
(the rank table is usually << edges — broadcast when it fits), one
shuffle for the groupBy dst.  localCheckpoint after each round caps the
lineage at O(1) plans instead of O(iterations) (the CC lesson:
dedup.py's pointer-jumping loop).  Edges are never mutated, so a
bucketed/pre-partitioned edge table amortizes its shuffle across all
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Fixed-iteration integer PageRank.  Returns (node, rank_micro)
    for every node appearing as src or dst; rank_micro is in
    micro-units of the damped random-surfer score (initial rank =
    1_000_000)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).filter(F.col(src).isNotNull() & F.col(dst).isNotNull())

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    base = MICRO * (damping_den - damping_num) // damping_den
    ranks = nodes.select("node", F.lit(MICRO).cast("long").alias("rank"))

    for it in range(iterations):
        contrib = (
            e.join(outdeg, on="src")
            .join(
                ranks.select(
                    F.col("node").alias("src"), F.col("rank").alias("r")
                ),
                on="src",
            )
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("r") / F.col("outdeg")).alias("contrib"),
            )
        )
        summed = contrib.groupBy("node").agg(
            F.sum("contrib").alias("s")
        )
        ranks = (
            nodes.join(summed, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.coalesce(F.col("s"), F.lit(0))
                        * damping_num
                        / damping_den
                    )
                ).cast("long").alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            # cap lineage: each round's plan would otherwise nest the
            # previous round's join tree (CC precedent, dedup.py)
            ranks = ranks.localCheckpoint(eager=False)

    return ranks.select("node", F.col("rank").alias("rank_micro"))


def _popcount64(v):
    """Vectorized SWAR popcount over a uint64 ndarray."""
    import numpy as np

    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _triangle_count_bitset(canon: DataFrame, n_mat: int, n_edges: int):
    """Dense-small-domain fast path: integer node ids in [0, n_mat).

    Every triangle {a<b<c} is counted exactly once at its edge (a, b)
    as a 1-bit in out(a) AND out(b), where out(x) is the bitset of
    x's HIGHER-id neighbors — the id order is an acyclic orientation,
    so no wedge table ever materializes.  The adjacency is built
    distributedly (one skinny shuffle of (a, b) pairs, one bitset row
    per source node), assembled on the driver (n_mat * n_mat / 8
    bytes, bounded by the caller's threshold — e.g. 50 MB at 20k
    nodes), broadcast once, and the counting pass is a shuffle-free
    scan of the edges: numpy AND + popcount per edge row.  Replaces
    the wedge-join plan that generates sum(outdeg^2) rows — ~1e9 at a
    6M-edge 20k-node graph — with O(E * n/64) word operations."""
    import numpy as np
    import pandas as pd

    spark = canon.sparkSession
    m_words = (n_mat + 63) // 64

    def pack(batches):
        rows: dict[int, "np.ndarray"] = {}
        one = np.uint64(1)
        for pdf in batches:
            if pdf.empty:
                continue
            a = pdf["a"].to_numpy(dtype=np.int64)
            b = pdf["b"].to_numpy(dtype=np.int64)
            order = np.argsort(a, kind="stable")
            a, b = a[order], b[order]
            starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
            bounds = np.r_[starts, len(a)]
            for i, s in enumerate(starts):
                e = bounds[i + 1]
                u = int(a[s])
                row = rows.get(u)
                if row is None:
                    row = rows[u] = np.zeros(m_words, dtype=np.uint64)
                bs = b[s:e].astype(np.uint64)
                np.bitwise_or.at(row, bs >> 6, one << (bs & np.uint64(63)))
        if rows:
            yield pd.DataFrame(
                {
                    "a": list(rows.keys()),
                    "bits": [r.tobytes() for r in rows.values()],
                }
            )

    p = spark.sparkContext.defaultParallelism
    packed = (
        canon.repartition(p, "a")
        .mapInPandas(pack, schema="a long, bits binary")
        .collect()
    )
    adj = np.zeros((n_mat, m_words), dtype=np.uint64)
    for r in packed:
        adj[r["a"]] = np.frombuffer(r["bits"], dtype=np.uint64)
    bc = spark.sparkContext.broadcast(adj.tobytes())

    # bound the per-batch working set: an Arrow batch can be 100k+
    # rows, and mat[a] & mat[b] plus the SWAR temporaries would then
    # allocate gigabytes per task — slice the edge batch so each
    # popcount round touches a few MB
    chunk = max(1, (4 << 20) // (m_words * 8))

    def count(batches):
        mat = np.frombuffer(bc.value, dtype=np.uint64).reshape(
            n_mat, m_words
        )
        total = 0
        for pdf in batches:
            if pdf.empty:
                continue
            a = pdf["a"].to_numpy(dtype=np.int64)
            b = pdf["b"].to_numpy(dtype=np.int64)
            for s in range(0, len(a), chunk):
                w = mat[a[s:s + chunk]]
                np.bitwise_and(w, mat[b[s:s + chunk]], out=w)
                total += int(_popcount64(w).sum())
        yield pd.DataFrame({"t": [total]})

    tri = canon.mapInPandas(count, schema="t long").agg(
        F.sum("t")
    ).first()[0]
    return spark.createDataFrame(
        [(n_edges, int(tri or 0))], "n_edges long, n_triangles long"
    )


# driver-assembled adjacency cap: n^2/8 bytes — 128 MiB at 32k nodes
_BITSET_MAX_NODES = 32768


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact global triangle count over an undirected simple graph —
    the second classic graph primitive beside pagerank (clustering
    coefficient numerator, community-density signal, spam/bot-net
    detection on link graphs).

    Input edges are canonicalized (undirected: (a,b)==(b,a); self
    loops and duplicates dropped).  Returns ONE row: (n_edges,
    n_triangles).

    Scale shape — degree orientation (the standard skew bound, cf.
    Suri & Vassilvitskii 2011 "Counting triangles and the curse of
    the last reducer"): each edge is directed from its LOWER-degree
    endpoint (ties by id), so a celebrity node of degree d generates
    wedges only at its low-degree neighbors — per-node wedge work is
    bounded by min(deg)^2 per neighbor rather than d^2 at the hub.
    Two hash equi-joins: wedges from a shared oriented source, then a
    semi-check that the closing edge exists in the canonical set.  No
    collect, no cartesian; every join key is an id."""
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    # localCheckpoint: canon feeds FOUR consumers (degree table, the
    # orientation, the closing-edge semi-join, and the edge count) —
    # without it each consumer re-runs the scan + distinct shuffle
    canon = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    # small-integer node domain -> broadcast-bitset fast path: ids are
    # the matrix index directly (no relabeling pass), the id order is
    # the acyclic orientation, and the count is a shuffle-free scan.
    # One agg decides; non-integer or wide domains fall through to the
    # degree-oriented wedge-join plan below.
    if dict(canon.dtypes)["a"] in ("tinyint", "smallint", "int", "bigint"):
        bounds = canon.agg(
            F.min("a").alias("lo_a"),
            F.max("b").alias("hi_b"),
            F.count(F.lit(1)).alias("n_edges"),
        ).first()
        n_edges = int(bounds["n_edges"] or 0)
        if n_edges == 0:
            return edges.sparkSession.createDataFrame(
                [(0, 0)], "n_edges long, n_triangles long"
            )
        if (
            int(bounds["lo_a"]) >= 0
            and int(bounds["hi_b"]) < _BITSET_MAX_NODES
        ):
            return _triangle_count_bitset(
                canon, int(bounds["hi_b"]) + 1, n_edges
            )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(
        F.col("node").alias("a"), F.col("deg").alias("_da")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("deg").alias("_db")
    )
    with_deg = canon.join(da, "a").join(db, "b")
    # direct low -> high by (deg, id); the orientation is a projection
    oriented = with_deg.select(
        F.when(
            (F.col("_da") < F.col("_db"))
            | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        ).otherwise(
            F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
        ).alias("e")
    ).select("e.u", "e.v")
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = e1.join(e2, "u").filter(F.col("x") < F.col("y"))
    closing = canon.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    n_tri = tri.count()
    n_edges = canon.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_edges, n_tri)], "n_edges long, n_triangles long"
    )
