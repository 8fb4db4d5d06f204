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
