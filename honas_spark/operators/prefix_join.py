"""Longest-prefix-match join (J1) — the subnet->entity lookup re-expressed.

The reference probes a hash table at every registered prefix length,
longest first (src/subnet_activity.c:441-507).  The Spark-native shape:
explode the *fact* key into its candidate prefixes at the dimension's
registered lengths, broadcast-equi-join against the tiny dimension, and
keep the longest match per row with `max_by`.  One broadcast join, no
shuffle of the fact table beyond the final group-by-row reduction — and
that reduction is avoided too by using a window-free `max_by` aggregation
keyed on a unique row id."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def longest_prefix_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    prefix_col: str = "prefix",
    entity_col: str = "entity",
    row_id_col: str = "row_id",
    out_col: str = "matched_entity",
    max_case_entries: int = 5000,
) -> DataFrame:
    """fact[key_col] matched against dim[(prefix, entity)]; longest prefix
    wins; unmatched rows keep null.  `dim` must be small (broadcast).

    Fast path: when the dim fits in `max_case_entries` it is folded into
    a single substring-equality CASE chain (longest prefix first) — a
    pure projection, ZERO shuffle of the fact table, fully codegen'd.
    The reference's per-length hash probes (subnet_activity.c:441-507)
    are exactly this shape.  Larger dims fall back to explode +
    broadcast join + max_by, which shuffles only (row_id, entity)."""
    n_dim = dim.count()
    if n_dim <= max_case_entries:
        entries = sorted(
            [(r[prefix_col], r[entity_col]) for r in dim.collect()],
            key=lambda x: -len(x[0]),
        )
        expr = F.lit(None).cast("string")
        for prefix, entity in reversed(entries):
            expr = F.when(
                F.substring(F.col(key_col), 1, len(prefix)) == prefix,
                F.lit(entity),
            ).otherwise(expr)
        return fact.withColumn(out_col, expr)
    lengths = sorted(
        {r[0] for r in dim.select(F.length(prefix_col)).distinct().collect()}
    )
    cand = fact.select(
        row_id_col,
        F.explode(
            F.array(*[F.substring(F.col(key_col), 1, n) for n in lengths])
        ).alias("_cand"),
    )
    matched = (
        cand.join(
            F.broadcast(dim),
            cand["_cand"] == dim[prefix_col],
            "inner",
        )
        .groupBy(row_id_col)
        .agg(
            F.max_by(
                F.col(entity_col), F.length(F.col(prefix_col))
            ).alias(out_col)
        )
    )
    return fact.join(matched, row_id_col, "left")


def cidr_longest_prefix_join(
    fact: DataFrame,
    addr_col: str,
    cidrs: Sequence[tuple],
    out_col: str = "matched_entity",
    plen_col: str = "matched_plen",
    row_id_col: str = "row_id",
    max_case_entries: int = 2000,
) -> DataFrame:
    """True CIDR longest-prefix match over an IPv4 BIGINT column (the
    reference's subnet->entity lookup, src/subnet_activity.c:441-507 —
    masked-address compare per registered length, longest first; NOT a
    string-prefix compare).

    cidrs: [('10.0.0.0/8', 'entity'), ...] — the subnet-definitions dim
    (S6), tiny by construction.

    Fast path (dim <= max_case_entries): one CASE chain over
    `addr & mask(L) == network`, longest length first — a pure projection,
    zero shuffle, constant-folded masks, fully codegen'd.  Fallback for
    big dims: explode the fact address into one masked candidate per
    registered length, broadcast-join on (masked, plen), keep the longest
    with max_by — shuffles only (row_id, entity, plen)."""
    from ..functions.inet import ip4_mask, parse_cidr

    parsed = []
    for cidr, entity in cidrs:
        ver, net, plen = parse_cidr(cidr)
        if ver != 4:
            raise ValueError(f"cidr_longest_prefix_join is IPv4-only: {cidr}")
        parsed.append((net, plen, entity))

    addr = F.col(addr_col)
    if len(parsed) <= max_case_entries:
        ent = F.lit(None).cast("string")
        ln = F.lit(None).cast("int")
        # build shortest-first so the longest prefix ends up outermost
        for net, plen, entity in sorted(parsed, key=lambda x: x[1]):
            cond = ip4_mask(addr, plen) == F.lit(net)
            ent = F.when(cond, F.lit(entity)).otherwise(ent)
            ln = F.when(cond, F.lit(plen)).otherwise(ln)
        return fact.withColumn(out_col, ent).withColumn(plen_col, ln)

    spark = fact.sparkSession
    dim = spark.createDataFrame(
        parsed, "net long, plen int, entity string"
    )
    lengths = sorted({p for _, p, _ in parsed})
    cand = fact.select(
        row_id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        ip4_mask(addr, n).alias("m"),
                        F.lit(n).cast("int").alias("l"),
                    )
                    for n in lengths
                ]
            )
        ).alias("c"),
    )
    matched = (
        cand.join(
            F.broadcast(dim),
            (cand["c.m"] == dim["net"]) & (cand["c.l"] == dim["plen"]),
            "inner",
        )
        .groupBy(row_id_col)
        .agg(
            F.max_by(F.col("entity"), F.col("plen")).alias(out_col),
            F.max("plen").alias(plen_col),
        )
    )
    return fact.join(matched, row_id_col, "left")
