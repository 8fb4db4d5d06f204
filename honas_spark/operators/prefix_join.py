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
