"""Blocked fuzzy string matching — entity-resolution candidate pairs.

Approximate string joins (catalog reconciliation, author/entity dedup,
near-identical path matching) cannot afford all-pairs edit distance:
at N rows that is N^2 JVM calls.  The standard answer is BLOCKING
(Papadakis et al. 2020 survey): records are mapped to short block keys,
only same-block pairs are compared, and multiple complementary keys
recover pairs a single key would miss.

Block keys here: (normalized prefix, length bucket) and (normalized
suffix, length bucket).  Two strings within edit distance d always
share a length bucket neighborhood (enforced by the |len_a - len_b| <=
d prefilter, which Catalyst pushes into the join), and d <= 2 edits can
break a 2-char prefix only by editing its first two characters — the
suffix family catches most of those.  Blocking recall is documented,
not silent: pairs whose strings differ in BOTH the first two and last
two characters are out of scope by construction (raise block_chars or
add a middle-gram family for higher recall).

Skew: a popular prefix ("sma...") makes one block quadratic.  Blocks
larger than max_block_size are DROPPED — deterministically (a count
threshold, no ordering dependence), same contract as the capped LSH
paths in dedup.py — and the drop is observable via returned pair
counts, so the cross-engine gate stays exact.

Scale shape: explode(2 block keys) -> groupBy-count cap (semi-join) ->
equi-join on block key with id_a < id_b and the length band pushed ->
DISTINCT candidate pairs -> ONE levenshtein per candidate, JVM-side
(whole-stage codegen, early-exit threshold form), never per all-pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _blocked(df: DataFrame, id_col: str, text_col: str,
             band: int, block_chars: int) -> DataFrame:
    t = F.lower(F.trim(F.col(text_col)))
    length = F.length(t)
    bucket = F.floor(length / band)
    prefix = F.substring(t, 1, block_chars)
    # positive-index suffix: substr semantics for negative starts differ
    # across engines (Spark counts from the end, Postgres/DuckDB from
    # "position -n left of the start"), so the oracle-safe form is an
    # explicit greatest(len - c + 1, 1)
    suffix = F.substring(
        t, F.greatest(length - (block_chars - 1), F.lit(1)), block_chars
    )
    return df.select(
        F.col(id_col).alias("_id"),
        t.alias("_t"),
        length.alias("_len"),
        F.explode(
            F.array(
                F.concat(F.lit("p:"), prefix, F.lit(":"), bucket),
                F.concat(F.lit("s:"), suffix, F.lit(":"), bucket),
            )
        ).alias("_bk"),
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 2,
    band: int = 4,
    block_chars: int = 2,
    max_block_size: int = 1000,
) -> DataFrame:
    """Self-pairs (id_a < id_b) with levenshtein(text_a, text_b) <=
    max_distance among records sharing a block key.  Returns
    (id_a, id_b, dist).  Null/empty texts never pair (no block key
    content requirement: empty strings do block together — they are
    genuinely distance-0 pairs)."""
    base = df.filter(F.col(text_col).isNotNull())
    blocked = _blocked(base, id_col, text_col, band, block_chars)

    sizes = blocked.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    keep = sizes.filter(F.col("_n") <= max_block_size).select("_bk")
    blocked = blocked.join(F.broadcast(keep), on="_bk")

    a = blocked.select(
        F.col("_bk"), F.col("_id").alias("id_a"),
        F.col("_t").alias("_ta"), F.col("_len").alias("_la"),
    )
    b = blocked.select(
        F.col("_bk"), F.col("_id").alias("id_b"),
        F.col("_t").alias("_tb"), F.col("_len").alias("_lb"),
    )
    cand = (
        a.join(b, on="_bk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_distance)
        )
        .select("id_a", "id_b", "_ta", "_tb")
        .distinct()  # a pair can share both the prefix and suffix block
    )
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_distance)
    return (
        cand.select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") >= 0)  # threshold form returns -1 above d
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 2,
    **block_kwargs,
) -> DataFrame:
    """Entity resolution ACTION on top of fuzzy_pairs: connected
    components over the fuzzy-match graph, canonical entity = the min
    id per component (the semantic_dedup shape, knn.py:617, applied to
    string identity instead of embedding cosine).

    -> (id_col, entity, is_canonical) for EVERY input row: rows
    touching no fuzzy pair are singleton entities of themselves.
    Filtering on is_canonical dedups the catalog; grouping on entity
    gives the merge view.

    Scale shape: pair generation is the blocked/capped fuzzy_pairs
    (band/block_chars/max_block_size pass through); components run on
    (id, id) pairs only — strings never enter the iteration; final
    membership lands via one left join."""
    from .dedup import connected_components

    pairs = fuzzy_pairs(
        df, id_col, text_col, max_distance=max_distance, **block_kwargs
    ).select("id_a", "id_b")
    # reserved internal names: a caller whose id_col is literally
    # 'node' or 'component' would otherwise make the post-join
    # references ambiguous
    comp = (
        connected_components(pairs, "id_a", "id_b")
        .withColumnRenamed("node", "_cc_node")
        .withColumnRenamed("component", "_cc_component")
    )
    base = df.select(F.col(id_col))
    merged = F.coalesce(F.col("_cc_component"), F.col(id_col))
    return base.join(
        comp, base[id_col] == comp["_cc_node"], "left"
    ).select(
        id_col,
        merged.alias("entity"),
        (merged == F.col(id_col)).alias("is_canonical"),
    )
