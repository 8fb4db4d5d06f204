"""Table profiling — ANALYZE-style per-column statistics in one pass.

Every 100 TB pipeline starts with "what is actually in this table":
completeness per column, distinct cardinalities, ranges, value entropy.
Deequ/Great-Expectations run this as N separate jobs; here it is ONE
unpivot + two aggregations, so the input is scanned once no matter how
many columns are profiled.

Plan shape: select -> explode(array(struct(col_name, value_as_string)))
multiplies rows by n_cols inside the scan stage (same cost class as
Spark's own Expand for multi-count-distinct), then
  groupBy(col_name, value)  -- partial counts map-side, so the shuffle
                               carries (col x distinct-value) rows,
                               not (col x input) rows
  groupBy(col_name)         -- a second tiny shuffle over value groups
Entropy comes from the value-frequency groups (sum c*ln(c) fold), so it
rides the same aggregation instead of a separate job per column.

Exact by construction — distinct counts are real COUNT(DISTINCT), not
HLL (distinct is free once entropy forced the per-value grouping).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """One row per profiled column:
      col_name, n_rows, n_nonnull, n_distinct, min_val, max_val (both
      as strings — the profile is heterogeneous by nature),
      entropy_mnats (Shannon entropy of the value distribution in
      milli-nats, an integer so the gate is exact cross-engine).

    NULL handling matches SQL aggregates: n_distinct / min / max /
    entropy are over non-null values; completeness = n_nonnull/n_rows
    is left to the caller (both operands are returned)."""
    cols = list(columns) if columns is not None else df.columns
    exploded = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("cv")
    ).select("cv.col_name", "cv.val")

    per_value = exploded.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("c")
    )

    # n_distinct is free and EXACT here: the entropy fold already
    # grouped by value, so distinct = count of non-null value groups.
    # (For an ultra-high-cardinality column where even the value groups
    # are too many and entropy is not wanted, the right tool is a
    # single agg of approx_count_distinct / the package HLL — different
    # query, same scan shape, no per-value shuffle.)
    distinct_agg = F.count(F.when(F.col("val").isNotNull(), 1))
    # entropy of the non-null value distribution:
    #   H = ln(N) - sum(c*ln(c))/N   (N = n_nonnull)
    # computed from the value-frequency groups; milli-nats as BIGINT so
    # both engines floor the same double: per-group ln(c) products are
    # order-independent, only the final fold sums doubles, and at
    # milli-nat resolution a boundary flip needs the true value within
    # ~1e-9 relative of a grid line — summation-order ULPs are orders
    # of magnitude below that
    prof = per_value.groupBy("col_name").agg(
        F.sum("c").alias("n_rows"),
        F.sum(F.when(F.col("val").isNotNull(), F.col("c"))).alias(
            "_n_nonnull"
        ),
        distinct_agg.alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(
            F.when(
                F.col("val").isNotNull(),
                F.col("c").cast("double") * F.log(F.col("c").cast("double")),
            )
        ).alias("_clnc"),
    )
    n_nonnull = F.coalesce(F.col("_n_nonnull"), F.lit(0)).cast("long")
    entropy = F.when(
        n_nonnull > 0,
        F.floor(
            (
                F.log(n_nonnull.cast("double"))
                - F.col("_clnc") / n_nonnull.cast("double")
            )
            * F.lit(1_000.0)
        ),
    ).otherwise(F.lit(0)).cast("long")
    return prof.select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        n_nonnull.alias("n_nonnull"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
        entropy.alias("entropy_mnats"),
    )


def equi_depth_hist(
    df: DataFrame,
    value_col: str,
    buckets: int = 10,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Equi-depth histogram — the optimizer/profiling primitive (equal
    ROW mass per bucket, so skewed distributions get resolution where
    the data is, unlike equi-width bins dominated by outliers).

    Assignment is at VALUE granularity and fully deterministic: a
    distinct value whose exclusive cumulative row count is c over total
    n lands in bucket floor(c * buckets / n) — integer arithmetic in
    decimal(38,0), so heavy values that span several bucket widths
    collapse into their starting bucket (their row mass is atomic) and
    both engines compute the identical bucketing.

    -> (bucket, lo, hi, n_rows, n_distinct) ordered by bucket.  NULLs
    (and NaN for float columns) are excluded — they have no rank.

    Scale shape: per-value counts (one shuffle, bounded by DISTINCT
    values), then the packing.py/drift.py range-repartition +
    per-partition prefix offsets for the global cumsum — no Exchange
    SinglePartition, no task sorts the whole value domain."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism

    v = F.col(value_col)
    keep = v.isNotNull()
    if dict(df.dtypes)[value_col] in ("double", "float"):
        keep = keep & ~F.isnan(v)
    counts = (
        df.filter(keep).groupBy(v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    ranged = (
        counts.repartitionByRange(p, F.asc("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    parts = (
        ranged.groupBy("_pid").agg(F.sum("_c").alias("_s")).collect()
    )
    n = sum(int(r["_s"] or 0) for r in parts)
    if n == 0:
        return ranged.select(
            F.lit(0).cast("int").alias("bucket"),
            F.col("_v").alias("lo"),
            F.col("_v").alias("hi"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(0).cast("long").alias("n_distinct"),
        ).limit(0)
    acc, offs = 0, {}
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += int(r["_s"] or 0)
    off_map = F.create_map(
        *[x for pid, o in offs.items() for x in (F.lit(pid), F.lit(o))]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.asc("_v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_excl = (
        F.sum("_c").over(w) - F.col("_c") + off_map[F.col("_pid")]
    ).cast("long")
    # integral `div` (a decimal-cast would ROUND): exact while
    # n * buckets < 2^63; ANSI mode raises loudly past that rather
    # than bucketing silently wrong
    bucketed = ranged.withColumn("_cum", cum_excl).withColumn(
        "bucket", F.expr(f"(_cum * {int(buckets)}) div {int(n)}")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
            F.sum("_c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "lo", "hi", "n_rows", "n_distinct",
        )
        .orderBy("bucket")
    )


def rank_normalize(
    df: DataFrame,
    value_col: str,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Rank / quantile transform — the ML feature-prep normalization
    that maps a column onto [0, 1] by its empirical CDF position
    (robust to outliers and arbitrary monotone distortions, unlike
    z-scoring).

    Returns the compact per-DISTINCT-value map (value, n, min_rank,
    pct_micro): min_rank is the 1-based rank of the value's first
    occurrence in sorted order, pct_micro = (min_rank - 1) * 10^6
    integer-divided by (n_total - 1) — all integer arithmetic, so the
    map is exact cross-engine; rows join back on the value (one
    broadcast for low-cardinality columns).  n_total = 1 maps to 0.

    Scale shape: same machinery as equi_depth_hist — per-value counts,
    range repartition, per-partition prefix offsets; no global sort,
    no SinglePartition."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    v = F.col(value_col)
    keep = v.isNotNull()
    if dict(df.dtypes)[value_col] in ("double", "float"):
        keep = keep & ~F.isnan(v)
    counts = (
        df.filter(keep).groupBy(v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    ranged = (
        counts.repartitionByRange(p, F.asc("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    parts = ranged.groupBy("_pid").agg(F.sum("_c").alias("_s")).collect()
    n = sum(int(r["_s"] or 0) for r in parts)
    if n == 0:
        return ranged.select(
            F.col("_v").alias("value"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("min_rank"),
            F.lit(0).cast("long").alias("pct_micro"),
        ).limit(0)
    acc, offs = 0, {}
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += int(r["_s"] or 0)
    off_map = F.create_map(
        *[x for pid, o in offs.items() for x in (F.lit(pid), F.lit(o))]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.asc("_v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    min_rank = (
        F.sum("_c").over(w) - F.col("_c") + off_map[F.col("_pid")] + 1
    ).cast("long")
    out = ranged.withColumn("min_rank", min_rank).select(
        F.col("_v").alias("value"),
        F.col("_c").cast("long").alias("n"),
        "min_rank",
        (
            F.expr(f"((min_rank - 1) * 1000000) div {max(n - 1, 1)}")
            if n > 1 else F.lit(0)
        ).cast("long").alias("pct_micro"),
    )
    return out
