"""Distributed Pareto / cumulative-coverage ranking.

Reference shape: scripts/pareto_analysis.py:29-37 (pandas sort_values +
cumsum over the full token-frequency table).  A naive Spark translation
is `Window.orderBy(desc(n))` with no partitionBy — Spark plans that as
`Exchange SinglePartition` + a one-task Sort holding the entire
vocabulary: fine at sf0.1, a guaranteed bottleneck/OOM at 100 TB.

The distributed plan here:

1. range-repartition the counts by (n DESC, key ASC) — Spark's normal
   distributed-sort machinery; every partition holds ~|V|/P rows and
   partition i precedes partition i+1 in global order;
2. one tiny job collects per-partition (sum, count) — P rows to the
   driver — which become exclusive prefix offsets, shipped back as a
   P-entry literal map (a broadcast in spirit, constant-folded in
   practice);
3. partitions whose prefix offset already exceeds the coverage target
   are pruned wholesale — under a Zipf distribution that drops almost
   the entire vocabulary tail before any sort/window work happens;
4. rank / cumulative sums come from a Window PARTITIONED BY the range
   partition id, plus the prefix offset: every window is bounded by the
   range partitioner's balance, and no single-task sort appears
   anywhere in the physical plan.

The ranged frame is localCheckpoint-ed so the partition ids observed by
the offsets job and by the final query are the same materialization
(range boundary sampling happens once), and the blocks are freed by the
ContextCleaner when the result is garbage-collected — see the inline
comment for why an unowned persist() would leak instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_coverage(
    counts: DataFrame,
    key_col: str,
    n_col: str = "n",
    coverage_pct: int = 80,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rank rows by (n DESC, key ASC) and keep the head whose cumulative
    sum covers `coverage_pct` percent of the total, in exact integer
    arithmetic: a row survives iff (cum_n - n) * 100 < total * pct.

    Output: (rank int, <key_col>, <n_col>, cum_n long), globally ranked.
    """
    spark = counts.sparkSession
    total = counts.agg(F.sum(n_col)).collect()[0][0]
    if not total:
        schema = counts.select(key_col, n_col).schema
        return spark.createDataFrame([], schema).select(
            F.lit(0).alias("rank"),
            key_col,
            n_col,
            F.lit(0).cast("long").alias("cum_n"),
        ).limit(0)

    p = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint, not persist: partition ids must be one stable
    # materialization for BOTH the offsets job and the final query, and
    # checkpoint blocks are dropped by the ContextCleaner once the
    # returned frame is garbage-collected — a persist() here would leak
    # one cached copy of the count table per invocation with no owner
    # to unpersist it.
    ranged = counts.repartitionByRange(
        p, F.desc(n_col), F.asc(key_col)
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint()

    parts = (
        ranged.groupBy("_pid")
        .agg(F.sum(n_col).alias("_ps"), F.count(F.lit(1)).alias("_pc"))
        .collect()
    )
    acc_n, acc_c, offs = 0, 0, {}
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = (acc_n, acc_c)
        acc_n += r["_ps"]
        acc_c += r["_pc"]

    # whole-partition pruning: if a partition's prefix offset already
    # meets the coverage target, none of its rows can survive the filter
    keep = [
        pid for pid, (o, _) in offs.items()
        if o * 100 < int(total) * coverage_pct
    ]
    off_n = F.create_map(
        *[lit for pid, (o, _) in offs.items()
          for lit in (F.lit(pid), F.lit(int(o)))]
    )
    off_c = F.create_map(
        *[lit for pid, (_, c) in offs.items()
          for lit in (F.lit(pid), F.lit(int(c)))]
    )
    w = Window.partitionBy("_pid").orderBy(F.desc(n_col), F.asc(key_col))
    return (
        ranged.filter(F.col("_pid").isin(keep))
        .withColumn(
            "rank",
            (F.row_number().over(w) + off_c[F.col("_pid")]).cast("int"),
        )
        .withColumn(
            "cum_n",
            F.sum(n_col).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ) + off_n[F.col("_pid")],
        )
        .filter(
            (F.col("cum_n") - F.col(n_col)) * 100
            < F.lit(int(total)) * coverage_pct
        )
        .select("rank", key_col, n_col, "cum_n")
    )
