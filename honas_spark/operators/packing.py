"""Token-budget sequence packing: shard a corpus into packs of
~budget tokens each — the pretraining document-packing step (concat
documents in a deterministic order, cut every `budget` tokens; a pack
is the set of documents whose concatenated stream falls in one cut).

Assignment rule (exact, standard concat-and-chunk): a document with
exclusive-prefix token offset `off` belongs to pack floor(off /
budget) — the pack where its first token lands.  A long document can
straddle a boundary; it is ASSIGNED to the pack it starts in (callers
that split documents across packs do so downstream with the returned
offset).

Physical shape — the same scale-safe global-cumsum pattern as
operators/pareto.py: a naive `Window.orderBy(...)` with no partitionBy
plans as Exchange SinglePartition (one task holding the corpus);
instead range-repartition by the pack order, collect P per-partition
(sum, count) rows as exclusive prefix offsets, and compute the running
offset with a window PARTITIONED BY the range partition id plus the
prefix — no single-task sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_by_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """-> (id, n_tokens, offset, pack_id): offset = exclusive prefix
    sum of tokens in (id ASC) order, pack_id = floor(offset / budget).
    Deterministic: packing order is the id order (sort upstream for a
    different order, e.g. by length or curriculum score).  Rows with
    NULL or negative token counts are rejected upfront."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1: {budget}")
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint for the same reason as pareto.py: partition ids
    # must be one stable materialization for both the offsets job and
    # the final query; checkpoint blocks are freed by the
    # ContextCleaner when the result is dropped
    ranged = (
        df.select(id_col, tokens_col)
        .repartitionByRange(p, F.asc(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # the NULL/negative validation rides the SAME tiny offsets job
    # (a dedicated count() would re-scan the whole upstream plan)
    parts = (
        ranged.groupBy("_pid")
        .agg(
            F.sum(tokens_col).alias("_ps"),
            F.sum(
                F.when(
                    F.col(tokens_col).isNull()
                    | (F.col(tokens_col) < 0),
                    1,
                ).otherwise(0)
            ).alias("_bad"),
        )
        .collect()
    )
    bad = sum(int(r["_bad"] or 0) for r in parts)
    if bad:
        raise ValueError(
            f"{bad} row(s) have NULL/negative {tokens_col}"
        )
    if not parts:
        # empty input: an empty map literal would type as
        # map<void,void> and fail analysis — return the typed empty
        # result directly
        return (
            ranged.select(
                id_col,
                tokens_col,
                F.lit(0).cast("long").alias("offset"),
                F.lit(0).cast("long").alias("pack_id"),
            ).limit(0)
        )
    acc, offs = 0, {}
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += int(r["_ps"] or 0)
    off_map = F.create_map(
        *[lit for pid, o in offs.items()
          for lit in (F.lit(pid), F.lit(int(o)))]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn(
            "offset",
            (
                F.sum(tokens_col).over(w)
                - F.col(tokens_col)
                + off_map[F.col("_pid")]
            ).cast("long"),
        )
        .withColumn(
            # integral `div`, not float `/`: double division desyncs
            # the pack boundary from the oracle's exact `//` once the
            # cumulative token count passes 2^53 (offset >= 0, so
            # truncating div == floor div)
            "pack_id",
            F.expr(f"offset div {int(budget)}").cast("long"),
        )
        .select(id_col, tokens_col, "offset", "pack_id")
    )
