"""Exact cumulative-distinct rollup: "distinct keys seen TO DATE per
time bucket" without any distinct-over-expanding-window blowup.

The naive form — count(DISTINCT key) OVER (ORDER BY day RANGE UNBOUNDED
PRECEDING) — re-scans every prior bucket per bucket (quadratic) and
Spark refuses DISTINCT window aggregates anyway.  The exact linear
reformulation: a key contributes to the cumulative count from its FIRST
appearance on, so

  1. first-appearance bucket per key   (one groupBy-min over the log)
  2. new-key count per bucket          (tiny aggregation)
  3. prefix-sum over the bucket axis   (|buckets| rows)

Step 3's unpartitioned window is deliberate and safe: by then the data
is ONE ROW PER BUCKET (days/hours), thousands of rows at century scale
— the 100 TB of events never meet a window.  This is the same exact
trick HLL-based "distinct to date" dashboards approximate; here it is
exact because first-appearance is an aggregation, not a sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "day",
) -> DataFrame:
    """-> (bucket_start timestamp, new_keys, cum_distinct), one row per
    bucket that introduced at least one first-seen key.  `bucket` is a
    date_trunc unit (hour/day/week/month/...)."""
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    first = df.groupBy(key_col).agg(F.min(b).alias("bucket_start"))
    newk = first.groupBy("bucket_start").agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    w = Window.orderBy("bucket_start")
    return newk.withColumn(
        "cum_distinct", F.sum("new_keys").over(w).cast("long")
    )
