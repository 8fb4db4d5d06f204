"""Watermarked windowed aggregation — bounded-state event counting.

The foreachBatch sketch store (stream.py) tolerates arbitrarily late data
because the merge algebra is idempotent; plain streaming AGGREGATES can't
— their state would grow forever without a bound on lateness.  This is
the standard Structured Streaming shape for those: event-time tumbling
windows + a watermark that (a) lets finished windows emit exactly once in
append mode and (b) drops rows later than the allowed delay, keeping
state O(active windows).

The reference counts requests per rotation period stamped with now()
(honas_gather.c); this is that counter under event time with explicit
late-data policy."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Streaming event counts per (tumbling window, group) with
    late-data bound `watermark`.  Append-mode compatible: a window emits
    once, when the watermark passes its end; rows later than the
    watermark are dropped (counted nowhere) — that drop is the price of
    bounded state, and exactly what the sketch store avoids by merging
    instead of aggregating."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"), *group_cols
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_events",
        )
    )
