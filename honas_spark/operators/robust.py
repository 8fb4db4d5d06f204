"""Robust per-group outlier statistics — median / MAD / flag counts.

Quality gates over numeric telemetry (document lengths, score columns,
price-like fields) want MEDIAN-based outlier detection: mean/stddev are
themselves dragged by the outliers they are supposed to find, the
median absolute deviation is not (50% breakdown point; Hampel 1974).

    outlier(x)  <=>  |x - median| > z * MAD

Exactness across engines: median and MAD are order statistics — picks
(or the mean of two picks) from the input multiset, not accumulations —
so both engines produce bit-identical doubles and the strict `>`
comparison is deterministic; no float-summation-order hazards anywhere.

Scale shape: three grouped aggregations over the data (median, MAD,
flag count), each map-partial where possible, with the tiny per-group
stat tables BROADCAST back — the data itself shuffles on the group key
once per pass and nothing else moves.  Spark's exact `median` buffers
each group's values in executor memory: right for gate/test scale and
for many-small-groups telemetry; for petabyte groups swap the same
pipeline onto the relative-error quantile sketch
(operators/quantiles.ddsketch_agg) — MAD tolerates approximate medians
by design (its breakdown point, not its exact value, is the point).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    z: float = 3.0,
) -> DataFrame:
    """Per group: n (non-null values), med, mad (both rounded 4dp for
    presentation; flags use the unrounded doubles), n_outliers =
    count(|x - med| > z * mad).  NULL values are ignored (SQL aggregate
    semantics).  With mad = 0 (>= 50% of the group identical) every
    x != med is z-independent-flagged, the standard MAD degeneracy —
    callers with discrete-valued columns should prefill z accordingly."""
    g = list(group_cols)
    vals = df.select(*g, F.col(value_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    meds = vals.groupBy(*g).agg(F.median("_v").alias("_med"))
    dev = vals.join(F.broadcast(meds), on=g).withColumn(
        "_adev", F.abs(F.col("_v") - F.col("_med"))
    )
    mads = dev.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("_med").alias("_med"),
        F.median("_adev").alias("_mad"),
    )
    flagged = (
        dev.select(*g, "_adev")
        .join(F.broadcast(mads.select(*g, "_mad")), on=g)
        .groupBy(*g)
        .agg(
            F.count(
                F.when(F.col("_adev") > F.lit(float(z)) * F.col("_mad"), 1)
            ).alias("n_outliers")
        )
    )
    return (
        mads.join(flagged, on=g)
        .select(
            *g,
            F.col("n").cast("long").alias("n"),
            F.round(F.col("_med"), 4).alias("med"),
            F.round(F.col("_mad"), 4).alias("mad"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )
