"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def resplit_small(df: DataFrame) -> DataFrame:
    """A small input with fewer partitions than cores (e.g. one parquet
    row group) is re-split so projection-shaped operators (shingle/
    token explosion, signature computation) parallelize; a real
    many-split corpus never triggers this.

    Cost note: the `.rdd.getNumPartitions()` probe forces one extra
    physical-planning pass at build time (there is no cheaper partition
    count before execution in PySpark).  That is a driver-side planning
    cost only — it never touches data — and is paid once per operator
    call, which is why the probe lives here rather than inline at every
    call site.

    Streaming DataFrames pass through untouched: `.rdd` is illegal on
    them, and a stream's parallelism comes from its source + the
    stateful exchange downstream."""
    if df.isStreaming:
        return df
    para = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < para:
        return df.repartition(para)
    return df
