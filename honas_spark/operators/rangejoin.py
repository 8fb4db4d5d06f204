"""Interval (range) join — points against [lo, hi] intervals.

Spark plans a non-equi join as BroadcastNestedLoopJoin (O(N x M) with
a broadcast side) — unusable at corpus scale.  The standard re-
expression: bucketize the range dimension with a fixed width W, copy
each interval into every bucket it covers (sequence + explode — an
interval of span S lands in ~S/W + 1 buckets), bucket each point once,
equi-join on the bucket, and filter exact containment.  Each matching
(point, interval) pair meets in EXACTLY one bucket — the point's — so
no post-join dedup is needed.

W trades copy factor against bucket selectivity: W ~= the average
interval span keeps the copy factor ~2 while buckets stay tight.  The
default derives W from one scalar aggregate over the intervals.

The reference's CIDR longest-prefix join (prefix_join.py) is the
specialized power-of-two sibling; this is the general-purpose one.
DuckDB's plain inequality join is the oracle twin
(queries()["range_join"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: "int | None" = None,
    how: str = "inner",
) -> DataFrame:
    """-> every (point row x interval row) pair with
    lo <= point <= hi (inclusive both ends), as the point row's columns
    plus the interval row's columns.  how="left" also keeps point rows
    matching no interval, with NULL interval columns (point rows must
    be distinct for the left form — the no-match set is recovered by
    an anti-join on the full point row).

    Integer or numeric range columns; bucket_width=None derives
    W = clamp(ceil(avg(hi - lo + 1)), 1, ...) from the intervals (one
    scalar aggregate job).  Empty intervals (hi < lo) never match."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    ivs = intervals.filter(F.col(lo_col) <= F.col(hi_col))
    if bucket_width is None:
        row = ivs.agg(
            F.ceil(
                F.avg(F.col(hi_col) - F.col(lo_col) + F.lit(1))
            ).alias("w")
        ).first()
        bucket_width = int(row["w"]) if row and row["w"] else 1
        bucket_width = max(bucket_width, 1)
    w = F.lit(int(bucket_width))
    ivb = ivs.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    ptb = points.withColumn(
        "_bkt", F.floor(F.col(point_col) / w)
    )
    joined = ptb.join(ivb, "_bkt", "inner").filter(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    if how == "inner":
        return joined.drop("_bkt")
    # left: recover the no-match point rows by anti-joining the points
    # against the matched point rows, then pad NULL interval columns
    matched = joined.drop("_bkt")
    missing = points.join(
        matched.select(*points.columns).distinct(),
        points.columns,
        "left_anti",
    )
    for c in ivs.columns:
        missing = missing.withColumn(
            c, F.lit(None).cast(dict(ivs.dtypes)[c])
        )
    return matched.unionByName(missing)
