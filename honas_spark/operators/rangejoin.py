"""Interval (range) join — points against [lo, hi] intervals.

Spark plans a non-equi join as BroadcastNestedLoopJoin (O(N x M) with
a broadcast side) — unusable at corpus scale.  The standard re-
expression: bucketize the range dimension with a fixed width W, copy
each interval into every bucket it covers (sequence + explode — an
interval of span S lands in ~S/W + 1 buckets), bucket each point once,
equi-join on the bucket, and filter exact containment.  Each matching
(point, interval) pair meets in EXACTLY one bucket — the point's — so
no post-join dedup is needed.

W trades copy factor against bucket selectivity.  The default derives
W from the 90th-percentile interval span (one scalar aggregate), which
keeps the copy factor small for the bulk of the intervals while not
letting one wide outlier dictate a huge W; `max_copies` bounds the
worst per-interval explosion with a clear error instead of a silent
sequence() blow-up.

The reference's CIDR longest-prefix join (prefix_join.py) is the
specialized power-of-two sibling; this is the general-purpose one.
DuckDB's plain inequality join is the oracle twin
(queries()["range_join"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _bucket(col, w):
    """Exact floor(col / w) for integral range columns: decimal
    division keeps 64-bit values exact (double division loses
    precision past 2^53 and can split a point and its containing
    interval across buckets, silently dropping the match)."""
    return F.floor(col.cast("decimal(38,0)") / F.lit(int(w))).cast(
        "long"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: "int | None" = None,
    how: str = "inner",
    max_copies: int = 65536,
) -> DataFrame:
    """-> every (point row x interval row) pair with
    lo <= point <= hi (inclusive both ends), as the point row's columns
    plus the interval row's columns.  how="left" also keeps point rows
    matching no interval, with NULL interval columns (point rows must
    be distinct for the left form — it window-partitions the joined
    output by the full point row to decide which misses to pad, so
    duplicate unmatched point rows would collapse to one pad).

    Integer range columns; bucket_width=None derives W from the
    90th-percentile interval span (one scalar aggregate job).  Empty
    intervals (hi < lo) and NULL bounds/points never match.
    max_copies bounds the per-interval bucket fan-out: an interval
    wider than max_copies * W raises (pass a larger bucket_width)
    rather than silently materializing a huge sequence()."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    shared = (set(points.columns) & set(intervals.columns))
    if shared:
        raise ValueError(
            "points and intervals share column names "
            f"{sorted(shared)} — rename one side (the bucket "
            "equi-join would produce ambiguous references)"
        )
    ivs = intervals.filter(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    )
    if bucket_width is None:
        row = ivs.agg(
            F.ceil(
                F.expr(
                    f"percentile_approx({hi_col} - {lo_col} + 1, 0.9)"
                )
            ).alias("w")
        ).first()
        bucket_width = int(row["w"]) if row and row["w"] else 1
        bucket_width = max(bucket_width, 1)
    w = int(bucket_width)
    too_wide = ivs.filter(
        F.col(hi_col) - F.col(lo_col) >= F.lit(w) * F.lit(max_copies)
    ).count()
    if too_wide:
        raise ValueError(
            f"{too_wide} interval(s) span more than max_copies "
            f"({max_copies}) buckets at width {w}; pass a larger "
            "bucket_width (or raise max_copies deliberately)"
        )
    ivb = ivs.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _bucket(F.col(lo_col), w), _bucket(F.col(hi_col), w)
            )
        ),
    )
    contained = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if how == "inner":
        ptb = points.filter(F.col(point_col).isNotNull()).withColumn(
            "_bkt", _bucket(F.col(point_col), w)
        )
        return ptb.join(ivb, "_bkt", "inner").filter(contained).drop(
            "_bkt"
        )

    # left: ONE bucketized LEFT join (NULL points get a NULL bucket,
    # which never equi-matches, so the left join preserves them), then
    # one window over the full point row decides padding: containment
    # rows pass through; a point with no containment row anywhere keeps
    # exactly one representative, its interval columns nulled.  The
    # former formulation ran the bucketized join TWICE (matches + a
    # null-safe anti-join) — each input now scans once.
    ptb = points.withColumn("_bkt", _bucket(F.col(point_col), w))
    lj = ptb.join(ivb, "_bkt", "left").withColumn(
        "_ok", F.coalesce(contained, F.lit(False))
    )
    byp = Window.partitionBy(*points.columns).orderBy(
        F.col(lo_col).asc_nulls_first()
    )
    lj = lj.withColumn(
        "_any",
        F.max(F.col("_ok").cast("int")).over(
            byp.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    ).withColumn("_rn", F.row_number().over(byp))
    kept = lj.filter(
        F.col("_ok") | ((F.col("_any") == 0) & (F.col("_rn") == 1))
    )
    pad = [
        F.when(F.col("_ok"), F.col(c)).alias(c) for c in ivs.columns
    ]
    return kept.select(*points.columns, *pad)
