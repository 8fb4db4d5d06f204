"""As-of (point-in-time) join — the classic temporal operator Spark's
DataFrame API lacks natively.

For every left row, attach the most recent right row per key whose
timestamp is <= the left timestamp (direction="backward"; "forward"
symmetric via >=).  The large-pipeline shape: align observations with
the latest prior snapshot/marker (feature lookups at training time,
price-at-event, last-config-before-request).

Physical strategy: the union + partitioned-window form — both sides
union into one frame keyed by the join key, ordered by (ts, side) so a
right row at the same timestamp sorts before the left rows it answers;
one `last(value, ignorenulls=True)` running window per carried column
propagates the latest right payload forward.  ONE shuffle on the join
key and a per-key sort — no range explosion, no bucketize/duplicate
trick, no per-group pandas (`pd.merge_asof` via applyInPandas would
ship both sides through Arrow and sort in Python).  Skewed keys are
ordinary window skew: pre-split hot keys upstream if one key dominates.

DuckDB's native ASOF JOIN is the oracle twin (queries()["asof_join"]).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | Sequence[str]",
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """-> left with, per row, the payload of the latest (backward) /
    earliest (forward) right row per `on` key at or before (after) the
    left timestamp.  Appended columns: `{right_ts}{suffix}` plus each
    right_col as `{col}{suffix}`; all NULL when no right row qualifies.

    Ties: right rows sharing (key, ts) resolve to the LAST one in
    (ts, right_cols) order — deduplicate the right side first if that
    order is not meaningful."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward: {direction}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    payload = [right_ts] + list(right_cols)

    lside = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload],
    )
    rside = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    # right rows carry no left columns; align schemas with NULLs
    for c in lside.columns:
        if c not in rside.columns:
            rside = rside.withColumn(
                c, F.lit(None).cast(dict(lside.dtypes)[c])
            )
    combined = lside.unionByName(rside.select(lside.columns))

    if direction == "backward":
        # right-before-left at equal ts => '<=' semantics
        order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
        frame = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        pick = F.last
    else:
        order = [F.col("_asof_ts").desc(), F.col("_asof_side").asc()]
        frame = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        pick = F.last
    out = combined.select(
        "*",
        *[pick(F.col(f"_r_{c}"), ignorenulls=True).over(frame)
          .alias(f"{c}{suffix}") for c in payload],
    )
    return (
        out.filter(F.col("_asof_side") == 1)
        .drop(
            "_asof_ts", "_asof_side",
            *[f"_r_{c}" for c in payload],
        )
    )
