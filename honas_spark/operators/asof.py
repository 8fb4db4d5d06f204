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
    order is not meaningful.

    NULL handling matches a SQL ASOF join: a NULL right timestamp can
    never qualify (those rows are dropped), a NULL left timestamp gets
    NULL outputs, and the qualifying right row is picked ATOMICALLY —
    its whole payload rides in one struct, so a NULL value inside the
    matched row stays NULL instead of being back-filled from an older
    row (per-column last(ignorenulls) would tear rows)."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward: {direction}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    payload = [right_ts] + list(right_cols)

    rstruct = F.struct(
        *[F.col(c).alias(c) for c in payload]
    )
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}"
            for c in payload
        ) + ">"
    )
    lside = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        null_struct.alias("_r"),
    )
    rside = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        rstruct.alias("_r"),
    )
    # right rows carry no left columns; align schemas with NULLs
    for c in lside.columns:
        if c not in rside.columns:
            rside = rside.withColumn(
                c, F.lit(None).cast(dict(lside.dtypes)[c])
            )
    combined = lside.unionByName(rside.select(lside.columns))

    # right-before-left at equal ts => inclusive semantics; NULL left
    # timestamps sort FIRST in both directions so their frame holds no
    # right rows and they resolve to NULL (a NULLS LAST default under
    # desc() would otherwise give a NULL-ts row the whole partition)
    ts_order = (
        F.col("_asof_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_asof_ts").desc_nulls_first()
    )
    # the trailing _r orderBy is the deterministic tie-break among
    # right rows sharing (key, ts): struct ordering is lexicographic
    # over (right_ts, *right_cols), so last(ignorenulls) always picks
    # the row the docstring promises, independent of partition layout.
    # Left rows carry a NULL _r, so their relative order is moot.
    frame = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_asof_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = combined.withColumn(
        "_hit", F.last(F.col("_r"), ignorenulls=True).over(frame)
    )
    return (
        out.filter(F.col("_asof_side") == 1)
        .select(
            "*",
            *[F.col("_hit")[c].alias(f"{c}{suffix}") for c in payload],
        )
        .drop("_asof_ts", "_asof_side", "_r", "_hit")
    )
