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
ship both sides through Arrow and sort in Python).

Skew: a dominant key would serialize its entire union into ONE window
task's sort.  Keys exceeding `hot_key_threshold` rows (found by one
slim groupBy-count) are therefore auto-routed to a CHUNKED window:
their time range splits at per-key quantile boundaries, each
(key, chunk) sorts independently, and a boundary carry — the running
max over earlier chunks of each chunk's final right payload — seeds
rows whose answer lives in a previous chunk.  Cold keys stay on the
one-shuffle path; with no hot keys the plan is byte-identical to the
unchunked form.

DuckDB's native ASOF JOIN is the oracle twin (queries()["asof_join"]).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

# chunk counts beyond this stop helping: boundary-carry rows stay tiny
# either way, but per-chunk task overhead starts to dominate
_MAX_CHUNKS = 256


def _window_order(direction: str):
    # right-before-left at equal ts => inclusive semantics; NULL left
    # timestamps sort FIRST in both directions so their frame holds no
    # right rows and they resolve to NULL (a NULLS LAST default under
    # desc() would otherwise give a NULL-ts row the whole partition).
    # The trailing _r orderBy is the deterministic tie-break among
    # right rows sharing (key, ts): struct ordering is lexicographic
    # over (right_ts, *right_cols), so last(ignorenulls) always picks
    # the row the docstring promises, independent of partition layout.
    # Left rows carry a NULL _r, so their relative order is moot.
    ts_order = (
        F.col("_asof_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_asof_ts").desc_nulls_first()
    )
    return [ts_order, F.col("_asof_side").asc(), F.col("_r").asc()]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | Sequence[str]",
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    suffix: str = "_asof",
    hot_key_threshold: "int | None" = 2_000_000,
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
    row (per-column last(ignorenulls) would tear rows).

    hot_key_threshold: keys with more than this many combined rows are
    routed to the chunked-window path (see module docstring); their
    branch re-reads the inputs for the slim carry aggregates, which
    Catalyst prunes to the key/ts columns.  None disables detection
    (one window, caller owns skew).  NULL-valued keys always take the
    cold path — their window groups resolve independently anyway.
    """
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

    order = _window_order(direction)
    frame = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    hot_keys: list = []
    if hot_key_threshold:
        # one slim count pass (keys only — pruned scan, map-side
        # combine); the collect is bounded by total_rows / threshold
        hot_keys = [
            r
            for r in combined.groupBy(*keys)
            .count()
            .filter(F.col("count") > hot_key_threshold)
            .collect()
            if all(r[k] is not None for k in keys)
        ]

    if not hot_keys:
        out = combined.withColumn(
            "_hit", F.last(F.col("_r"), ignorenulls=True).over(frame)
        )
        return _finish(out, payload, suffix)

    hot_pred = None
    for r in hot_keys:
        p = None
        for k in keys:
            c = F.col(k) == F.lit(r[k])
            p = c if p is None else (p & c)
        hot_pred = p if hot_pred is None else (hot_pred | p)
    # NULL keys make hot_pred NULL; coalesce keeps them on the cold path
    cold = combined.filter(~F.coalesce(hot_pred, F.lit(False)))
    cold_out = cold.withColumn(
        "_hit", F.last(F.col("_r"), ignorenulls=True).over(frame)
    )

    hot_out = _chunked_asof(
        combined.filter(hot_pred), keys, order, direction,
        n_chunks=min(
            max(
                math.ceil(
                    max(r["count"] for r in hot_keys)
                    / max(hot_key_threshold // 2, 1)
                ),
                2,
            ),
            _MAX_CHUNKS,
        ),
    )
    return _finish(
        cold_out.unionByName(hot_out.select(cold_out.columns)),
        payload, suffix,
    )


def _chunked_asof(
    hot: DataFrame, keys: list, order: list, direction: str,
    n_chunks: int,
) -> DataFrame:
    """The skew path: per-key quantile time chunks + boundary carry.

    _ord is a numeric shadow of _asof_ts oriented along WINDOW order
    (negated for forward), so chunk ids and the carry's running max are
    direction-agnostic.  chunk(ts) is a pure function of ts, so equal
    timestamps land in one chunk and the in-window inclusive tie
    semantics are untouched; the carry only answers rows whose latest
    qualifying right row lives in an EARLIER chunk."""
    ord_col = F.col("_asof_ts").cast("double")
    if direction == "forward":
        ord_col = -ord_col
    hot = hot.withColumn("_ord", ord_col)
    probs = [i / n_chunks for i in range(1, n_chunks)]
    bnds = hot.groupBy(*keys).agg(
        F.percentile_approx("_ord", probs).alias("_bnds")
    )
    # NULL _ord (left rows with NULL ts) fails the lambda => chunk 0,
    # where the nulls-first in-window order already resolves it to NULL
    hot = hot.join(F.broadcast(bnds), keys).withColumn(
        "_chunk",
        F.size(F.filter(F.col("_bnds"), lambda b: b < F.col("_ord"))),
    ).drop("_bnds")

    chunk_frame = (
        Window.partitionBy(*keys, "_chunk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = hot.withColumn(
        "_hit0", F.last(F.col("_r"), ignorenulls=True).over(chunk_frame)
    )

    # each chunk's FINAL right row = max struct(_ord, _r): first by
    # window position, then the same _r tie-break the window uses
    last_right = (
        hot.filter(F.col("_asof_side") == 0)
        .groupBy(*keys, "_chunk")
        .agg(F.max(F.struct(F.col("_ord"), F.col("_r"))).alias("_m"))
    )
    carry_frame = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_chunk").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # distinct-present chunks (not last_right's) seed the carry table so
    # right-row-free chunks still inherit from their predecessors; at
    # most n_keys x n_chunks rows, hence the broadcast back
    carry = (
        hot.select(*keys, "_chunk").distinct()
        .join(last_right, [*keys, "_chunk"], "left")
        .withColumn("_cm", F.max("_m").over(carry_frame))
        .select(*keys, "_chunk", F.col("_cm._r").alias("_carry_r"))
    )
    return (
        local.join(F.broadcast(carry), [*keys, "_chunk"], "left")
        .withColumn("_hit", F.coalesce(F.col("_hit0"), F.col("_carry_r")))
        .drop("_hit0", "_carry_r", "_ord", "_chunk")
    )


def _finish(out: DataFrame, payload: list, suffix: str) -> DataFrame:
    return (
        out.filter(F.col("_asof_side") == 1)
        .select(
            "*",
            *[F.col("_hit")[c].alias(f"{c}{suffix}") for c in payload],
        )
        .drop("_asof_ts", "_asof_side", "_r", "_hit")
    )
