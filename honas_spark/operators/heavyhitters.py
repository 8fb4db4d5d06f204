"""Misra-Gries / SpaceSaving heavy hitters — the classic mergeable
frequency-summary sketch, joining Bloom/HLL/CMS/KLL/t-digest as a
sibling UDAF under the same two-phase merge protocol.

Guarantee (Misra-Gries with capacity c over n items): every reported
count satisfies true - n/c <= est <= true, and any item with true
count > n/c appears in the summary.  Merging two summaries adds their
counts and re-prunes to capacity; the errors ADD (Agarwal et al. 2013,
Mergeable Summaries) — the property that makes the two-phase Spark
plan correct: per-partition summaries (bounded, capacity entries)
merge associatively into one global summary.

Physical shape: phase 1 builds one MG summary per input partition in a
vectorized pandas pass (value_counts + threshold subtraction — no
per-row Python); the shuffle carries only P x capacity (token, count)
rows; phase 2 reduces them with the MG merge in a single tiny task.
With capacity >= the true distinct count the summary is EXACT (no
pruning ever fires), which is how the driver gate pins the algebra
end-to-end while the bound tests exercise the lossy path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def mg_summarize(counts: "pd.Series", capacity: int) -> "pd.Series":
    """Prune a token->count series to <= capacity entries by the
    Misra-Gries rule: subtract the (capacity+1)-th largest count from
    every entry and drop the non-positive remainder.  Exact when the
    input already fits."""
    if len(counts) <= capacity:
        return counts
    srt = counts.sort_values(ascending=False)
    thresh = int(srt.iloc[capacity])
    out = srt - thresh
    return out[out > 0]


def mg_merge(
    a: "pd.Series", b: "pd.Series", capacity: int
) -> "pd.Series":
    """Merge two MG summaries: counter-add shared tokens, union the
    rest, re-prune to capacity.  Associative/commutative up to the
    documented additive error."""
    merged = a.add(b, fill_value=0).astype("int64")
    return mg_summarize(merged, capacity)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: "int | None" = None,
) -> DataFrame:
    """-> (token, est_count) for the top-k tokens by estimated count,
    est descending then token ascending (deterministic).  NULL tokens
    are ignored.  capacity defaults to 8*k (error <= n/(8k)); raise it
    toward the distinct count for exactness."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    cap = int(capacity or 8 * k)
    if cap < k:
        raise ValueError(f"capacity ({cap}) must be >= k ({k})")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: "pd.Series | None" = None
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            if not len(vc):
                continue
            acc = vc if acc is None else mg_merge(acc, vc, cap)
        if acc is None:
            return
        acc = mg_summarize(acc, cap)
        yield pd.DataFrame(
            {"token": acc.index.astype(str), "cnt": acc.to_numpy()}
        )

    def reduce_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: "pd.Series | None" = None
        for pdf in batches:
            if not len(pdf):
                continue
            s = pdf.set_index("token")["cnt"]
            s = s.groupby(level=0).sum()  # same token across inputs
            acc = s if acc is None else mg_merge(acc, s, cap)
        if acc is None:
            return
        top = acc.sort_values(ascending=False)
        yield pd.DataFrame(
            {"token": top.index.astype(str), "cnt": top.to_numpy()}
        )

    partial = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partials, "token string, cnt long"
    )
    # phase 2: all partial summaries (P x capacity rows) reduce in one
    # task — coalesce(1) is the tree root, not a data bottleneck
    merged = partial.coalesce(1).mapInPandas(
        reduce_all, "token string, cnt long"
    )
    return (
        merged.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
        .select("token", F.col("cnt").alias("est_count"))
    )
