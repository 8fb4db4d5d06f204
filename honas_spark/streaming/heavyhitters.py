"""Streaming Misra-Gries heavy hitters: a continuously-maintained
frequency summary over an unbounded token stream — the streaming twin
of operators/heavyhitters.py, sharing its mg_merge/mg_summarize kernel
(same algebra, same additive-error guarantee).

Shape: tokens hash-route to a fixed number of STATE GROUPS (pmod of a
deterministic hash), so each distinct token always lands in the same
group and each group's MG summary is a correct summary of its token
subset.  Per micro-batch, a group's arriving tokens reduce to
value_counts in one pandas pass and mg_merge into the group's state;
the state is bounded at `capacity` (token, count) pairs per group BY
THE ALGORITHM — no TTL needed, the sketch itself is the bound.

After each batch a group emits its full current summary tagged with
`n_seen` (items processed by the group so far, strictly increasing),
so an append-mode sink accumulates snapshots and "latest summary per
group" = the max-n_seen snapshot — which is how the cross-engine gate
reads the final answer.  Global top-k = mg_merge of the group
summaries (driver-side or a downstream batch job over the snapshot
table; groups partition the token space, so for the LATEST snapshots a
plain concat is already the global summary — no cross-group token can
exist in two groups).

Guarantee per group: with n_g items seen and capacity c, every
reported count is within n_g/c of truth and any token with true count
> n_g/c is present; with capacity >= the group's distinct count the
summary is EXACT (how the driver gate pins it, while bound tests
exercise the lossy path).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import functions as F

from ..operators.heavyhitters import mg_merge, mg_summarize


def _mg_updater(capacity: int):
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cnts, n_seen = state.get
            acc = pd.Series(
                list(cnts), index=list(toks), dtype="int64"
            )
        else:
            acc, n_seen = None, 0
        batch_n = 0
        for pdf in pdfs:
            vc = pdf["_v"].dropna().value_counts()
            if not len(vc):
                continue
            batch_n += int(vc.sum())
            vc = mg_summarize(vc.astype("int64"), capacity)
            acc = vc if acc is None else mg_merge(acc, vc, capacity)
        if batch_n == 0 or acc is None:
            return
        n_seen += batch_n
        state.update((
            [str(t) for t in acc.index],
            [int(c) for c in acc.to_numpy()],
            n_seen,
        ))
        out = acc.sort_values(ascending=False)
        yield pd.DataFrame({
            "grp": [int(key[0])] * len(out),
            "token": out.index.astype(str),
            "est_count": out.to_numpy(dtype="int64"),
            "n_seen": [n_seen] * len(out),
        })

    return fn


def heavy_hitters_stream(
    stream_df,
    value_col: str,
    capacity: int = 256,
    num_state_groups: int = 32,
    hash_fn: str = "xxhash64",
):
    """stream_df -> append-mode stream of (grp, token, est_count,
    n_seen): each micro-batch, every state group that received tokens
    emits its refreshed MG summary.  NULL values are ignored.

    num_state_groups sets stateful parallelism (each group is one
    state-store key); capacity bounds both state size and error.
    hash_fn "md5" is the portable routing family the cross-engine
    oracle can replay; "xxhash64" is the production default."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    if num_state_groups < 1:
        raise ValueError(
            f"num_state_groups must be >= 1: {num_state_groups}"
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    v = F.col(value_col).cast("string")
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(v), 1, 15), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64(v)
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5: {hash_fn}")
    routed = stream_df.select(
        F.pmod(h, F.lit(num_state_groups)).cast("int").alias("_g"),
        v.alias("_v"),
    ).filter(F.col("_v").isNotNull())
    return routed.groupBy("_g").applyInPandasWithState(
        _mg_updater(int(capacity)),
        "grp int, token string, est_count long, n_seen long",
        "toks array<string>, cnts array<long>, n_seen long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
