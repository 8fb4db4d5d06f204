"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState.

The batch engine already sessionizes with window functions (the
`sessionize` query); streams can't — a session may span micro-batches, so
per-user state (open session start/last/count) must live in the state
store.  This is the canonical custom-stateful shape the engine needs for
anything honas-like running continuously (per-client activity episodes,
rate windows, dwell times).

Semantics:
  * events for a user arriving <= gap_sec after the previous one extend
    the open session;
  * a larger gap closes the session (emitted) and opens a new one;
  * optionally (`idle_timeout=True`, for continuously-running queries) a
    processing-time timeout of `gap_sec` flushes idle open sessions;
    default is NoTimeout so availableNow/batch-drain triggers terminate
    promptly — an idle session then closes on the user's next event;
  * state survives micro-batches AND restarts via the streaming
    checkpoint (tested).

Scale shape: state is 3 longs per user; the shuffle is the groupBy(user)
every stateful operator pays; batches arrive as Arrow frames, per-batch
work is a vectorized sort + one Python loop over the (tiny) per-user
event list."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd


def _sessionizer(
    gap_sec: int, user_col: str, ts_col: str, idle_timeout: bool
):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, l, n = state.get
                closed.append((key[0], s, l, int(n)))
            state.remove()
        else:
            epochs: list = []
            for pdf in pdfs:
                if len(pdf):
                    col = pd.to_datetime(pdf[ts_col])
                    epochs.extend(
                        (col.astype("int64") // 10**9).tolist()
                    )
            epochs.sort()
            if state.exists:
                s, l, n = state.get
            else:
                s = l = None
                n = 0
            for e in epochs:
                if s is None:
                    s, l, n = e, e, 1
                elif e - l > gap_sec:
                    closed.append((key[0], s, l, int(n)))
                    s, l, n = e, e, 1
                else:
                    l, n = max(l, e), n + 1
            if s is not None:
                state.update((int(s), int(l), int(n)))
                if idle_timeout:
                    state.setTimeoutDuration(gap_sec * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[user_col, "session_start", "session_end",
                         "n_events"],
            )

    return fn


def sessionize_stream(
    stream_df,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
    idle_timeout: bool = False,
):
    """stream_df (streaming DataFrame with user_col, ts_col) ->
    append-mode stream of closed sessions
    (user, session_start epoch, session_end epoch, n_events).

    idle_timeout=True arms a processing-time timeout that flushes idle
    sessions — use on continuously-running queries only (an armed
    timeout keeps availableNow triggers alive until it fires)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{user_col} string, session_start long, session_end long,"
        " n_events int"
    )
    state_schema = "s long, l long, n long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(user_col).applyInPandasWithState(
        _sessionizer(gap_sec, user_col, ts_col, idle_timeout),
        out_schema,
        state_schema,
        "append",
        timeout,
    )
