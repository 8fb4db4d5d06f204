"""Run instrumentation — the reference's periodic counters re-expressed.

honas-gather dumps a one-line counter block every interval
(src/instrumentation.c:92-114): processed/accepted/skipped queries,
queries/sec, per-qtype counts (A/AAAA/NS/MX/PTR), RSS, and the
subnet-aggregate in/not-in counters.  The Spark-native equivalent is one
conditional aggregation over the ingest DataFrame: every counter is a
`sum(case when ...)` that rides the same scan (no extra pass per counter),
grouped by the query-type analog so per-type counts come from the same
shuffle-free job.

`dump_line` renders the exact single-line format the reference logs, so
downstream scrapers keep working.
"""

from __future__ import annotations

import json
import os
import resource
import time
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F


def instrument_run(
    df: DataFrame,
    accept: Optional[Column] = None,
    type_col: Optional[str] = None,
    category: Optional[Column] = None,
    wall_sec: Optional[float] = None,
) -> dict:
    """Compute the reference's instrumentation counters in ONE job.

    accept:   boolean Column marking rows that pass ingest filters
              (hygiene/oversize/qtype); None = everything accepted.
    type_col: the qtype analog (e.g. `ptr_mode`, `lang`, `event_type`) —
              per-type processed/accepted counts, one groupBy.
    category: boolean Column for the subnet-aggregate analog
              (in-category / not-in-category counts,
              instrumentation.c n_qcat/n_qncat).
    wall_sec: elapsed seconds; fills n_queries_sec like the reference's
              fixed-interval division.
    """
    t0 = time.time()
    acc = (accept if accept is not None else F.lit(True)).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_processed"),
        F.sum(acc).alias("n_accepted"),
    ]
    if category is not None:
        cat = category.cast("long")
        aggs.append(F.sum(cat).alias("n_in_category"))
        aggs.append(F.sum(1 - cat).alias("n_not_in_category"))

    if type_col is not None:
        rows = df.groupBy(type_col).agg(*aggs).collect()
        per_type = {
            str(r[type_col]): {
                "processed": int(r["n_processed"]),
                "accepted": int(r["n_accepted"]),
            }
            for r in rows
        }
        totals = {
            "n_processed": sum(r["n_processed"] for r in rows),
            "n_accepted": sum(r["n_accepted"] for r in rows),
        }
        if category is not None:
            totals["n_in_category"] = sum(r["n_in_category"] for r in rows)
            totals["n_not_in_category"] = sum(
                r["n_not_in_category"] for r in rows
            )
    else:
        r = df.agg(*aggs).collect()[0]
        per_type = {}
        # F.sum over zero rows returns NULL — coalesce to 0 driver-side
        totals = {k: int(r[k] or 0) for k in r.asDict()}

    elapsed = wall_sec if wall_sec is not None else (time.time() - t0)
    n_proc = int(totals["n_processed"])
    n_acc = int(totals["n_accepted"])
    metrics = {
        "n_processed_queries": n_proc,
        "n_accepted_queries": n_acc,
        "n_skipped_queries": n_proc - n_acc,
        "n_queries_sec": int(n_proc / elapsed) if elapsed > 0 else 0,
        "per_type": per_type,
        # driver RSS — the reference reports getrusage(RUSAGE_SELF) of its
        # single process (instrumentation.c:99-104); executor memory shows
        # up in the Spark metrics system instead
        "memory_usage_kb": resource.getrusage(
            resource.RUSAGE_SELF
        ).ru_maxrss,
        "n_queries_in_category": int(totals.get("n_in_category", 0)),
        "n_queries_not_in_category": int(
            totals.get("n_not_in_category", 0)
        ),
        "wall_sec": round(elapsed, 3),
    }
    return metrics


def dump_line(metrics: dict) -> str:
    """The reference's single-line dump format
    (instrumentation.c:107-113), per-type counts appended as n_q<type>."""
    parts = [
        f"n_proc={metrics['n_processed_queries']}",
        f"n_acc={metrics['n_accepted_queries']}",
        f"n_skip={metrics['n_skipped_queries']}",
        f"n_qsec={metrics['n_queries_sec']}",
    ]
    for t, c in sorted(metrics.get("per_type", {}).items()):
        parts.append(f"n_q{t}={c['processed']}")
    parts.append(f"mem_usg_kb={metrics['memory_usage_kb']}")
    parts.append(f"n_qcat={metrics['n_queries_in_category']}")
    parts.append(f"n_qncat={metrics['n_queries_not_in_category']}")
    return "Instrumentation: " + ",".join(parts)


def write_metrics(path: str, metrics: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=2)
    os.replace(tmp, path)
