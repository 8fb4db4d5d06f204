"""Stateful streaming sessionization (applyInPandasWithState): sessions
span micro-batches and RESTARTS; a gap closes + emits exactly once."""

import time

from pyspark.sql import functions as F

from honas_spark.streaming.sessions import sessionize_stream

GAP = 600  # seconds


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    ).write.mode("append").parquet(path)


def test_sessions_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    t0 = "2024-01-01 00:00:00"
    t1 = "2024-01-01 00:05:00"     # within gap of t0
    t2 = "2024-01-01 02:00:00"     # > gap after t1 -> closes session 1
    t3 = "2024-01-01 02:01:00"     # within gap of t2

    schema = "user_id string, ts timestamp"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sessionize_stream(stream, gap_sec=GAP)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: an open session for u1 and one event for u2
    _write(spark, src, [("u1", t0), ("u1", t1), ("u2", t0)])
    run_once()
    got = spark.read.schema(
        "user_id string, session_start long, session_end long, n_events int"
    ).parquet(out)
    assert got.count() == 0, "no gap crossed yet -> nothing emitted"

    # batch 2 in a FRESH query (restart): u1's new events are > gap away,
    # so the session held in the checkpointed state store must close
    _write(spark, src, [("u1", t2), ("u1", t3)])
    run_once()
    rows = {
        (r["user_id"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("u1", 2) in rows, rows
    start, end = rows[("u1", 2)]
    assert end - start == 300  # t0 -> t1
    # u2's single event and u1's new session are still open (no emission)
    assert ("u2", 1) not in rows
    assert len(rows) == 1
