"""Watermarked windowed aggregation: finished windows emit once in
append mode; rows later than the watermark are dropped."""

from pyspark.sql import functions as F

from honas_spark.streaming.windowed import windowed_event_counts


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    ).write.mode("append").parquet(path)


def test_watermark_emits_closed_windows_and_drops_too_late(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id string, ts timestamp"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_event_counts(
                stream, window="1 hour", watermark="2 hours"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def emitted():
        try:
            return {
                str(r["window_start"]): r["n_events"]
                for r in spark.read.schema(
                    "window_start timestamp, n_events long"
                ).parquet(out).collect()
            }
        except Exception:
            return {}

    # run 1: three rows in hour 0, one in hour 3 -> watermark advances
    # to 01:00 (3:00 - 2h) AFTER the batch; nothing emitted yet
    _write(spark, src, [
        ("u1", "2024-01-01 00:10:00"),
        ("u2", "2024-01-01 00:20:00"),
        ("u3", "2024-01-01 00:40:00"),
        ("u1", "2024-01-01 03:00:00"),
    ])
    run_once()

    # run 2: a TOO-LATE row for hour 0 (watermark is already 01:00) must
    # be dropped; the hour-6 row pushes the watermark past hour 3
    _write(spark, src, [
        ("u9", "2024-01-01 00:30:00"),   # later than watermark -> dropped
        ("u1", "2024-01-01 06:00:00"),
    ])
    run_once()
    got = emitted()
    assert got.get("2024-01-01 00:00:00") == 3, got  # late row NOT counted

    # run 3: advance watermark so the hour-3 window also closes
    _write(spark, src, [("u1", "2024-01-01 09:00:00")])
    run_once()
    got = emitted()
    assert got.get("2024-01-01 03:00:00") == 1, got
    assert got.get("2024-01-01 00:00:00") == 3, got
