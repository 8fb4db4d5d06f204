"""Stateful streaming exact-dedup: the seen-set spans micro-batches and
restarts; each distinct document is kept exactly once."""

from honas_spark.streaming.dedupe import dedup_stream

SCHEMA = "doc_id long, text string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def test_dedup_stream_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: in-batch duplicate (2 == normalized 1) + distinct doc
    _write(spark, src, [
        (1, "the quick brown fox"),
        (2, "THE  quick   brown fox"),   # normalized dup of 1
        (3, "something else entirely"),
    ])
    run_once()
    got = {r["doc_id"]: (r["keep"], r["rep_id"])
           for r in spark.read.parquet(out).collect()}
    assert got == {1: (1, 1), 2: (0, 1), 3: (1, 3)}

    # batch 2 in a FRESH query (restart): late duplicates of both docs
    # must be dropped against the checkpointed seen-set; a new doc kept
    _write(spark, src, [
        (10, "the quick brown fox"),
        (11, "something else entirely"),
        (12, "genuinely new text"),
    ])
    run_once()
    got = {r["doc_id"]: (r["keep"], r["rep_id"])
           for r in spark.read.parquet(out).collect()}
    assert got[10] == (0, 1) and got[11] == (0, 3)
    assert got[12] == (1, 12)
    assert sum(k for k, _ in got.values()) == 3  # 1, 3, 12
