"""Instrumentation counters (S9, src/instrumentation.c:92-114)."""

from pyspark.sql import functions as F

from honas_spark.instrumentation import dump_line, instrument_run


def test_counters_and_dump_format(spark):
    df = spark.createDataFrame(
        [("a", "x" * 10), ("a", "y" * 300), ("b", ""), ("b", "ok")],
        "t string, payload string",
    )
    m = instrument_run(
        df,
        accept=(F.length("payload") >= 1) & (F.length("payload") <= 100),
        type_col="t",
        category=F.col("t") == "a",
        wall_sec=2.0,
    )
    assert m["n_processed_queries"] == 4
    assert m["n_accepted_queries"] == 2      # 10-char and 'ok'
    assert m["n_skipped_queries"] == 2       # oversize + empty
    assert m["n_queries_sec"] == 2
    assert m["per_type"] == {
        "a": {"processed": 2, "accepted": 1},
        "b": {"processed": 2, "accepted": 1},
    }
    assert m["n_queries_in_category"] == 2
    assert m["n_queries_not_in_category"] == 2
    line = dump_line(m)
    assert line.startswith("Instrumentation: n_proc=4,n_acc=2,n_skip=2,")
    assert "n_qa=2" in line and "n_qb=2" in line
    assert "n_qcat=2" in line and "n_qncat=2" in line


def test_no_type_no_category(spark):
    df = spark.range(7)
    m = instrument_run(df.select(F.col("id").cast("string").alias("k")))
    assert m["n_processed_queries"] == 7
    assert m["n_accepted_queries"] == 7
    assert m["per_type"] == {}
