"""Streaming Misra-Gries heavy hitters: per-group summaries persist
across micro-batches and restarts; state is bounded at capacity
entries per group; exact when capacity covers the distinct count."""

import pytest

from honas_spark.streaming.heavyhitters import heavy_hitters_stream

SCHEMA = "token string"


def _write(spark, path, tokens):
    spark.createDataFrame([(t,) for t in tokens], SCHEMA).write.mode(
        "append"
    ).parquet(path)


def _run_once(spark, src, out, ckpt, **kw):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        heavy_hitters_stream(stream, "token", **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _latest(spark, out):
    """Latest snapshot per group -> {token: est_count}."""
    rows = spark.read.parquet(out).collect()
    last_seen = {}
    for r in rows:
        if r["grp"] not in last_seen or r["n_seen"] > last_seen[r["grp"]]:
            last_seen[r["grp"]] = r["n_seen"]
    return {
        r["token"]: r["est_count"]
        for r in rows
        if r["n_seen"] == last_seen[r["grp"]]
    }


def test_stream_exact_when_capacity_covers_and_restart(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    kw = dict(capacity=64, num_state_groups=4)

    _write(spark, src, ["a"] * 5 + ["b"] * 3 + ["c"])
    _run_once(spark, src, out, ckpt, **kw)
    assert _latest(spark, out) == {"a": 5, "b": 3, "c": 1}

    # second wave in a FRESH query: counts accumulate across restart
    _write(spark, src, ["a"] * 2 + ["c"] * 4 + ["d"])
    _run_once(spark, src, out, ckpt, **kw)
    assert _latest(spark, out) == {"a": 7, "b": 3, "c": 5, "d": 1}


def test_stream_state_bounded_and_mg_guarantee(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # 60 distinct tokens, one hot token, ONE state group with tiny
    # capacity: state can never exceed capacity entries, the hot token
    # must survive, and every estimate is within n/c of truth
    tokens = [f"t{i}" for i in range(60)] * 2 + ["hot"] * 50
    _write(spark, src, tokens)
    _run_once(spark, src, out, ckpt, capacity=8, num_state_groups=1)
    got = _latest(spark, out)
    n = len(tokens)
    assert len(got) <= 8
    assert "hot" in got  # true count 50 > n/c = 21.25
    assert got["hot"] <= 50 and got["hot"] >= 50 - n / 8


def test_stream_null_and_validation(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write(spark, src, ["x", None, "x"])
    _run_once(spark, src, out, ckpt, capacity=4, num_state_groups=2)
    assert _latest(spark, out) == {"x": 2}
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_stream(
            spark.readStream.schema(SCHEMA).parquet(src), "token",
            capacity=0,
        )
    with pytest.raises(ValueError, match="hash_fn"):
        heavy_hitters_stream(
            spark.readStream.schema(SCHEMA).parquet(src), "token",
            hash_fn="sha1",
        )
