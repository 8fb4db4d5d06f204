"""Deterministic sampling operators (training-pipeline additions)."""

from pyspark.sql import functions as F

from honas_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
    top_k_by_hash,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_hash_sample_rate_and_determinism(spark):
    df = _docs(spark)
    a = hash_sample(df, "text", 20)
    b = hash_sample(df, "text", 20)
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in b.collect()}
    assert ids_a == ids_b, "same input -> same sample"
    # ~20% within binomial noise (n=2000, p=.2 -> sigma~18)
    assert 300 < len(ids_a) < 500, len(ids_a)
    # stable under repartitioning
    ids_c = {
        r["doc_id"] for r in hash_sample(df.repartition(13), "text", 20).collect()
    }
    assert ids_c == ids_a
    # nested: a 10% sample is a subset of the 20% sample (same salt)
    ids_10 = {r["doc_id"] for r in hash_sample(df, "text", 10).collect()}
    assert ids_10 <= ids_a
    # different salt -> different (mostly) sample
    salted = {
        r["doc_id"] for r in hash_sample(df, "text", 20, salt="s1").collect()
    }
    assert salted != ids_a


def test_hash_sample_is_filter_only(spark):
    plan = hash_sample(_docs(spark), "text", 20)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_rates(spark):
    df = _docs(spark, 4000)
    out = stratified_hash_sample(
        df, "text", {"0": 50, "1": 10}, "lang"
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("2") is None and counts.get("3") is None
    assert 400 < counts["0"] < 600      # 50% of 1000
    assert 50 < counts["1"] < 160       # 10% of 1000


def test_top_k_by_hash_exact_k_and_stable(spark):
    df = _docs(spark)
    out = top_k_by_hash(df, "text", ["lang"], k=5)
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 5 for n in per.values()), per
    again = top_k_by_hash(df.repartition(7), "text", ["lang"], k=5)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in again.collect()
    }


def test_hash_bucket_range(spark):
    df = _docs(spark, 500).select(hash_bucket(F.col("text")).alias("b"))
    mm = df.agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= mm[0] and mm[1] <= 99
