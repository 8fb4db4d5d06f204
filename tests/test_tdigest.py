"""t-digest sibling: rank-error bounds, merge behavior, serialization,
and the generic quantile_sketch_agg operator (both families)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from honas_spark import kernels as K


def test_tdigest_rank_error():
    rng = np.random.default_rng(7)
    data = rng.normal(size=100_000)
    td = K.TDigest(100)
    for chunk in np.array_split(data, 25):
        td.add(chunk)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        true_rank = np.searchsorted(srt, est) / data.size
        # t-digest tail accuracy is much better than the middle
        tol = 0.005 if q in (0.01, 0.99) else 0.02
        assert abs(true_rank - q) < tol, (q, est, true_rank)


def test_tdigest_merge_preserves_bounds():
    rng = np.random.default_rng(8)
    data = rng.exponential(size=80_000)
    parts = np.array_split(data, 8)
    digs = []
    for p in parts:
        t = K.TDigest(100)
        t.add(p)
        digs.append(t)
    merged = digs[0]
    for t in digs[1:]:
        merged = merged.merge(t)
    assert merged.n == data.size
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = merged.quantile(q)
        true_rank = np.searchsorted(srt, est) / data.size
        assert abs(true_rank - q) < 0.02


def test_tdigest_centroid_count_bounded():
    td = K.TDigest(100)
    rng = np.random.default_rng(9)
    td.add(rng.uniform(size=50_000))
    td._compress()
    assert td.means.size < 2 * td.delta


def test_tdigest_serialization_roundtrip():
    td = K.TDigest(64)
    td.add(np.arange(5_000, dtype=np.float64))
    blob = td.to_bytes()
    back = K.TDigest.from_bytes(blob)
    assert back.n == td.n
    assert back.quantile(0.5) == td.quantile(0.5)


@pytest.mark.parametrize("family", ["tdigest", "kll"])
def test_quantile_sketch_agg_operator(spark, family):
    from honas_spark.operators.quantiles import quantile_sketch_agg

    df = (
        spark.range(20_000)
        .withColumn("g", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id").cast("double"))
    )
    out = {
        r["g"]: r
        for r in quantile_sketch_agg(
            df, ["g"], "v", sketch=family, quantiles=(0.5,)
        ).collect()
    }
    assert out["0"]["n"] == 10_000
    # group 0 holds the even ids 0..19998 -> median ~9999
    assert abs(out["0"]["q_50"] - 9999) < 500
    assert abs(out["1"]["q_50"] - 10000) < 500
