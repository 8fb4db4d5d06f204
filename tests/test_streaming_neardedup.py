"""Stateful streaming near-dedup: LSH band-bucket state spans
micro-batches and restarts; arriving near-copies are flagged against
the earlier document's id with a MinHash similarity estimate."""

import pytest

from honas_spark.streaming.neardedupe import near_dedup_stream

SCHEMA = "doc_id long, text string"

A = ("the quick brown fox jumps over the lazy dog while seventeen "
     "sleepy badgers watch from a mossy log near the old stone bridge")
A_NEAR = A.replace("dog", "cat")  # one-word edit: Jaccard ~0.84
B = "completely different words live in this document instead now"
C = "yet another unrelated piece of text with its own vocabulary"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _run_once(spark, src, out, ckpt, **kw):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        near_dedup_stream(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_near_dedup_stream_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: original + unrelated docs (+ a blank: must never match)
    _write(spark, src, [(1, A), (2, B), (3, "   ")])
    kw = dict(num_hashes=16, bands=8, threshold=0.5)
    _run_once(spark, src, out, ckpt, **kw)
    assert spark.read.parquet(out).count() == 0  # nothing matches yet

    # batch 2 in a FRESH query (restart): a near-copy of doc 1 arrives
    # a "day" later — must flag against the checkpointed bucket state;
    # an unrelated doc must not
    _write(spark, src, [(10, A_NEAR), (11, C)])
    _run_once(spark, src, out, ckpt, **kw)
    rows = spark.read.parquet(out).collect()
    by_doc = {}
    for r in rows:
        cur = by_doc.get(r["doc_id"])
        if cur is None or r["n_eq"] > cur[1]:
            by_doc[r["doc_id"]] = (r["rep_id"], r["n_eq"])
    assert 10 in by_doc, rows
    rep, n_eq = by_doc[10]
    assert rep == 1
    assert n_eq >= 8  # one-word edit: most of 16 minhashes agree
    assert 11 not in by_doc  # unrelated never flags
    assert 1 not in by_doc and 2 not in by_doc  # originals unflagged

    # batch 3: an exact copy of the near-dup — flags at full agreement
    # against the earliest bucket member (doc 1 or 10, both valid reps)
    _write(spark, src, [(20, A)])
    _run_once(spark, src, out, ckpt, **kw)
    rows = [r for r in spark.read.parquet(out).collect()
            if r["doc_id"] == 20]
    assert rows
    assert max(r["n_eq"] for r in rows) == 16  # identical signature
    assert all(r["rep_id"] in (1, 10) for r in rows)


def test_near_matcher_ttl_eviction_unit():
    """The matcher's timeout branch drops the bucket state and emits
    nothing; the live branch re-arms the sliding TTL after updating.
    Driven directly with a fake GroupState (the timeout FIRING is
    processing-time-driven and not deterministically reachable under
    availableNow triggers)."""
    import pandas as pd

    from honas_spark.streaming.neardedupe import _near_matcher

    class FakeState:
        def __init__(self, existing=None):
            self._v = existing
            self.exists = existing is not None
            self.hasTimedOut = False
            self.removed = False
            self.timeout_set = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self.removed = True
            self._v = None
            self.exists = False

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    fn = _near_matcher(4, 2, 10, ttl_ms=60_000)

    # timed-out invocation: state dropped, no output
    st = FakeState(existing=([1], [5, 6, 7, 8]))
    st.hasTimedOut = True
    assert list(fn((0, 123), iter([]), st)) == []
    assert st.removed

    # live invocation: near-copy flagged against the stored member,
    # state updated, TTL re-armed
    st2 = FakeState(existing=([1], [5, 6, 7, 8]))
    pdf = pd.DataFrame({"_id": [2], "sig": [[5, 6, 0, 0]]})
    out = list(fn((0, 123), iter([pdf]), st2))
    assert len(out) == 1 and out[0].iloc[0]["rep_id"] == 1
    assert st2.timeout_set == 60_000
    assert st2.get[0] == [1, 2]


def test_near_dedup_stream_runs_with_ttl(spark, tmp_path):
    """Wiring: the TTL'd query plans and runs end-to-end (ProcessingTime
    timeout mode) and still flags an in-run near-copy."""
    src = str(tmp_path / "docs")
    out = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, A)])
    _run_once(spark, src, out, ckpt, num_hashes=16, bands=8,
              state_ttl_minutes=60)
    _write(spark, src, [(10, A.replace("dog", "cat"))])
    _run_once(spark, src, out, ckpt, num_hashes=16, bands=8,
              state_ttl_minutes=60)
    rows = spark.read.parquet(out).collect()
    assert any(r["doc_id"] == 10 and r["rep_id"] == 1 for r in rows)


def test_near_dedup_stream_validates_bands(spark, tmp_path):
    src = str(tmp_path / "docs")
    _write(spark, src, [(1, A)])  # the source dir must exist
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="evenly divide"):
        near_dedup_stream(stream, num_hashes=8, bands=3)
