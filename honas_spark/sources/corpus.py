"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

The primary input table per BASELINE.json `input_hint`:
    (repo string, path string, commit string, lang string, content string)
plus derived `commit_ts` (event time for window rotation) and the per-row
ingest-guard column `content_sha256 = sha2(content, 256)` computed at
generation time.

Generated entirely with Spark built-in expressions from `spark.range(n)` —
seeded, deterministic, distributed (no driver-side data), so the same
generator runs at any scale.  Skew is intentional: ~30%% of rows land in
one hot repo to exercise the skew-handling path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "parse", "merge",
    "index", "batch", "shard", "token", "lexer", "probe", "hash",
    "queue", "stack", "frame", "block", "chunk", "tree", "graph",
    "node", "edge", "count", "group", "window", "filter", "state",
    "sketch", "union", "digest", "stream", "buffer", "codec", "slice",
    "table", "column", "schema", "plan", "stage", "task", "write", "read",
]
_LANGS = ["py", "c", "rs", "go", "js", "UNKNOWN"]
_EXTS = ["py", "c", "rs", "go", "js", "txt"]
_EPOCH0 = "2024-01-01 00:00:00"


def generate_corpus(
    spark: SparkSession,
    n_rows: int,
    n_hours: int = 72,
    dup_fraction: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    df = spark.range(n_rows).withColumnRenamed("id", "row_id")
    rid = F.col("row_id")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    nv = len(_VOCAB)

    def pick(expr, salt: int):
        h = F.abs(F.xxhash64(expr, F.lit(seed), F.lit(salt)))
        return F.element_at(vocab, (h % nv + 1).cast("int"))

    # repo: Zipf-ish — 30% of rows in one hot repo (exercises salting/AQE)
    repo = F.when(
        rid % 10 < 3, F.lit("org0/repo0")
    ).otherwise(
        F.concat(
            F.lit("org"), (rid % 7).cast("string"),
            F.lit("/repo"), (rid % 97).cast("string"),
        )
    )

    # path: 1-4 slash-separated segments + extension (label-explode analog)
    nseg = (F.abs(F.xxhash64(rid, F.lit(seed), F.lit(101))) % 4).cast("int")
    seg = lambda i: pick(rid, 200 + i)  # noqa: E731
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _EXTS]),
        ((rid % len(_EXTS)) + 1).cast("int"),
    )
    path = F.concat(
        F.lit("src/"),
        F.concat_ws(
            "/",
            F.slice(F.array(seg(0), seg(1), seg(2)), F.lit(1), nseg),
        ),
        F.when(nseg > 0, F.lit("/")).otherwise(F.lit("")),
        pick(rid, 300), F.lit("."), ext,
    )

    # commit: sha1-like hex of the row id (deterministic)
    commit = F.substring(F.sha2(rid.cast("string"), 256), 1, 40)

    # commit_ts: spans n_hours hourly windows with in-hour jitter
    commit_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(_EPOCH0))
        + (rid % n_hours) * 3600
        + (rid * 7919) % 3600
    )

    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        ((rid % len(_LANGS)) + 1).cast("int"),
    )

    # content: 8-24 words, derived from a *collapsed* id so that
    # ~dup_fraction of rows share content with another row (idempotence /
    # cross-repo membership fixtures)
    base_n = max(int(n_rows * (1.0 - dup_fraction)), 1)
    cid = rid % base_n
    nwords = (8 + F.abs(F.xxhash64(cid, F.lit(seed), F.lit(400))) % 17).cast(
        "int"
    )
    words = F.transform(
        F.sequence(F.lit(1), nwords),
        lambda i: F.element_at(
            vocab,
            (
                F.abs(F.xxhash64(cid * 131 + i.cast("long"), F.lit(seed)))
                % nv
                + 1
            ).cast("int"),
        ),
    )
    content = F.array_join(words, " ")

    # PTR-mode analog (Quirk Q3): sparse flag, only the full name is stored
    ptr_mode = (rid % 37) == 0

    return df.select(
        rid.alias("row_id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        commit_ts.alias("commit_ts"),
        ptr_mode.alias("ptr_mode"),
        F.sha2(content, 256).alias("content_sha256"),
    )


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver-provided documents table onto the corpus shape:
    source->repo, a synthesized path, doc_id->commit, lang, text->content.
    Event time derives deterministically from doc_id (hourly windows)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rid = F.col("doc_id")
    return docs.select(
        rid.alias("row_id"),
        F.concat(F.lit("corpus/"), F.col("source")).alias("repo"),
        F.concat(
            F.lit("docs/"), F.col("lang"), F.lit("/doc_"),
            rid.cast("string"), F.lit(".txt"),
        ).alias("path"),
        F.substring(F.sha2(rid.cast("string"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(_EPOCH0)) + (rid % 6) * 3600
        ).alias("commit_ts"),
        F.lit(False).alias("ptr_mode"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )


def verify_content_sha(
    df: DataFrame,
    content_col: str = "content",
    sha_col: str = "content_sha256",
    on_mismatch: str = "drop",
) -> tuple[DataFrame, "DataFrame"]:
    """Per-row ingest guard (north rule): recompute sha2(content) and
    compare against the stored digest — corruption anywhere between
    generation and processing is caught HERE, before any key enters a
    sketch.  Pure codegen (one sha2 per row, no shuffle).

    on_mismatch: 'drop' filters bad rows, 'flag' keeps them with a
    `sha_ok` boolean, 'fail' raises if any mismatch exists.

    Returns (guarded df, mismatch-count df with one row:
    n_rows/n_mismatched — an action the caller runs when it wants the
    counts, e.g. for the instrumentation sink)."""
    # null-safe: a NULL content or NULL stored sha is a guard FAILURE
    # (coalesce to false), so the dropped-row count and n_mismatched agree
    ok = F.coalesce(
        F.sha2(F.col(content_col), 256) == F.col(sha_col), F.lit(False)
    )
    counts = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~ok).cast("long")).alias("n_mismatched"),
    )
    if on_mismatch == "flag":
        return df.withColumn("sha_ok", ok), counts
    if on_mismatch == "fail":
        n_bad = counts.collect()[0]["n_mismatched"]
        if n_bad:
            raise ValueError(
                f"content sha256 guard: {n_bad} corrupted rows"
            )
        return df, counts
    return df.filter(ok), counts
