"""Training-corpus preparation: deterministic global shuffle, exact
stratified splitting, context-window chunking, and salient-term
extraction — the corpus-side steps between a curated document table
and a tokenizer/trainer.

The reference engine ends at curated key sets (honas_search.c emits
hit sets; the gather side emits sketches); a pretraining pipeline over
the same document tables needs four more mechanical steps, each of
which must be DETERMINISTIC (re-runs and resumed jobs must agree) and
shuffle-frugal at 100 TB:

- `global_shuffle`: a reproducible random permutation of the corpus.
  Order key is md5(seed:id) — a pure projection — and the global
  position comes from the same range-repartition + per-partition
  prefix-offset pattern as operators/packing.py, so no Exchange
  SinglePartition ever materializes the corpus in one task.
- `stratified_split`: train/val/test labels with EXACT per-stratum
  quotas (row_number over md5 order within each stratum vs
  floor(n*cum_weight) thresholds).  One shuffle on the strata columns.
  A dominant stratum serializes its own window task, so the zero-
  shuffle approximate sibling `hash_split` (label from the hash value
  itself, no ranking) is the 100 TB default when quotas may be
  approximate.
- `chunk_docs`: overlapping (max_tokens, stride) token windows per
  document — one generate + projection, zero shuffle, no UDF.
- `salient_terms`: per-document top-k terms by TF-IDF.  Ranking is
  integer-exact (tf desc, doc-frequency asc, term asc) so the
  selection never depends on float rounding; the reported tf-idf
  score is informational and rounded.  The doc-frequency side is a
  vocabulary-sized aggregate joined back by term — Spark/AQE
  broadcasts it while it fits and shuffle-joins beyond.

DuckDB oracle twins for all four live in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import tokens
from .common import duckdb_round


def _seeded_key(seed: int, *cols) -> F.Column:
    """md5('{seed}:{col}:{col}...') — the cross-engine deterministic
    order key (hex string; DuckDB computes the identical value)."""
    return F.md5(
        F.concat_ws(
            ":", F.lit(str(int(seed))), *[c.cast("string") for c in cols]
        )
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """-> df columns + `shuffle_pos` (long): the row's position in a
    deterministic pseudorandom permutation keyed by (seed, id).

    Same-position guarantee across runs, partition layouts and
    parallelism levels: the order key is md5(seed:id) with the id
    itself as tie-break, both pure functions of the row.  Physical
    shape: range-repartition by the key, P per-partition counts
    collected as exclusive prefix offsets, row_number within each
    range partition + its offset — no single-task global sort
    (plan-asserted in tests/test_plans.py)."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.withColumn("_gs_key", _seeded_key(seed, F.col(id_col)))
        .repartitionByRange(p, F.asc("_gs_key"), F.asc(id_col))
        .withColumn("_gs_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    parts = ranged.groupBy("_gs_pid").count().collect()
    if not parts:
        return df.select(
            "*", F.lit(0).cast("long").alias("shuffle_pos")
        ).limit(0)
    acc, offs = 0, {}
    for r in sorted(parts, key=lambda r: r["_gs_pid"]):
        offs[r["_gs_pid"]] = acc
        acc += int(r["count"])
    off_map = F.create_map(
        *[
            lit
            for pid, o in offs.items()
            for lit in (F.lit(pid), F.lit(int(o)))
        ]
    )
    w = Window.partitionBy("_gs_pid").orderBy(
        F.asc("_gs_key"), F.asc(id_col)
    )
    return (
        ranged.withColumn(
            "shuffle_pos",
            (F.row_number().over(w) - 1 + off_map[F.col("_gs_pid")])
            .cast("long"),
        )
        .drop("_gs_key", "_gs_pid")
    )


def _validate_weights(weights: Mapping[str, float]) -> "list[tuple[str, float]]":
    items = list(weights.items())
    if len(items) < 2:
        raise ValueError("need >= 2 split labels")
    if any(w < 0 for _, w in items):
        raise ValueError(f"negative split weight: {weights}")
    total = sum(w for _, w in items)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1: {total}")
    return items


def stratified_split(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    weights: "Mapping[str, float] | None" = None,
    seed: int = 0,
) -> DataFrame:
    """-> df columns + `split` (string): exact per-stratum quotas.

    Within each stratum, rows rank by (md5(seed:id), id) and label i
    covers ranks (floor(n*cum_{i-1}), floor(n*cum_i)]; the final label
    absorbs the floor remainders, so every row is labeled and quotas
    are exact to the row.  Deterministic under re-runs and layout
    changes.  ONE shuffle (on the strata); a dominant stratum sorts in
    a single window task — prefer `hash_split` when the strata are
    skewed and approximate quotas suffice."""
    items = _validate_weights(
        weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    strata = list(strata_cols)
    w = Window.partitionBy(*strata).orderBy(
        F.asc("_ss_key"), F.asc(id_col)
    )
    cnt = Window.partitionBy(*strata)
    out = (
        df.withColumn("_ss_key", _seeded_key(seed, F.col(id_col)))
        .withColumn("_ss_r", F.row_number().over(w))
        .withColumn("_ss_n", F.count(F.lit(1)).over(cnt))
    )
    # flat CASE (one CaseWhen node): rank <= floor(n*cum_i) => label i
    cum = 0.0
    expr = None
    for label, wt in items[:-1]:
        cum += wt
        cond = F.col("_ss_r") <= F.floor(F.col("_ss_n") * F.lit(cum))
        expr = (F.when(cond, label) if expr is None
                else expr.when(cond, label))
    expr = expr.otherwise(items[-1][0])
    return out.withColumn("split", expr).drop(
        "_ss_key", "_ss_r", "_ss_n"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: "Mapping[str, float] | None" = None,
    seed: int = 0,
) -> DataFrame:
    """-> df columns + `split` (string): approximate quotas, ZERO
    shuffle.  The first 8 md5 hex digits of (seed:id) map to a uniform
    u in [0,1); label i covers [cum_{i-1}, cum_i).  The 100 TB default:
    a pure projection, immune to stratum skew, quotas within
    ~1/sqrt(n) of the weights.  Cross-engine exact (DuckDB computes
    the same md5 prefix arithmetic)."""
    items = _validate_weights(
        weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    u = F.conv(
        F.substring(_seeded_key(seed, F.col(id_col)), 1, 8), 16, 10
    ).cast("long") / F.lit(float(1 << 32))
    cum = 0.0
    expr = None
    for label, wt in items[:-1]:
        cum += wt
        cond = u < F.lit(cum)
        expr = (F.when(cond, label) if expr is None
                else expr.when(cond, label))
    return df.withColumn("split", expr.otherwise(items[-1][0]))


def chunk_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """-> (id, chunk_id, chunk_text, chunk_tokens): overlapping token
    windows starting at 0, stride, 2*stride, ... while the start is
    inside the document; each window holds up to `max_tokens`
    whitespace tokens.  Token-free documents yield no chunks.

    Pure generate + projection — zero shuffle, zero UDF, chunk ids and
    text derived entirely JVM-side (plan-asserted no-Exchange)."""
    if max_tokens < 1 or stride < 1:
        raise ValueError(
            f"max_tokens and stride must be >= 1: {max_tokens}, {stride}"
        )
    # the chunk struct is built INSIDE the generator input (transform
    # over the start offsets of the BOUND token column), so the
    # explode emits finished (chunk_id, chunk_text, chunk_tokens)
    # rows; the former explode(starts) + post-projection made
    # GenerateExec carry the full token array once PER CHUNK ROW —
    # O(tokens * chunks) copied bytes per document
    toks = tokens(F.col(text_col))
    n = F.size(F.col("_cd_toks"))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(int(stride)))
    ).otherwise(F.array().cast("array<int>"))

    def mk_chunk(s):
        piece = F.slice(F.col("_cd_toks"), s + 1, max_tokens)
        return F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("chunk_tokens"),
        )

    return (
        df.select(F.col(id_col), toks.alias("_cd_toks"))
        .select(
            F.col(id_col),
            F.explode(F.transform(starts, mk_chunk)).alias("_ck"),
        )
        .select(
            id_col,
            F.col("_ck.chunk_id").alias("chunk_id"),
            F.col("_ck.chunk_text").alias("chunk_text"),
            F.col("_ck.chunk_tokens").alias("chunk_tokens"),
        )
    )


def salient_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """-> (id, term, tf, doc_freq, tfidf, rank): each document's top-k
    terms.  rank orders by (tf desc, doc_freq asc, term asc) — an
    integer-exact key, so the selected set never depends on float
    rounding; `tfidf` = tf * ln((N+1)/(doc_freq+1)) rounded to 4
    decimals is carried for scoring consumers.

    Shape: explode -> (doc, term) counts (map-side combined), a
    vocabulary-sized doc-frequency aggregate joined back on term
    (broadcast while small — Spark/AQE decides), top-k via a window
    over the doc partition.  N (total docs) is a single driver scalar."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    n_docs = df.select(id_col).distinct().count()
    term_rows = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    # tf feeds BOTH the doc-frequency aggregate and the final join —
    # materialize it once or the corpus-sized explode+aggregation runs
    # twice
    tf = term_rows.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint()
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("doc_freq"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn(
            "tfidf",
            duckdb_round(
                F.col("tf")
                * F.log(F.lit(float(n_docs + 1)) / (F.col("doc_freq") + 1)),
                4,
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf", "rank")
    )


def rebalance_sources(
    df: DataFrame,
    source_col: str,
    id_col: str,
    target_parts: "Mapping[str, int]",
    seed: int = 0,
) -> DataFrame:
    """Domain-mixture rebalancing (the Pile/DoReMi-style static data
    mixing step): keep the LARGEST subset of the corpus whose source
    proportions exactly match integer target parts (e.g. {"web": 70,
    "books": 20, "code": 10}), by deterministically downsampling every
    over-represented source.

    -> df columns + `mix_rank` (long), filtered to the kept rows.

    Exact-quota arithmetic is integer end-to-end: the limiting source
    a = argmin n_s / w_s (ties by source name) fixes the scale, and
    each quota is (w_s * n_a) // w_a — no float ever decides a row, so
    a cross-engine oracle hash-matches the kept set.  Within a source,
    rows rank by (md5(seed:id), id) — the same portable uniform key as
    global_shuffle — so the selection is reproducible across runs,
    layouts and cluster sizes.

    Scale shape: one tiny groupBy-count collect (|sources| rows), one
    shuffle on the source for the ranking window, quotas applied via a
    broadcast join (no N-way CASE, so thousands of sources are fine).
    A dominant source sorts in a single window task — when sources are
    few and huge, the zero-shuffle approximation is a hash_split-style
    filter with p_s = quota_s / n_s instead of exact ranks."""
    if not target_parts:
        raise ValueError("target_parts must be non-empty")
    parts = {}
    for s, w in target_parts.items():
        if int(w) != w or w < 1:
            raise ValueError(
                f"target parts must be positive integers: {s}={w!r}"
            )
        parts[s] = int(w)
    counts = {
        r[source_col]: r["_n"]
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    unknown = sorted(set(counts) - set(parts))
    if unknown:
        raise ValueError(f"sources without a target part: {unknown}")
    spark = df.sparkSession
    # limiting source: smallest n/w (double ratio + name tie-break —
    # the oracle sorts the identical doubles); a part with no rows
    # makes every quota 0 (the target mix is unsatisfiable without it)
    ratios = sorted(
        (counts.get(s, 0) / w, s) for s, w in parts.items()
    )
    _, a = ratios[0]
    n_a, w_a = counts.get(a, 0), parts[a]
    quotas = spark.createDataFrame(
        [(s, (w * n_a) // w_a) for s, w in parts.items()],
        f"{source_col} string, _quota long",
    )
    win = Window.partitionBy(source_col).orderBy(
        F.asc("_mx_key"), F.asc(id_col)
    )
    return (
        df.withColumn("_mx_key", _seeded_key(seed, F.col(id_col)))
        .withColumn("mix_rank", F.row_number().over(win).cast("long"))
        .join(F.broadcast(quotas), source_col)
        .filter(F.col("mix_rank") <= F.col("_quota"))
        .drop("_mx_key", "_quota")
    )
