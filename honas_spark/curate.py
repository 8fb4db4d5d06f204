"""The training-data curation pipeline as ONE composable DataFrame
transform: quality features + language ID + PII scrubbing + repetition
signals + cross-doc span duplication + near-dedup (+ optional benchmark
decontamination), all existing gated operators strung together.

This is the product path: the `curate` CLI materializes it to parquet,
and the driver gate verifies the whole composition per-document against
a DuckDB oracle built from the per-operator SQL (queries()["curate"]).

Scale shape: every stage is one of the individually scale-audited
operators (map-side-partial aggregations, capped LSH buckets, pointer-
jumping components); the composition adds only per-doc-id equi-joins,
which AQE plans as shuffle joins on the same key — no new shuffle
pattern beyond the stages themselves.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .functions.text import language_guess, quality_features, scrub_pii
from .operators.dedup import near_dedup
from .operators.quality import (
    contamination_flags,
    ngram_repetition,
    span_dup_stats,
)


def curate_annotations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_df: Optional[DataFrame] = None,
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    min_num: int = 4,
    min_den: int = 5,
    span_k: int = 8,
    rep_n: int = 2,
    decontam_n: int = 13,
    max_bucket_size: "int | None" = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Annotate every document with the full curation signal set.

    Output: the input columns plus n_chars_q/n_tokens/n_unique_tokens/
    n_stopwords/n_punct, lang_guess, n_email/n_ipv4/n_phone +
    text_scrubbed, n_grams/n_uniq/max_gram/dup_occ (Gopher repetition),
    n_spans/n_dup_spans (C4 repeated-span), component/keep (near-dup
    cluster + representative flag), and contaminated when eval_df is
    given.  Filter keep=1 AND contaminated=0 downstream to materialize
    the curated corpus.

    hash_fn="md5" makes the near-dedup stage's minhash family portable
    so a SQL oracle can recompute the IDENTICAL banding collisions —
    the cross-engine verification knob (xxhash64 stays the production
    default)."""
    annotated = quality_features(docs, text_col).withColumn(
        "lang_guess", language_guess(F.col(text_col))
    )
    annotated = scrub_pii(annotated, text_col)
    rep = ngram_repetition(docs, id_col, text_col, n=rep_n)
    spans = span_dup_stats(docs, id_col, text_col, k=span_k)
    dd = near_dedup(
        docs, id_col, text_col, num_hashes=num_hashes, n=shingle_n,
        bands=bands, min_num=min_num, min_den=min_den,
        max_bucket_size=max_bucket_size, hash_fn=hash_fn,
    )
    annotated = (
        annotated.join(rep, id_col).join(spans, id_col).join(dd, id_col)
    )
    if eval_df is not None:
        annotated = annotated.join(
            contamination_flags(
                docs, eval_df, id_col, text_col, n=decontam_n
            ).select(id_col, "contaminated"),
            id_col,
        )
    return annotated
