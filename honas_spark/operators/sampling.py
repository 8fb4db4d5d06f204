"""Deterministic sampling operators for training-data pipelines.

Random sampling is unusable at 100 TB pipeline scale: re-runs must pick
the SAME rows (resume/debug/AB-diff), and the sample must be stable under
repartitioning.  These operators derive the keep decision from a content
hash, so the sample is a pure projection/filter — no RNG state, no
shuffle, reproducible on any cluster layout, and exactly checkable
against a SQL oracle (md5 is available on both engines).

This is the sampling half of the reference's dry-run sizing flow (the
advice path samples traffic to size filters, README.md:642-647) made
deterministic and distributed."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets): first 8 hex digits of
    md5(salt || key) mod buckets.  Pure codegen built-ins."""
    h = F.md5(F.concat(F.lit(salt), col))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_pct: int,
    salt: str = "",
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose key hashes into the first `rate_pct` of `buckets`
    buckets — a deterministic ~rate_pct% sample, stable across runs and
    partitionings.  Zero shuffle (filter-only)."""
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < rate_pct)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    rates: dict,
    strata_col: str,
    salt: str = "",
    buckets: int = 100,
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language-balanced corpus
    cuts): rates maps stratum value -> keep percentage.  Still a pure
    filter — the rate lookup folds into a CASE chain."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < rate)


def top_k_by_hash(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY k rows per group, chosen uniformly-at-hash — the
    deterministic replacement for per-group reservoir sampling.  Rank by
    (hash, key) inside each group and keep rank <= k; one shuffle on the
    group key (same cost class as any per-group reservoir)."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(F.col(key_col), 1 << 31, salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
