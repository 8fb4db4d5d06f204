"""Bloom-pruned equi-join — explicit row-level join pruning.

The classic 100 TB join problem: a fact table joins a dimension whose
matching keys cover a tiny fraction of the fact rows, yet the fact side
still pays a full shuffle before the join discards the misses.  A Bloom
filter of the build side's keys, broadcast to the probe side's scan
tasks, drops non-matching rows BEFORE the exchange — shuffled bytes
scale with the match rate + FPR instead of the input size.

Spark 3.3+ has an optimizer version of this (runtime bloom-filter
pruning, `spark.sql.optimizer.runtime.bloomFilter.*`) that fires only
under cost heuristics and only inside one query plan.  This operator is
the EXPLICIT, deterministic form built on the package's own Bloom
kernel (kernels.bloom_zero/bloom_build/bloom_probe with the
Kirsch-Mitzenmacher 64-bit offset derivation): callable across
plan boundaries (build once, prune many queries / a whole stream),
sized from the published (1-e^{-kn/m})^k bound, and its FPR is
measurable (fill rate is in the returned stats).

Correctness is unconditional: pruning keeps a SUPERSET of matching rows
(Bloom filters have no false negatives) and the final equi-join removes
the false positives, so the output is exactly the plain join's.

Plan shape:
  build:  one scan of the small side -> per-partition packed filters
          (mapInPandas, xxhash64 folded JVM-side so raw keys never
          reach Python) -> OR-merge of P tiny rows on the driver.
  probe:  the packed filter ships as a TorrentBroadcast; a vectorized
          pandas_udf probes ONLY the 8-byte hash column (the row's
          other columns never cross into Python) and the JVM filters on
          the returned boolean -> shuffle of survivors only -> join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType

from .. import kernels as K


def build_key_bloom(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int | None = None,
    k: int | None = None,
    fpp: float = 1e-3,
) -> tuple[bytes, dict]:
    """One pass over `df` -> (packed Bloom filter over xxhash64(key),
    stats dict).  Auto-sizing (m_bits=None) counts the side first and
    applies the reference sizing math (kernels.bloom_filter_size /
    optimal_k, src/advice.c:36-51) for the requested `fpp`; pass m_bits
    explicitly to skip that extra scan.  The filter is bounded
    (m_bits/8 bytes) regardless of input size — the caller chooses the
    memory/FPR trade, not the data."""
    import math

    if m_bits is None:
        n = max(int(df.count()), 1)
        m_bits = max(K.bloom_filter_size(fpp, n) * 8, 64)
        m_bits = (m_bits + 63) & ~63  # whole 8-byte words
    if k is None:
        # when m is sized for fpp, the optimal k collapses to
        # -log2(fpp) independent of n (m/n*ln2 = -log2(fpp))
        k = max(int(round(-math.log2(fpp))), 1)

    hashed = df.select(F.xxhash64(F.col(key_col)).alias("_h"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        filt = K.bloom_zero(m_bits)
        n_keys = 0
        for pdf in batches:
            if pdf.empty:
                continue
            keys = pdf["_h"].dropna().to_numpy(dtype=np.int64)
            if keys.size == 0:
                continue
            K.bloom_build(
                filt, K.bloom64_offsets(keys.view(np.uint64), m_bits, k)
            )
            n_keys += keys.size
        if n_keys:
            yield pd.DataFrame(
                {"f": [K.bloom_pack(filt[None, :])], "n": [n_keys]}
            )

    parts = hashed.mapInPandas(build, "f binary, n long").collect()
    filt = K.bloom_zero(m_bits)
    n_keys = 0
    for row in parts:  # bounded: one row per non-empty partition
        filt |= K.bloom_unpack(row["f"], 1, m_bits // 8)[0]
        n_keys += row["n"]
    bits_set = K.bloom_bits_set(filt)
    stats = {
        "m_bits": m_bits,
        "k": k,
        "n_keys": n_keys,
        "bits_set": bits_set,
        "fill_rate": K.fill_rate(m_bits, bits_set),
        "actual_fpr": K.actual_fpr(m_bits, k, bits_set),
    }
    return K.bloom_pack(filt[None, :]), stats


def bloom_probe_col(
    spark, filter_bytes: bytes, m_bits: int, k: int, key: Column
) -> Column:
    """Boolean Column: Bloom membership of xxhash64(`key`).  The packed
    filter ships once per executor (TorrentBroadcast), the pandas_udf
    sees ONLY the hash column — prune-rate bytes into Python are 8/row."""
    bc = spark.sparkContext.broadcast(filter_bytes)
    nbytes = m_bits // 8

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        filt = K.bloom_unpack(bc.value, 1, nbytes)[0]
        keys = h.to_numpy(dtype=np.int64).view(np.uint64)
        if keys.size == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        hit = K.bloom_probe(filt, K.bloom64_offsets(keys, m_bits, k))
        return pd.Series(hit)

    return probe(F.xxhash64(key))


def bloom_prune_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    *,
    m_bits: int | None = None,
    fpp: float = 1e-3,
) -> DataFrame:
    """INNER equi-join with the big side Bloom-pruned before its
    shuffle.  Exactly equivalent to `big.join(small, big_key ==
    small_key)`: the filter admits a superset (no false negatives) and
    the join itself discards false positives.  Inner-join only by
    construction — pruning the preserved side of an outer join would
    drop rows (use bloom_probe_col directly on the non-preserved side
    for those).  NULL keys are pruned: SQL equi-joins never match NULL.
    """
    spark = big.sparkSession
    filt, stats = build_key_bloom(
        small, small_key, m_bits=m_bits, fpp=fpp
    )
    pruned = big.filter(
        F.col(big_key).isNotNull()
        & bloom_probe_col(
            spark, filt, stats["m_bits"], stats["k"], F.col(big_key)
        )
    )
    if small_key == big_key:
        return pruned.join(small, on=big_key, how="inner")
    return pruned.join(
        small, on=pruned[big_key] == small[small_key], how="inner"
    )
