"""Sketch-based equi-join cardinality estimation.

At 10^12-row scale the difference between a broadcast join, a shuffle
join, and "don't run that join" is a planner decision that needs the
join's OUTPUT size before paying for it.  A count-min sketch of each
side's join-key frequency vector answers it in one scan per side: the
CMS inner product (kernels.cms_inner_product) estimates
sum_k fA(k)*fB(k) = |A JOIN B| with a one-sided error bound and no
shuffle of the keys themselves.

Plan shape: each side is one mapInPandas pass emitting a single
(depth x width) partial per partition; the partials gather to one tiny
final task (P rows of <= depth*width longs, sparse-packed when mostly
zero) that merges by counter addition and takes the inner product.
For very wide sketches prefer more depth over more width — the gather
cost is P * density * width.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import kernels as K


def _side_partials(
    df: DataFrame, key_col: str, side: int, depth: int, width: int
) -> DataFrame:
    hashed = df.select(F.xxhash64(F.col(key_col)).alias("_h"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = K.cms_zero(depth, width)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            keys = pdf["_h"].to_numpy(dtype=np.int64).astype(np.uint64)
            K.cms_add(counts, keys)
            n += keys.size
        if n:
            yield pd.DataFrame(
                {"side": [side], "sketch": [K.cms_pack(counts)], "n": [n]}
            )

    return hashed.mapInPandas(build, "side int, sketch binary, n long")


def cms_join_size(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    depth: int = 5,
    width: int = 1 << 16,
) -> DataFrame:
    """Estimate |df_a JOIN df_b ON key_a = key_b| without running the
    join.  Returns ONE row: (n_a, n_b, est_join_rows).  est_join_rows
    >= the true size; within e*n_a*n_b/width of it with probability
    1 - exp(-depth).  Pass the same frame twice for a self-join / F2
    estimate.  Keys are xxhash64-folded JVM-side, so arbitrary key
    types work and raw keys never reach Python."""
    pa = _side_partials(df_a, key_a, 0, depth, width)
    pb = _side_partials(df_b, key_b, 1, depth, width)

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = {0: K.cms_zero(depth, width), 1: K.cms_zero(depth, width)}
        ns = {0: 0, 1: 0}
        for _, r in pdf.iterrows():
            s = int(r["side"])
            merged[s] = K.cms_merge(
                merged[s], K.cms_unpack(r["sketch"], depth, width)
            )
            ns[s] += int(r["n"])
        est = K.cms_inner_product(merged[0], merged[1])
        return pd.DataFrame(
            {"n_a": [ns[0]], "n_b": [ns[1]], "est_join_rows": [est]}
        )

    return (
        pa.unionByName(pb)
        .groupBy(F.lit(1).alias("_g"))
        .applyInPandas(finish, "n_a long, n_b long, est_join_rows long")
    )
