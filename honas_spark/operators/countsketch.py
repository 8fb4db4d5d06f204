"""Count-Sketch / AMS second-moment (F2) estimation — the tenth
mergeable sketch sibling, and the self-join-size complement to
operators/joinsize.py (CMS inner product estimates |A JOIN B|; F2 is
|A JOIN A|, the planner statistic for self-joins, skew detection and
repartition sizing: F2/n^2 concentration says "one key dominates").

Alon-Matias-Szegedy 1996 / Charikar-Chen-Farach-Colton 2002: depth d
rows of width w signed counters; counter[r][h_r(x)] += s_r(x).  Each
row's sum of squared counters is an unbiased F2 estimate with relative
error ~1/sqrt(w); the median over d rows boosts confidence.

Spark-first shape — NO pandas, NO UDFs: the sketch IS a DataFrame.
Rows fan out to d (explode of a literal array), bucket and sign derive
from one md5/xxhash64 per (value, row) JVM-side inside whole-stage
codegen, and the counter matrix is a plain groupBy(group, row, bucket)
SUM — partial aggregation combines map-side, so the shuffle carries at
most |groups| * d * w rows regardless of input size.  Merging two
corpora's sketches is the same SUM over the union: associative and
commutative by construction (the merge-protocol property the other
nine siblings share, here for free from Spark's own aggregation).

Cross-engine exactness: with hash_fn="md5" the whole estimate is a
deterministic function of md5 prefixes, so a DuckDB oracle replaying
the identical arithmetic hashes the identical integers — the gate is
EXACT even though the estimator is approximate vs the true F2.
Counters square into decimal(38,0): no overflow below F2 = 10^38.
The median over d rows is taken as array_sort(collect_list(...))[d//2]
(d is tiny and odd) so both engines pick the same order statistic with
no interpolation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def _row_hash(value, row, hash_fn: str):
    """One 60-bit-positive hash per (value, depth-row)."""
    tagged = F.concat(value, F.lit(":"), row.cast("string"))
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    if hash_fn == "xxhash64":
        # clear the sign bit so bucket/sign bit arithmetic stays positive
        return F.abs(F.xxhash64(tagged) % F.lit(2 ** 60))
    raise ValueError(f"hash_fn must be md5|xxhash64: {hash_fn}")


def count_sketch_f2(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 5,
    width: int = 256,
    hash_fn: str = "md5",
) -> DataFrame:
    """-> one row per group: n (long, items sketched), f2_est
    (decimal(38,0), the AMS estimate of sum over distinct values of
    count(value)^2).  Relative error ~1/sqrt(width) with confidence
    growing in depth; exact-by-replay under a deterministic hash."""
    if depth < 1 or depth % 2 == 0:
        raise ValueError(f"depth must be odd and >= 1: {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2: {width}")
    g = list(group_cols)
    # The md5 replay hashes the STRING form of the value, so the
    # Spark-side rendering must equal DuckDB's CAST(x AS VARCHAR).
    # They agree for integer/decimal/string types, but diverge for
    # float/double ("NaN"/"1.23E7" vs "nan"/"12300000.0") — for those
    # the value goes through Python's repr, which reproduces DuckDB's
    # shortest-roundtrip rendering exactly (verified over 6k+ randoms
    # incl. nan/inf/-0.0/1e±308).  The NULL filter runs FIRST (both
    # engines filter before the cast), so a remaining NaN is a real
    # NaN, not a masked NULL.
    if dict(df.dtypes).get(value_col) == "double":
        import pandas as pd

        def _repr_series(s):
            return s.map(repr)

        # real annotation objects: the module-level `from __future__
        # import annotations` would stringify inline hints, which
        # pandas_udf's signature inference rejects
        _repr_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _duck_repr = F.pandas_udf(_repr_series, "string")
        val = _duck_repr(F.col(value_col).cast("double"))
    else:
        val = F.col(value_col).cast("string")
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *g, val.alias("_v")
    )
    fan = rows.select(
        *g, "_v",
        F.explode(F.array([F.lit(r) for r in range(depth)])).alias("_r"),
    )
    tagged = F.concat(F.col("_v"), F.lit(":"), F.col("_r").cast("string"))
    if hash_fn == "md5" and width & (width - 1) == 0:
        # power-of-two width: bucket and sign need only the LOW
        # log2(2w) bits of hk, and 16^m ≡ 0 (mod 2^j) whenever
        # 4m >= j — so the value of the last m hex chars of the
        # 15-char md5 prefix gives hk mod 2^j EXACTLY.  Summing m
        # ascii() digits in codegen replaces conv()'s base-16 string
        # parse of the full prefix (~35% of this operator's runtime
        # at 5M fan rows); bit-identical by the congruence above,
        # pinned by test_count_sketch_f2_lowbits_equals_conv.
        j = (2 * width).bit_length() - 1
        m = (j + 3) // 4
        hh = F.md5(tagged)
        v = F.lit(0)
        for i in range(m):
            c = F.ascii(F.substring(hh, 15 - m + 1 + i, 1))
            d = c - F.when(c >= 97, F.lit(87)).otherwise(F.lit(48))
            v = v * 16 + d
        h = v.cast("long")
    else:
        h = _row_hash(F.col("_v"), F.col("_r"), hash_fn)
    # h mod 2w is uniform and factors EXACTLY into (bucket = h mod w,
    # sign = which half) — independent components, and all-integer
    # arithmetic (h/width through a double would corrupt the sign bit
    # for 60-bit hashes: doubles carry 53 bits)
    sketched = fan.select(
        *g, "_r",
        (h % width).alias("_b"),
        F.when(h % (2 * width) >= width, 1).otherwise(-1).alias("_s"),
    )
    counters = sketched.groupBy(*g, "_r", "_b").agg(
        F.sum("_s").cast(_DEC).alias("_c")
    )
    per_row = counters.groupBy(*g, "_r").agg(
        F.sum(F.col("_c") * F.col("_c")).alias("_f2r")
    )
    n_by_group = rows.groupBy(*g).agg(F.count(F.lit(1)).alias("n"))
    medians = per_row.groupBy(*g).agg(
        F.array_sort(F.collect_list("_f2r"))[depth // 2].alias("f2_est")
    )
    return n_by_group.join(medians, on=g).select(*g, "n", "f2_est")
