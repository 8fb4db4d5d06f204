"""Two-sample Kolmogorov-Smirnov drift distance — distribution shift
detection between two labeled slices of one column (reference window vs
current window, cohort A vs cohort B, yesterday's corpus vs today's).

A training-data pipeline needs a cheap, exact answer to "did this
feature's distribution move?" before sketches and thresholds built on
the old distribution silently degrade.  The KS statistic is
max_v |F_a(v) - F_b(v)| over the pooled empirical CDFs — distribution-
free, sensitive to location AND shape changes.

Exactness across engines: the statistic is computed in INTEGER
arithmetic as max |cum_a * n_b - cum_b * n_a| (the numerator of the
ECDF difference over the common denominator n_a*n_b), so the
cross-engine gate hashes identical values with no float-ordering
hazard; the double `ks` is derived once from the integer at the end.
Products are decimal(38,0): exact up to n_a * n_b < 10^38 (either side
may hold ~10^18 rows before precision saturates).

Scale shape — the same global-cumsum pattern as operators/packing.py
and pareto.py: the per-value side counts (one shuffle, output bounded
by DISTINCT values) are range-repartitioned by value, P per-partition
sums collect as exclusive prefix offsets, and the running ECDFs use a
window PARTITIONED BY the range partition id.  No Exchange
SinglePartition, no task ever sorts the full value domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .common import duckdb_round

_DEC = "decimal(38,0)"


def ks_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """-> ONE row (n_a, n_b, ks_num, ks): n_a/n_b sample sizes,
    ks_num = max over distinct values of |cum_a*n_b - cum_b*n_a|
    (integer, exact), ks = ks_num / (n_a*n_b) rounded 6dp.

    NULL values (and NaN for float columns) are excluded from both
    samples — an ECDF has no position for them.  Raises if either side
    is empty: KS is undefined against an empty sample."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism

    v = F.col(value_col)
    keep = v.isNotNull() & F.col(side_col).isin([side_a, side_b])
    if dict(df.dtypes)[value_col] in ("double", "float"):
        keep = keep & ~F.isnan(v)

    counts = (
        df.filter(keep)
        .groupBy(v.alias("_v"))
        .agg(
            F.sum(
                F.when(F.col(side_col) == side_a, 1).otherwise(0)
            ).alias("_ca"),
            F.sum(
                F.when(F.col(side_col) == side_b, 1).otherwise(0)
            ).alias("_cb"),
        )
    )
    # stable partition ids for both the offsets job and the final agg
    ranged = (
        counts.repartitionByRange(p, F.asc("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    parts = (
        ranged.groupBy("_pid")
        .agg(F.sum("_ca").alias("_sa"), F.sum("_cb").alias("_sb"))
        .collect()
    )
    n_a = sum(int(r["_sa"] or 0) for r in parts)
    n_b = sum(int(r["_sb"] or 0) for r in parts)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"KS needs both sides non-empty: n_a={n_a}, n_b={n_b}"
        )
    acc_a = acc_b = 0
    offs: dict[int, tuple[int, int]] = {}
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = (acc_a, acc_b)
        acc_a += int(r["_sa"] or 0)
        acc_b += int(r["_sb"] or 0)
    off_a = F.create_map(
        *[x for pid, (oa, _) in offs.items() for x in (F.lit(pid), F.lit(oa))]
    )
    off_b = F.create_map(
        *[x for pid, (_, ob) in offs.items() for x in (F.lit(pid), F.lit(ob))]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.asc("_v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_a = (F.sum("_ca").over(w) + off_a[F.col("_pid")]).cast(_DEC)
    cum_b = (F.sum("_cb").over(w) + off_b[F.col("_pid")]).cast(_DEC)
    diff = F.abs(
        cum_a * F.lit(n_b).cast(_DEC) - cum_b * F.lit(n_a).cast(_DEC)
    )
    return (
        ranged.select(diff.alias("_d"))
        .agg(F.max("_d").alias("_ks"))
        .select(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            # stays decimal(38,0): long would overflow once
            # n_a * n_b > 2^63 (~3e9 rows per side)
            F.col("_ks").alias("ks_num"),
            duckdb_round(
                F.col("_ks").cast("double") / F.lit(float(n_a) * float(n_b)),
                6,
            ).alias("ks"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    lo: float,
    hi: float,
    buckets: int = 10,
) -> DataFrame:
    """Population Stability Index over FIXED reference bins — the
    standard production monitoring metric beside ks_drift (KS reacts
    to the single worst ECDF gap; PSI weights every bin's shift, the
    form model-monitoring thresholds are published for: <0.1 stable,
    0.1-0.25 drifting, >0.25 shifted).

    Bins are fixed-width over [lo, hi] (callers pass the reference
    window's range — fixed bins are what make PSI comparable across
    monitoring runs); values outside clamp into the edge bins, so mass
    never silently disappears.  Laplace +0.5 smoothing keeps empty
    bins finite.

    Exact cross-engine: per-bin terms are computed with one identical
    double expression tree and rounded to MICRO-NAT integers
    (term = round(1e6 * (pa - pb) * ln(pa/pb))); the psi_micro total
    is an order-free integer SUM.  Returns one row per bin
    (bin, n_a, n_b, term_micro) plus the caller sums term_micro — or
    read `psi_micro` off any row (windowed total).

    Scale shape: one projection computes the bin (pure arithmetic,
    composes with scan pushdown), one groupBy(bin) with map-side
    partials, one |buckets|-row window for the total.  No value-domain
    sort at all (bins are fixed, not quantiles)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    if not (hi > lo):
        raise ValueError(f"hi must exceed lo: [{lo}, {hi})")
    v = F.col(value_col)
    keep = v.isNotNull() & F.col(side_col).isin([side_a, side_b])
    if dict(df.dtypes)[value_col] in ("double", "float"):
        keep = keep & ~F.isnan(v)
    b = int(buckets)
    raw = F.floor(
        (v.cast("double") - F.lit(float(lo)))
        * F.lit(float(b))
        / F.lit(float(hi) - float(lo))
    ).cast("int")
    binned = df.filter(keep).select(
        F.least(F.greatest(raw, F.lit(0)), F.lit(b - 1)).alias("bin"),
        F.col(side_col).alias("_s"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("_s") == side_a, 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_s") == side_b, 1).otherwise(0)).alias("_cb"),
    )
    # skeleton keeps empty bins (their smoothed term is still defined)
    skel = df.sparkSession.range(b).select(F.col("id").cast("int").alias("bin"))
    counts = skel.join(counts, on="bin", how="left").select(
        "bin",
        F.coalesce(F.col("_ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("_cb"), F.lit(0)).cast("long").alias("n_b"),
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    na = F.sum("n_a").over(tot).cast("double")
    nb = F.sum("n_b").over(tot).cast("double")
    # identical expression tree both engines: smoothed shares, one ln
    pa = (F.col("n_a").cast("double") + F.lit(0.5)) / (
        na + F.lit(0.5) * F.lit(float(b))
    )
    pb = (F.col("n_b").cast("double") + F.lit(0.5)) / (
        nb + F.lit(0.5) * F.lit(float(b))
    )
    term = duckdb_round(
        (pa - pb) * F.log(pa / pb) * F.lit(1e6), 0
    ).cast("long")
    with_terms = counts.select("bin", "n_a", "n_b", term.alias("term_micro"))
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return with_terms.select(
        "bin", "n_a", "n_b", "term_micro",
        F.sum("term_micro").over(total).cast("long").alias("psi_micro"),
    ).orderBy("bin")
