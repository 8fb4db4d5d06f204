"""Grouped least-squares regression from integer-exact moments — the
scalable "fit a line per key" analytic (per-tenant trend slopes,
per-feature drift rates, per-source quality-vs-length curves).

OLS needs only five sufficient statistics per group (n, Σx, Σy, Σxy,
Σx²), so the whole fit is ONE map-side-combinable aggregation — no
iteration, no solver, shuffle bounded by |groups|.  The moments are
accumulated as decimal(38,0) integers over fixed-point inputs
(x, y rounded at `scale` decimal places), which makes them an
order-free exact quantity both engines hash identically; the slope and
intercept derive from those integers through one double expression
tree, rounded at 6dp.

Exactness bound: moments are exact while n * (max|x|*10^scale) *
(max|y|*10^scale) < 10^38 — e.g. 10^12 rows of values up to 10^6 at
scale=4 still fit.  Groups with zero x-variance return NULL slope and
intercept (the line is undefined), not a division error.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .common import duckdb_round

_DEC = "decimal(38,0)"


def group_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 4,
) -> DataFrame:
    """-> per group: n (long), sx, sy, sxy, sxx (decimal(38,0) moments
    of the 10^scale fixed-point inputs, exact) and slope / intercept
    (double, 6dp, in the ORIGINAL units — the fixed-point scale
    cancels out of the slope and divides out of the intercept)."""
    if scale < 0 or scale > 9:
        raise ValueError(f"scale must be in [0, 9]: {scale}")
    g = list(group_cols)
    s = 10 ** int(scale)
    xv, yv = F.col(x_col), F.col(y_col)
    keep = xv.isNotNull() & yv.isNotNull()
    dt = dict(df.dtypes)
    if dt[x_col] in ("double", "float"):
        keep = keep & ~F.isnan(xv)
    if dt[y_col] in ("double", "float"):
        keep = keep & ~F.isnan(yv)
    ix = duckdb_round(xv.cast("double") * s, 0).cast(_DEC)
    iy = duckdb_round(yv.cast("double") * s, 0).cast(_DEC)
    m = (
        df.filter(keep)
        .select(*g, ix.alias("_ix"), iy.alias("_iy"))
        .groupBy(*g)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_ix").alias("sx"),
            F.sum("_iy").alias("sy"),
            F.sum(F.col("_ix") * F.col("_iy")).alias("sxy"),
            F.sum(F.col("_ix") * F.col("_ix")).alias("sxx"),
        )
    )
    # one double expression tree from the exact integers; NULLIF keeps
    # zero-variance groups (vertical/undefined line) NULL, not an error
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    den = F.nullif(nd * sxxd - sxd * sxd, F.lit(0.0))
    slope = (nd * sxyd - sxd * syd) / den
    intercept = (syd - slope * sxd) / nd / F.lit(float(s))
    return m.select(
        *g, "n", "sx", "sy", "sxy", "sxx",
        duckdb_round(slope, 6).alias("slope"),
        duckdb_round(intercept, 6).alias("intercept"),
    )
