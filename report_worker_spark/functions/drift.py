"""Distribution-drift operators for training-data pipelines.

Comparing a candidate batch against a reference distribution (PSI,
two-sample KS) is the standard admission gate before new data enters a
training mix. Both operators here follow the repo's exactness rule:
counts accumulate as BIGINT (order-independent), and every float is a
single arithmetic expression over those exact integers — identical on
any engine, so the DuckDB oracle matches bit-for-bit.

Scale shapes:
- PSI: one map-side-combinable aggregate over raw rows (output =
  |bins| rows), then arithmetic. No window, no join on raw data.
- KS: one aggregate to distinct values, then an ordered cumulative
  window over the |domain| distinct values — never over raw rows. For
  unbounded domains, bin first (KS on binned data lower-bounds the
  true statistic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def psi_bins(
    df: DataFrame,
    bin_col: Column | str,
    group_col: Column | str,
    smooth: float = 0.5,
) -> DataFrame:
    """Per-bin Population Stability Index contributions between group 0
    (reference) and group 1 (candidate).

    Returns one row per bin: exact counts ``n_a``/``n_b`` and
    ``psi_contrib`` = (p_a - p_b) * ln(p_a / p_b) with Laplace-smoothed
    proportions p = (n + smooth) / (total + smooth * n_bins), so empty
    bins contribute finitely. Total PSI = sum of contributions — emitted
    per-bin because a float sum's value depends on accumulation order.

    Contributions are rounded to 12 decimals: ``ln`` is the one
    operation here that is NOT correctly-rounded by IEEE (Java
    ``Math.log`` and libm may disagree in the last ulp), so raw bits
    are not portable across engines the way +,-,*,/,sqrt are.
    """
    b = bin_col if isinstance(bin_col, Column) else F.col(bin_col)
    g = group_col if isinstance(group_col, Column) else F.col(group_col)
    c = (
        df.select(b.alias("bin"), g.alias("grp"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("grp") == 0, 1)).alias("n_a"),
            F.count(F.when(F.col("grp") == 1, 1)).alias("n_b"),
        )
    )
    t = c.agg(
        F.sum("n_a").alias("ta"),
        F.sum("n_b").alias("tb"),
        F.count(F.lit(1)).alias("nbins"),
    )
    p_a = (F.col("n_a") + F.lit(smooth)) / (
        F.col("ta") + F.lit(smooth) * F.col("nbins")
    )
    p_b = (F.col("n_b") + F.lit(smooth)) / (
        F.col("tb") + F.lit(smooth) * F.col("nbins")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_a",
        "n_b",
        F.round((p_a - p_b) * F.log(p_a / p_b), 12).alias("psi_contrib"),
    )


def ks_2sample(
    df: DataFrame,
    value_col: Column | str,
    group_col: Column | str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between group 0
    and group 1: max |ECDF_a(x) - ECDF_b(x)| over the pooled domain.

    One row out: (n_a, n_b, ks_stat). The cumulative window runs over
    DISTINCT values only (the aggregate collapses raw rows first), and
    max() over floats is order-independent, so the statistic is exact
    and engine-reproducible.
    """
    v = value_col if isinstance(value_col, Column) else F.col(value_col)
    g = group_col if isinstance(group_col, Column) else F.col(group_col)
    c = (
        df.select(v.alias("x"), g.alias("grp"))
        .groupBy("x")
        .agg(
            F.count(F.when(F.col("grp") == 0, 1)).alias("a"),
            F.count(F.when(F.col("grp") == 1, 1)).alias("b"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
    )
    t = c.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    return (
        cum.crossJoin(F.broadcast(t))
        .select(
            F.col("ta"),
            F.col("tb"),
            F.abs(
                F.col("ca").cast("double") / F.col("ta")
                - F.col("cb").cast("double") / F.col("tb")
            ).alias("d"),
        )
        .groupBy()
        .agg(
            F.max("ta").alias("n_a"),
            F.max("tb").alias("n_b"),
            F.max("d").alias("ks_stat"),
        )
    )
