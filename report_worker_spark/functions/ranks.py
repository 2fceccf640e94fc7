"""Distributed exact global ranking devices.

Spark's ``Window.orderBy(...)`` with no partition key is semantically a
GLOBAL window: the physical plan moves every row into ONE task for the
sort (fine for bounded inputs — a 30-day grid, a 64-row offset table —
fatal for a corpus-sized column at 100 TB). ``ranked_ntile`` computes
the exact same ``F.ntile(k)`` result with a range-sharded two-phase
rank instead: range-repartition on the order key, rank locally per
shard, then add per-shard offsets from a tiny (n_partitions-row)
count table — the same decomposition curation.token_budget_sample uses
for its corpus prefix sum, specialized to ordered bucketing.

Exactness: ``repartitionByRange`` guarantees every key in shard i sorts
before every key in shard i+1 (rows are placed by binary search over
sampled boundaries, so equal keys share a shard — and callers pass a
total order anyway), hence global_rank = shard_offset + local_rank is
the exact global row_number, and the ntile bucket is a closed form of
(rank, n, k): the first n % k buckets take ceil(n/k) rows, the rest
floor(n/k) — bit-identical to SQL NTILE on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_ntile(
    df: DataFrame,
    order_cols: list[Column | str],
    n_buckets: int,
    out_col: str = "ntile",
    n_partitions: int = 64,
) -> DataFrame:
    """``df`` + ``out_col`` = NTILE(n_buckets) OVER (ORDER BY
    order_cols ASC) — exact, without a single-partition global sort.

    ``order_cols`` must be a total order (add a unique id tiebreak) and
    is ascending; wrap a column in a descending proxy (e.g. negate)
    for DESC semantics. Size ``n_partitions`` so each shard's local
    sort fits an executor (n_rows / n_partitions rows per task).

    Fault-tolerance trade-off: ``localCheckpoint`` pins the SAMPLED
    range boundaries (both passes must see identical shard
    assignment), but its blocks are executor-local and unreplicated —
    on a long-running cluster, losing an executor between the two
    passes fails the query instead of recomputing. For jobs where
    that matters, ``df.persist(StorageLevel.DISK_ONLY)`` + a count
    before calling is the replicated-lineage alternative, or derive a
    deterministic value-based shard key and skip sampling entirely
    (the olap_lorenz_deciles device).
    """
    if n_buckets < 1:
        # the closed form divides/mods by n_buckets; under non-ANSI
        # Spark, 0 would yield silent NULL buckets instead of an error
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    reserved = {"_shard", "_lrn", "_off", "_n", "_rn"}
    clash = sorted(reserved & set(df.columns)) + (
        [out_col] if out_col in reserved else []
    )
    if clash:
        raise ValueError(
            f"ranked_ntile reserves column names {sorted(reserved)}; "
            f"rename conflicting columns {clash} before calling"
        )
    d = df.repartitionByRange(n_partitions, *order_cols)
    d = d.withColumn("_shard", F.spark_partition_id())
    # consumed twice (shard counts + local ranks) — pin the sampled
    # range boundaries so both passes see identical shard assignment
    d = d.localCheckpoint(eager=False)
    cnt = d.groupBy("_shard").agg(F.count(F.lit(1)).alias("_c"))
    # the offset table is n_partitions rows — a bounded global window
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = cnt.select(
        "_shard",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    w_local = Window.partitionBy("_shard").orderBy(*order_cols)
    ranked = (
        d.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(off), "_shard")
        .withColumn("_rn", F.col("_off") + F.col("_lrn"))
    )
    # NTILE closed form: q = n div k, r = n mod k; buckets 1..r hold
    # q+1 rows, buckets r+1..k hold q rows. Integer division is spelled
    # (a - a % b) / b — the numerator divides exactly, so the float64
    # division is exact for any rank below 2^53 (a plain a/b truncation
    # is one rounding away from a wrong bucket at boundary ranks).
    def idiv(a: Column, b: Column) -> Column:
        return ((a - a % b) / b).cast("long")

    k = F.lit(n_buckets)
    q = idiv(F.col("_n"), k)
    r = F.col("_n") % k
    big_span = r * (q + 1)  # rows covered by the q+1-sized buckets
    bucket = F.when(
        F.col("_rn") <= big_span,
        idiv(F.col("_rn") - 1, q + 1) + 1,
    ).otherwise(
        r + idiv(F.col("_rn") - big_span - 1, q) + 1
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "_shard", "_lrn", "_off", "_n", "_rn"
    )


def ranked_prefix_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    weight_col: str,
    out_col: str = "prefix_sum",
    n_partitions: int = 64,
) -> DataFrame:
    """``df`` + ``out_col`` = SUM(weight_col) OVER (ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING) — the exact INCLUSIVE global running sum,
    without a single-partition global sort (subtract ``weight_col`` for
    the exclusive form).

    Same two-phase decomposition as ``ranked_ntile``: range-repartition
    on the order key, cumulative-sum locally per shard, then add
    per-shard weight totals from a bounded (n_partitions-row) offset
    table. ``order_cols`` must be a total order; ``weight_col`` must be
    integral (long) for exactness — float weights would make the result
    depend on summation order. Same localCheckpoint fault-tolerance
    trade-off as ranked_ntile (see its docstring)."""
    reserved = {"_shard", "_lps", "_off", "_t"}
    clash = sorted(reserved & set(df.columns)) + (
        [out_col] if out_col in reserved else []
    )
    if clash:
        raise ValueError(
            f"ranked_prefix_sum reserves column names {sorted(reserved)}; "
            f"rename conflicting columns {clash} before calling"
        )
    d = df.repartitionByRange(n_partitions, *order_cols)
    d = d.withColumn("_shard", F.spark_partition_id())
    # consumed twice (shard totals + local prefix) — pin the sampled
    # range boundaries so both passes see identical shard assignment
    d = d.localCheckpoint(eager=False)
    tot = d.groupBy("_shard").agg(F.sum(weight_col).alias("_t"))
    # the offset table is n_partitions rows — a bounded global window
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = tot.select(
        "_shard",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
    )
    w_local = (
        Window.partitionBy("_shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("_lps", F.sum(weight_col).over(w_local))
        .join(F.broadcast(off), "_shard")
        .withColumn(out_col, F.col("_off") + F.col("_lps"))
        .drop("_shard", "_lps", "_off")
    )
