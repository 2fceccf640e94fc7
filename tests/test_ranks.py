"""ranked_ntile: the range-sharded exact NTILE must equal F.ntile over
a global window for every (n, k) shape — including n < k, n % k != 0,
duplicate order values (with tiebreak), and any shard count."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from report_worker_spark.functions.ranks import ranked_ntile


@pytest.mark.parametrize(
    ("n", "k", "parts"),
    [(1, 5, 4), (3, 5, 4), (5, 5, 2), (17, 5, 4), (100, 5, 8),
     (101, 7, 8), (1000, 4, 16)],
)
def test_ranked_ntile_matches_window_ntile(spark, n, k, parts):
    df = spark.range(n).select(
        F.col("id"),
        # duplicate-heavy sort key to exercise ties + the id tiebreak
        (F.col("id") % 13).cast("double").alias("v"),
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        (r.id, r.q)
        for r in df.withColumn("q", F.ntile(k).over(w)).collect()
    }
    got = {
        (r.id, r.q)
        for r in ranked_ntile(
            df, [F.col("v").asc(), F.col("id").asc()], k,
            out_col="q", n_partitions=parts,
        ).collect()
    }
    assert got == want


def test_ranked_ntile_no_global_row_sort(spark):
    """The corpus-sized side must rank inside shard-partitioned windows
    (the range repartition itself is pinned behind localCheckpoint, so
    the visible plan starts at the checkpointed RDD); the only
    SinglePartition exchange allowed is the n_partitions-row shard
    count/offset table on the broadcast side."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    out = ranked_ntile(
        df, [F.col("v").asc(), F.col("id").asc()], 5, n_partitions=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    # the row-level window is partitioned by _shard, never global
    assert "windowspecdefinition(_shard" in low
    assert low.count("singlepartition") <= 1


def test_ranked_ntile_rejects_reserved_columns(spark):
    df = spark.range(5).select(F.col("id"), F.lit(1).alias("_n"))
    with pytest.raises(ValueError, match="reserves column names"):
        ranked_ntile(df, [F.col("id").asc()], 3)
    df2 = spark.range(5).select("id")
    with pytest.raises(ValueError, match="reserves column names"):
        ranked_ntile(df2, [F.col("id").asc()], 3, out_col="_rn")


def test_ranked_ntile_rejects_nonpositive_buckets(spark):
    """ADVICE r12: the closed form divides/mods by n_buckets — with 0
    it would yield silent NULL buckets under non-ANSI Spark."""
    df = spark.range(5).select("id")
    with pytest.raises(ValueError, match="n_buckets"):
        ranked_ntile(df, [F.col("id").asc()], 0)
    with pytest.raises(ValueError, match="n_buckets"):
        ranked_ntile(df, [F.col("id").asc()], -2)


from report_worker_spark.functions.ranks import ranked_prefix_sum  # noqa: E402


@pytest.mark.parametrize(("n", "parts"), [(1, 4), (17, 4), (100, 8), (1000, 16)])
def test_ranked_prefix_sum_matches_window(spark, n, parts):
    df = spark.range(n).select(
        F.col("id"), ((F.col("id") * 7) % 23 + 1).cast("long").alias("wt")
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.id, r.ps)
        for r in df.withColumn("ps", F.sum("wt").over(w)).collect()
    }
    got = {
        (r.id, r.ps)
        for r in ranked_prefix_sum(
            df, ["id"], "wt", out_col="ps", n_partitions=parts
        ).collect()
    }
    assert got == want


def test_ranked_prefix_sum_no_global_row_sort(spark):
    """Same plan pin as ranked_ntile: the corpus-sized cumsum runs in
    shard-partitioned windows; the only SinglePartition exchange is the
    bounded shard-offset table."""
    df = spark.range(1000).select(
        F.col("id"), F.lit(3).cast("long").alias("wt")
    )
    out = ranked_prefix_sum(df, ["id"], "wt", n_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    assert "windowspecdefinition(_shard" in low
    assert low.count("singlepartition") <= 1


def test_ranked_prefix_sum_rejects_reserved_columns(spark):
    df = spark.range(5).select(F.col("id"), F.lit(1).alias("_t"))
    with pytest.raises(ValueError, match="reserves column names"):
        ranked_prefix_sum(df, ["id"], "id")
