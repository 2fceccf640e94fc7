from __future__ import annotations

import glob

from pyspark.sql import functions as F

from report_worker_spark.util import compact_parquet


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "facts")
    # simulate 10 micro-batch epochs × 8 partitions = 80 small files
    for epoch in range(10):
        spark.range(epoch * 100, (epoch + 1) * 100).repartition(8).write.mode(
            "append"
        ).parquet(path)
    before_files = len(glob.glob(f"{path}/*.parquet"))
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("id")).collect()[0][0]
    n_before = before.count()

    compact_parquet(spark, path, target_file_mb=128)

    after_files = len(glob.glob(f"{path}/*.parquet"))
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert after.agg(F.sum("id")).collect()[0][0] == before_sum
    assert after_files < before_files
    assert after_files <= 2


def test_compaction_sorted_for_pruning(spark, tmp_path):
    path = str(tmp_path / "sorted")
    spark.range(10_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    ).repartition(16).write.parquet(path)
    compact_parquet(spark, path, target_file_mb=1, sort_by=["k"])
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    # sorted layout → row-group min/max stats tighten; behavior check:
    # values survive and the table is still readable with a k filter
    assert out.filter(F.col("k") == 7).count() == 10_000 // 97 + (1 if 7 < 10_000 % 97 else 0)


def test_zorder_key_matches_reference_interleave(spark):
    """zorder_key_2d must equal the textbook Morton interleave."""
    from pyspark.sql import functions as F

    from report_worker_spark.util import zorder_key_2d

    def morton(a: int, b: int) -> int:
        out = 0
        for i in range(31):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    vals = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 511), (2**30, 2**30 - 1)]
    df = spark.createDataFrame(vals, "a long, b long").select(
        "a", "b", zorder_key_2d(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == morton(r.a, r.b), (r.a, r.b)


def test_zorder_sort_gives_2d_locality(spark):
    """Sorting by the z-key must keep BOTH dimensions locally dense:
    split the sorted order into chunks and the average per-chunk value
    range of each dimension is far below the global range (this is
    exactly what makes row-group min/max pruning fire on either
    column)."""
    from pyspark.sql import functions as F

    from report_worker_spark.util import zorder_key_2d

    n, chunks = 4096, 16
    df = (
        spark.range(n)
        .select(
            (F.xxhash64("id") % 1024).alias("a"),
            (F.xxhash64("id", "id") % 1024).alias("b"),
        )
        .select(F.abs("a").alias("a"), F.abs("b").alias("b"))
    )
    z = df.select("a", "b", zorder_key_2d(F.col("a"), F.col("b")).alias("z"))
    w = F.ntile(chunks).over(__import__("pyspark").sql.Window.orderBy("z"))
    spans = (
        z.withColumn("chunk", w)
        .groupBy("chunk")
        .agg(
            (F.max("a") - F.min("a")).alias("span_a"),
            (F.max("b") - F.min("b")).alias("span_b"),
        )
        .agg(F.avg("span_a").alias("sa"), F.avg("span_b").alias("sb"))
        .first()
    )
    # random order would give ~1023 per chunk; z-order keeps both tight
    assert spans.sa < 512 and spans.sb < 512, spans
