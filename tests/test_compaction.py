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
