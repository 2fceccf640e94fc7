"""Parquet schema evolution: a corpus written over time grows columns;
readers must unify old and new files without rewriting history."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_added_column_merges_with_nulls(spark, tmp_path):
    p = str(tmp_path / "evolving")
    v1 = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    v1.write.parquet(p + "/batch=1")
    v2 = spark.range(100, 150).select(
        F.col("id").alias("doc_id"),
        F.lit("de").alias("lang"),
        (F.col("id") % 5).alias("quality"),  # new column, later batches only
    )
    v2.write.parquet(p + "/batch=2")

    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) >= {"doc_id", "lang", "quality"}
    assert df.count() == 150
    # old rows surface NULL for the new column; new rows keep values
    assert df.filter(F.col("quality").isNull()).count() == 100
    assert df.filter(F.col("quality").isNotNull()).count() == 50
    # downstream default-fill is one coalesce away
    filled = df.withColumn("quality", F.coalesce("quality", F.lit(-1)))
    assert filled.filter(F.col("quality") == -1).count() == 100


def test_without_merge_schema_reader_uses_one_footer(spark, tmp_path):
    """Default (no mergeSchema) picks an arbitrary file's schema — the
    silent-column-loss mode; this pins the behavior so readers of
    evolving corpora know to opt in."""
    p = str(tmp_path / "evolving2")
    spark.range(0, 10).select(F.col("id").alias("a")).write.parquet(p + "/x=1")
    spark.range(0, 10).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    ).write.parquet(p + "/x=2")
    cols = set(spark.read.parquet(p).columns) - {"x"}
    assert cols in ({"a"}, {"a", "b"})  # depends on which footer wins
    merged = set(spark.read.option("mergeSchema", "true").parquet(p).columns)
    assert {"a", "b"} <= merged
