"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions to parallelize CPU-heavy per-row work.

    A small parquet table arrives as ONE split (files.maxPartitionBytes
    ≫ file size), serializing expensive expression work (shingling,
    hashing, per-dim dot products) onto a single core. At real scale
    inputs are already many splits and this is a no-op; locally it
    costs one small shuffle and buys core-count speedup.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
