"""Parquet table loaders for the driver testdata (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which the vectorized
    Spark reader rejects; read it as long ns (runtime conf — safe to set
    on any session) and convert with integer division to keep the full
    64-bit precision (a double round-trip would lose sub-ms digits).
    """
    # Pin the two runtime confs the catalog's semantics depend on, so
    # queries are correct on ANY caller-provided session (the driver
    # builds its own): UTC rendering and ns-as-long parquet reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
