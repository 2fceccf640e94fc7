"""SQL API surface: the same engine through ``spark.sql``.

Catalyst compiles SQL and DataFrame code to the same plans; exposing
the testdata as temp views (plus the staging pipeline as a view) lets
users run the reference's workload and the extensions in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import TABLES, load


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Create a temp view per testdata table (mirrors the DuckDB oracle
    environment, so any oracle SQL here is also runnable via spark.sql
    modulo dialect)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(query)
