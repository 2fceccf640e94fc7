"""Cross-batch dimension store: get-or-insert with stable ids (J2).

The reference keeps the Players dim authoritative in MySQL
(auto-increment + INSERT IGNORE + re-read, reference
src/app/controllers/player.py:54-58). Without a database, this is the
pure-Spark equivalent: a parquet-backed dim whose surrogate ids are
``xxhash64`` of the sanitized natural key — deterministic, so
*re-inserting the same key in any batch, on any executor, yields the
same id* (idempotent by construction, no coordination, no read-back
race). The JDBC deployment swaps this for sources.jdbc + the DB's
unique keys; the interface is identical.

Write protocol per batch: append only the anti-joined misses. A crashed
batch that retries re-appends the same (name, id) pairs; readers dedup
on read (cheap: dims are small relative to facts), so duplicate appends
are harmless — the parquet analog of INSERT IGNORE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import star


class ParquetDimStore:
    def __init__(
        self, spark: SparkSession, path: str, name_col: str = "name",
        id_col: str = "id",
    ) -> None:
        self.spark = spark
        self.path = path
        self.name_col = name_col
        self.id_col = id_col

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame(
                [], f"{self.name_col} string, {self.id_col} long"
            )
        return (
            self.spark.read.parquet(self.path)
            .dropDuplicates([self.name_col])
        )

    def get_or_insert(self, batch_names: DataFrame) -> DataFrame:
        """Resolve every name in ``batch_names`` to a stable id,
        appending first-seen names. Returns (name, id) for the batch's
        distinct names."""
        dim = self.read()
        resolved, new_rows = star.get_or_insert_dim(
            batch_names, dim, self.name_col, self.id_col, key_mode="hash"
        )
        # persist before the emptiness probe: isEmpty() touches at most
        # one partition and the append then reuses the cached delta —
        # previously the anti-join ran twice (probe job + write job)
        new_rows = new_rows.persist()
        try:
            if not new_rows.isEmpty():
                new_rows.write.mode("append").parquet(self.path)
        finally:
            new_rows.unpersist()
        return resolved
