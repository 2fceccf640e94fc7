"""JDBC dim read / multi-table transactional sink (SURVEY §2 S5-S7).

The reference's sink is ONE MySQL transaction per micro-batch doing 7
statements (temp table + DISTINCT + anti-joins + 3-way join + INSERT
IGNORE, reference src/app/controllers/report.py:295-311). Spark's
``df.write.jdbc`` is per-table and non-transactional across tables, so
the atomic path uses a single raw JDBC connection on the driver via
py4j (java.sql.DriverManager) inside ``foreachBatch`` — batch volumes
are the reference's ~1k rows, so driver-side batched INSERTs are the
right tool; the relational heavy lifting already happened in Spark.

No database exists in the test environment: everything here is gated
behind the connection actually being reachable, and the set-algebra
halves are tested through ``star.upsert_star`` with parquet sinks.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def read_dim(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """Dim snapshot read (S5) — one set-based read per micro-batch
    replaces the reference's per-row SELECT + LRU cache."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def append_table(df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None) -> None:
    """Plain append (S7: the stgReports path)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**(properties or {}))
        .mode("append")
        .save()
    )


def transactional_multi_table_write(
    spark: SparkSession,
    url: str,
    writes: Iterable[tuple[str, DataFrame]],
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 1000,
    insert_verb: str = "INSERT IGNORE INTO",
) -> None:
    """Atomic multi-table append: one java.sql connection, autocommit
    off, all tables inserted, single commit; rollback on any failure
    (S6/ST1 — effectively-once together with DB unique keys and
    idempotent anti-joined inputs).

    ``insert_verb`` is the dialect knob: MySQL's ``INSERT IGNORE INTO``
    (the reference's idempotency backstop) by default; plain
    ``INSERT INTO`` for engines without it (Derby/Postgres — pair with
    unique keys + anti-joined inputs).

    Collects each delta to the driver — correct for micro-batch-scale
    deltas (reference envelope: ≤1k rows/txn); bulk loads should use
    ``append_table`` instead.
    """
    jvm = spark._jvm  # noqa: SLF001 — raw JDBC is the documented escape hatch
    if user is not None:
        conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        for table, df in writes:
            cols = df.columns
            placeholders = ", ".join(["?"] * len(cols))
            sql = (
                f"{insert_verb} {table} ({', '.join(cols)}) "
                f"VALUES ({placeholders})"
            )
            ps = conn.prepareStatement(sql)
            n = 0
            for row in df.toLocalIterator():
                for i, c in enumerate(cols, start=1):
                    v = row[c]
                    if v is None:
                        ps.setObject(i, None)
                    else:
                        ps.setObject(i, v)
                ps.addBatch()
                n += 1
                if n % batch_size == 0:
                    ps.executeBatch()
            ps.executeBatch()
            ps.close()
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
