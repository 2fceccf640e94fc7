from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.streaming.dimstore import ParquetDimStore


def _names(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["name"])


def test_ids_stable_across_batches(spark, tmp_path):
    store = ParquetDimStore(spark, str(tmp_path / "players_dim"))

    r1 = store.get_or_insert(_names(spark, ["alice", "bob", "alice"]))
    ids1 = {r.name: r.id for r in r1.dropDuplicates(["name"]).collect()}
    assert set(ids1) == {"alice", "bob"}

    r2 = store.get_or_insert(_names(spark, ["bob", "carol"]))
    ids2 = {r.name: r.id for r in r2.dropDuplicates(["name"]).collect()}
    assert ids2["bob"] == ids1["bob"]  # stable across batches
    assert "carol" in ids2

    dim = store.read().collect()
    assert len(dim) == 3  # alice, bob, carol — no dup rows
    assert len({r.id for r in dim}) == 3


def test_retry_append_is_idempotent(spark, tmp_path):
    """A crashed-and-retried batch re-appends the same rows; readers
    dedup — the parquet analog of INSERT IGNORE."""
    store = ParquetDimStore(spark, str(tmp_path / "dim"))
    store.get_or_insert(_names(spark, ["x", "y"]))
    before = {(r.name, r.id) for r in store.read().collect()}
    # simulate the retry: same delta appended again, bypassing the anti-join
    dup = store.read()
    dup.write.mode("append").parquet(store.path)
    after = {(r.name, r.id) for r in store.read().collect()}
    assert before == after


def test_empty_batch_no_write(spark, tmp_path):
    store = ParquetDimStore(spark, str(tmp_path / "dim2"))
    store.get_or_insert(_names(spark, ["a"]))
    n_files_before = len(list((tmp_path / "dim2").glob("*.parquet")))
    store.get_or_insert(_names(spark, ["a"]))  # all hits, no miss
    n_files_after = len(list((tmp_path / "dim2").glob("*.parquet")))
    assert n_files_before == n_files_after
