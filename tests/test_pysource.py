"""Custom Python DataSource (wiregen): determinism, batch/stream parity,
checkpoint-resume without duplicates or gaps, and compatibility with the
wire ingest chain."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from report_worker_spark.sources import kafka as ksrc
from report_worker_spark.sources.pysource import register, wire_message
from tests.conftest import await_finished


def test_batch_read_is_deterministic_and_partition_parallel(spark):
    register(spark)
    df = spark.read.format("wiregen").option("n", 500).load()
    rows = {r.msg_id: r.value for r in df.collect()}
    assert len(rows) == 500
    # content is a pure function of (seed, id) — matches direct calls
    for i in (0, 123, 499):
        assert rows[i] == wire_message(42, i)
    again = {r.msg_id: r.value for r in df.collect()}
    assert rows == again


def test_stream_resume_no_dups_no_gaps(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("wiregen")
            .option("rows_per_batch", 200)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # restart from checkpoint: continues at committed offset
    got = spark.read.parquet(out)
    ids = [r.msg_id for r in got.select("msg_id").collect()]
    assert len(ids) == len(set(ids)), "duplicate ids after resume"
    assert sorted(ids) == list(range(len(ids))), "gap in resumed stream"
    assert len(ids) > n1


def test_wiregen_feeds_ingest_chain(spark):
    register(spark)
    raw = spark.read.format("wiregen").option("n", 300).load()
    parsed = ksrc.valid_messages(ksrc.parse_wire(raw.select("value")))
    assert parsed.count() == 300
    one = json.loads(raw.filter(F.col("msg_id") == 7).first().value)
    assert set(one) >= {"ts", "region_id", "equipment"}
