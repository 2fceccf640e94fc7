"""Broker-less contract tests (VERDICT r1 #6/#8): the exact Kafka option
wiring and the exact MySQL-dialect SQL the deployment path would emit —
pinned as strings, since neither a broker nor a MySQL server exists in
this environment. The Derby suite proves the mechanics; these prove the
dialect/config surface the reference actually depends on."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from report_worker_spark.sources import jdbc as j
from report_worker_spark.sources import kafka as k


def test_kafka_source_option_contract():
    opts = k.source_options("broker1:9092,broker2:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "report",  # reference topic (src/_kafka.py:5-15)
        "kafka.group.id": "report-worker",  # reference consumer group
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "10000",  # ST4 backpressure, string-typed
        "failOnDataLoss": "false",
    }
    # every knob overridable, values always strings (Spark option API)
    opts = k.source_options(
        "b:9092", topic="t2", group_id="g2",
        max_offsets_per_trigger=5, starting_offsets="earliest",
    )
    assert opts["subscribe"] == "t2"
    assert opts["maxOffsetsPerTrigger"] == "5"
    assert all(isinstance(v, str) for v in opts.values())


def test_kafka_sink_option_contract(tmp_path):
    assert k.sink_options("b:9092") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "report-dlq",  # separate topic — NOT the reference's
        # same-topic retry loop (its poison-message bug, ST6)
    }
    assert k.sink_options("b:9092", checkpoint=str(tmp_path))[
        "checkpointLocation"
    ] == str(tmp_path)


def test_dlq_retry_count_two_failures(spark):
    """A message failing twice must carry retry_count 0 → 1 → 2 through
    encode→(redelivery)→parse→encode cycles, so a max-retry policy has
    something to act on (the reference loops forever, ST6)."""
    first = spark.createDataFrame([(7, "boom")], "report_id long, err string")
    dlq1 = k.encode_dlq(first)
    row1 = json.loads(dlq1.first()["value"])
    assert row1["retry_count"] == 0

    # redelivery: the DLQ consumer parses the JSON back including counter
    redelivered1 = spark.createDataFrame(
        [(json.dumps(row1),)], "value string"
    ).select(
        F.json_tuple("value", "report_id", "err", "retry_count").alias(
            "report_id", "err", "retry_count"
        )
    ).select(
        F.col("report_id").cast("long").alias("report_id"),
        "err",
        F.col("retry_count").cast("long").alias("retry_count"),
    )
    row2 = json.loads(k.encode_dlq(redelivered1).first()["value"])
    assert row2["retry_count"] == 1

    redelivered2 = spark.createDataFrame(
        [(row2["report_id"], row2["err"], row2["retry_count"])],
        "report_id long, err string, retry_count long",
    )
    row3 = json.loads(k.encode_dlq(redelivered2).first()["value"])
    assert row3["retry_count"] == 2


def test_mysql_insert_ignore_statement_shape():
    """The reference's idempotency backstop is MySQL ``INSERT IGNORE``
    (reference src/app/controllers/report.py:246, player.py:56). Derby
    can't execute that dialect, so pin the exact statement the sink
    emits with the default verb."""
    sql = j.insert_sql(
        "INSERT IGNORE INTO", "report", ["sighting_id", "location_id", "region_id"]
    )
    assert sql == (
        "INSERT IGNORE INTO report (sighting_id, location_id, region_id) "
        "VALUES (?, ?, ?)"
    )


def test_mysql_not_exists_insert_select_shape():
    sql = j.not_exists_insert_sql(
        "INSERT IGNORE INTO",
        "report_gear",
        "stg_report_gear",
        ["equip_head_id", "gear_id"],
        ["gear_id"],
    )
    assert sql == (
        "INSERT IGNORE INTO report_gear (equip_head_id, gear_id) "
        "SELECT s.equip_head_id, s.gear_id FROM stg_report_gear s "
        "WHERE NOT EXISTS (SELECT 1 FROM report_gear t "
        "WHERE (t.gear_id = s.gear_id "
        "OR (t.gear_id IS NULL AND s.gear_id IS NULL)))"
    )


def test_null_safe_predicate_matches_mysql_spaceship_semantics(spark):
    """The portable OR-form must implement exactly MySQL's ``<=>`` truth
    table (and Spark's eqNullSafe, which the in-Spark anti-joins use):
    NULL <=> NULL is TRUE, NULL <=> x is FALSE."""
    rows = spark.sql(
        """
        SELECT t.k AS tk, s.k AS sk,
               (t.k = s.k OR (t.k IS NULL AND s.k IS NULL)) AS ours,
               t.k <=> s.k AS spaceship
        FROM VALUES (1), (2), (CAST(NULL AS INT)) AS t(k)
        CROSS JOIN VALUES (1), (CAST(NULL AS INT)) AS s(k)
        """
    ).collect()
    for r in rows:
        assert bool(r.ours) == bool(r.spaceship), (r.tk, r.sk)


def test_wire_parse_roundtrip_preserves_dlq_payload(spark):
    """Corrupt wire messages must survive encode→DLQ byte-exactly so a
    fixed consumer can re-parse them later (S2/S3)."""
    good = '{"report_id": 1, "reporting_id": 2}'
    bad = '{"report_id": oops'
    raw = spark.createDataFrame([(good,), (bad,)], "value string")
    parsed = k.parse_wire(raw)
    assert k.valid_messages(parsed).count() == 1
    dead = k.invalid_messages(parsed)
    assert [r.raw_value for r in dead.collect()] == [bad]
