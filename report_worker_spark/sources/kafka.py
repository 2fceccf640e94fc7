"""Kafka source/sink builders (SURVEY §2 S1/S2).

The reference consumes topic ``report`` with group ``report-worker``
and 4 partitions, and re-produces failed batches to the SAME topic as a
retry loop (reference src/_kafka.py:5-15, src/main.py:79-97). Here:

- source: ``readStream.format("kafka")`` — one input partition per
  Kafka partition; rate-limited by ``maxOffsetsPerTrigger`` (the
  declarative analog of the reference's bounded queues, ST4).
- DLQ sink: a *separate* topic plus a ``retry_count`` column —
  deliberately fixing the reference's poison-message loop (ST6) while
  keeping the re-encode capability.

No broker exists in the test environment; these builders are
config-only and are exercised through their transform payloads (the
parse/serialize halves) with file/memory streams in tests. Deployment
note: the Kafka connector jar (spark-sql-kafka-0-10 + kafka-clients)
is not bundled with pyspark — ship it via ``spark.jars.packages``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import REPORT_WIRE_SCHEMA

DEFAULT_TOPIC = "report"
DEFAULT_DLQ_TOPIC = "report-dlq"
DEFAULT_GROUP = "report-worker"


def source_options(
    brokers: str,
    topic: str = DEFAULT_TOPIC,
    group_id: str = DEFAULT_GROUP,
    max_offsets_per_trigger: int = 10_000,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """The complete Kafka source option set, as a plain dict so the
    wiring is contract-testable without a broker (none exists in this
    environment). Mirrors the reference consumer: topic ``report``,
    group ``report-worker`` (reference src/_kafka.py:5-15), plus the
    backpressure (ST4) and availability knobs the reference gets from
    bounded asyncio queues."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
        "failOnDataLoss": "false",
    }


def sink_options(
    brokers: str, topic: str = DEFAULT_DLQ_TOPIC, checkpoint: str | None = None
) -> dict[str, str]:
    """Kafka sink option set (S2/DLQ), contract-testable like
    :func:`source_options`."""
    opts = {"kafka.bootstrap.servers": brokers, "topic": topic}
    if checkpoint:
        opts["checkpointLocation"] = checkpoint
    return opts


def read_report_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = DEFAULT_TOPIC,
    group_id: str = DEFAULT_GROUP,
    max_offsets_per_trigger: int = 10_000,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka → raw (key, value, partition, offset, timestamp) stream."""
    reader = spark.readStream.format("kafka")
    for k, v in source_options(
        brokers, topic, group_id, max_offsets_per_trigger, starting_offsets
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def parse_wire(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON-decode + schema-validate the message body (S3).

    PERMISSIVE ``from_json`` with a corrupt-record column replaces the
    reference's pydantic ValidationError path: malformed JSON (or a
    type-invalid field) captures the raw body in ``_corrupt_record``
    and is split off to the DLQ instead of log-and-drop.
    """
    schema = T.StructType(
        REPORT_WIRE_SCHEMA.fields
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    parsed = raw.withColumn(
        "msg",
        F.from_json(
            F.col(value_col).cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    return parsed


def valid_messages(parsed: DataFrame) -> DataFrame:
    return (
        parsed.filter(
            F.col("msg").isNotNull() & F.col("msg._corrupt_record").isNull()
        )
        .select("msg.*")
        .drop("_corrupt_record")
    )


def invalid_messages(parsed: DataFrame, value_col: str = "value") -> DataFrame:
    return parsed.filter(
        F.col("msg").isNull() | F.col("msg._corrupt_record").isNotNull()
    ).select(F.col(value_col).cast("string").alias("raw_value"))


def to_kafka_sink(
    df: DataFrame,
    brokers: str,
    topic: str = DEFAULT_DLQ_TOPIC,
    checkpoint: str | None = None,
):
    """writeStream half of the DLQ (S2): payload must already be a
    ``value`` string column (see ``encode_dlq``)."""
    w = df.writeStream.format("kafka")
    for k, v in sink_options(brokers, topic, checkpoint).items():
        w = w.option(k, v)
    return w


def encode_dlq(df: DataFrame, retry_count_col: str = "retry_count") -> DataFrame:
    """Re-encode rows as v2 JSON messages + retry counter (S4/P7/P11,
    reference views/report.py:170-208 — minus the same-topic loop)."""
    if retry_count_col not in df.columns:
        df = df.withColumn(retry_count_col, F.lit(0))
    else:
        df = df.withColumn(retry_count_col, F.col(retry_count_col) + 1)
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(payload.alias("value"))
