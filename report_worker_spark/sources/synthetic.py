"""Distributed synthetic wire-format generator (SURVEY §2 S8).

Reproduces the *distribution* of the reference's load generator
(reference kafka_setup/src/main.py:41-93: 100k messages, 300 players
``player0..299``, ~50/50 v1/v2, metadata absent on ~half of v1, ts
spanning −30y..2038 so mostly OUTSIDE the keep-window, random NULL-able
equipment, ids 0..20000 with a tail above the 32767 clamp) as a pure
``spark.range`` + column-expression pipeline — deterministic via seeded
``rand``, no driver-side loop, so it scales to any row count.

Implementation note: every random draw is materialized in a FIRST
projection and only then combined. Spark's ``rand(seed)`` advances its
stream per *evaluation*; referencing the same seeded expression inside
different ``when`` branches desynchronizes the instances (conditional
branches evaluate on different row subsets). Non-deterministic
projections are never collapsed/inlined by Catalyst, so the two-step
shape guarantees one evaluation per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EQUIPMENT_SLOTS


def _randint(lo: int, hi: int, seed: int) -> F.Column:
    """Uniform int in [lo, hi] from a seeded rand stream."""
    return (F.lit(lo) + F.floor(F.rand(seed) * (hi - lo + 1))).cast("int")


def generate_reports(
    spark: SparkSession, n: int = 100_000, n_players: int = 300, seed: int = 42
) -> DataFrame:
    """Struct-typed synthetic report stream, v1 and v2 mixed.

    v2 ids are drawn from the same 0..n_players-1 space as the v1
    ``player{i}`` names (the reference generator strips the prefix the
    same way, kafka_setup/src/main.py:84-86).
    """
    lo, hi = 838857600, 2145916800  # ~1996..2038

    # fixed numPartitions: rand(seed) streams are per-partition, so the
    # corpus is identical regardless of the session's parallelism
    draws = spark.range(0, n, 1, 16).select(
        F.col("id").alias("msg_id"),
        (F.rand(seed) < 0.5).alias("_is_v1"),
        (F.rand(seed + 1) < 0.5).alias("_meta_absent"),
        _randint(0, n_players - 1, seed + 2).alias("_reporter_n"),
        _randint(0, n_players - 1, seed + 3).alias("_reported_n"),
        (F.lit(lo) + F.floor(F.rand(seed + 4) * (hi - lo)))
        .cast("long")
        .alias("_ts_s"),
        (F.rand(seed + 5) < 0.25).alias("_ts_in_ms"),
        _randint(10_000, 10_500, seed + 6).alias("region_id"),
        _randint(0, 5000, seed + 7).alias("x_coord"),
        _randint(0, 5000, seed + 8).alias("y_coord"),
        _randint(0, 3, seed + 9).alias("z_coord"),
        _randint(0, 1, seed + 50).alias("manual_detect"),
        _randint(0, 1, seed + 51).alias("on_members_world"),
        _randint(0, 1, seed + 52).alias("on_pvp_world"),
        _randint(300, 500, seed + 53).alias("world_number"),
        *[
            F.when(
                F.rand(seed + 30 + i) < 0.3, F.lit(None).cast("int")
            )
            .otherwise(_randint(0, 40000, seed + 10 + i))
            .alias(f"_eq_{slot}")
            for i, slot in enumerate(EQUIPMENT_SLOTS)
        ],
    )

    is_v1 = F.col("_is_v1")
    return draws.select(
        "msg_id",
        F.when(
            is_v1 & F.col("_meta_absent"),
            F.lit(None).cast("struct<version:string>"),
        )
        .otherwise(
            F.struct(
                F.when(is_v1, F.lit("v1.0.0"))
                .otherwise(F.lit("v2.0.0"))
                .alias("version")
            )
        )
        .alias("metadata"),
        F.when(is_v1, F.concat(F.lit("player"), F.col("_reporter_n"))).alias(
            "reporter"
        ),
        F.when(is_v1, F.concat(F.lit("player"), F.col("_reported_n"))).alias(
            "reported"
        ),
        F.when(~is_v1, F.col("_reporter_n").cast("long")).alias("reporter_id"),
        F.when(~is_v1, F.col("_reported_n").cast("long")).alias("reported_id"),
        "region_id",
        "x_coord",
        "y_coord",
        "z_coord",
        F.when(F.col("_ts_in_ms"), F.col("_ts_s") * 1000)
        .otherwise(F.col("_ts_s"))
        .alias("ts"),
        "manual_detect",
        "on_members_world",
        "on_pvp_world",
        "world_number",
        F.struct(
            *[F.col(f"_eq_{slot}").alias(slot) for slot in EQUIPMENT_SLOTS]
        ).alias("equipment"),
        F.lit(0).cast("long").alias("equip_ge_value"),
    )


def generate_report_json(
    spark: SparkSession, n: int = 100_000, n_players: int = 300, seed: int = 42
) -> DataFrame:
    """(msg_id, value) with value = JSON message body — the Kafka wire
    shape, for from_json round-trip tests."""
    df = generate_reports(spark, n, n_players, seed)
    return df.select(
        "msg_id",
        F.to_json(F.struct(*[c for c in df.columns if c != "msg_id"])).alias(
            "value"
        ),
    )


# --- md5-keystream variant: SQL-reproducible corpus --------------------------


def _h(tag: str, seed: int) -> F.Column:
    """Deterministic uint32 draw per (seed, tag, msg_id): first 8 hex
    chars of md5 — the same keystream a DuckDB oracle can reproduce
    bit-for-bit (``CAST(concat('0x', substr(md5(...),1,8)) AS BIGINT)``),
    unlike Spark's per-partition ``rand(seed)`` streams. Integer-only
    arithmetic downstream (modulo, never float scaling) keeps every
    derived draw exact across engines."""
    key = F.concat(F.lit(f"{seed}:{tag}:"), F.col("msg_id").cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def generate_reports_hashed(
    spark: SparkSession, n: int = 20_000, n_players: int = 300, seed: int = 42
) -> DataFrame:
    """Same wire distribution as :func:`generate_reports` (reference
    kafka_setup/src/main.py:41-93) but every draw is an md5 keystream
    value — deterministic in (seed, msg_id) alone, independent of
    partitioning AND reproducible in ANSI SQL, so the full ingest chain
    gets a DuckDB hash-match oracle (VERDICT_r4 item 3) instead of a
    rows-only check."""
    lo, hi = 838857600, 2145916800  # ~1996..2038

    draws = spark.range(0, n).select(
        F.col("id").alias("msg_id"),
    ).select(
        "msg_id",
        (_h("v1", seed) % 2 == 0).alias("_is_v1"),
        (_h("meta", seed) % 2 == 0).alias("_meta_absent"),
        (_h("rep", seed) % n_players).alias("_reporter_n"),
        (_h("red", seed) % n_players).alias("_reported_n"),
        (F.lit(lo) + _h("ts", seed) % (hi - lo)).alias("_ts_s"),
        (_h("ms", seed) % 4 == 0).alias("_ts_in_ms"),
        (F.lit(10_000) + _h("region", seed) % 501).cast("int").alias("region_id"),
        (_h("x", seed) % 5001).cast("int").alias("x_coord"),
        (_h("y", seed) % 5001).cast("int").alias("y_coord"),
        (_h("z", seed) % 4).cast("int").alias("z_coord"),
        (_h("md", seed) % 2).cast("int").alias("manual_detect"),
        (_h("mw", seed) % 2).cast("int").alias("on_members_world"),
        (_h("pw", seed) % 2).cast("int").alias("on_pvp_world"),
        (F.lit(300) + _h("wn", seed) % 201).cast("int").alias("world_number"),
        *[
            F.when(_h(f"eqnull{slot}", seed) % 10 < 3, F.lit(None).cast("int"))
            .otherwise((_h(f"eq{slot}", seed) % 40001).cast("int"))
            .alias(f"_eq_{slot}")
            for slot in EQUIPMENT_SLOTS
        ],
    )

    is_v1 = F.col("_is_v1")
    return draws.select(
        "msg_id",
        F.when(
            is_v1 & F.col("_meta_absent"),
            F.lit(None).cast("struct<version:string>"),
        )
        .otherwise(
            F.struct(
                F.when(is_v1, F.lit("v1.0.0"))
                .otherwise(F.lit("v2.0.0"))
                .alias("version")
            )
        )
        .alias("metadata"),
        F.when(is_v1, F.concat(F.lit("player"), F.col("_reporter_n"))).alias(
            "reporter"
        ),
        F.when(is_v1, F.concat(F.lit("player"), F.col("_reported_n"))).alias(
            "reported"
        ),
        F.when(~is_v1, F.col("_reporter_n").cast("long")).alias("reporter_id"),
        F.when(~is_v1, F.col("_reported_n").cast("long")).alias("reported_id"),
        "region_id",
        "x_coord",
        "y_coord",
        "z_coord",
        F.when(F.col("_ts_in_ms"), F.col("_ts_s") * 1000)
        .otherwise(F.col("_ts_s"))
        .alias("ts"),
        "manual_detect",
        "on_members_world",
        "on_pvp_world",
        "world_number",
        F.struct(
            *[F.col(f"_eq_{slot}").alias(slot) for slot in EQUIPMENT_SLOTS]
        ).alias("equipment"),
        F.lit(0).cast("long").alias("equip_ge_value"),
    )


def generate_report_json_hashed(
    spark: SparkSession, n: int = 20_000, n_players: int = 300, seed: int = 42
) -> DataFrame:
    """JSON wire shape over the md5-keystream corpus."""
    df = generate_reports_hashed(spark, n, n_players, seed)
    return df.select(
        "msg_id",
        F.to_json(F.struct(*[c for c in df.columns if c != "msg_id"])).alias(
            "value"
        ),
    )
