from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark import transforms
from report_worker_spark.schemas import TS_LOWER_BOUND, TS_UPPER_BOUND


def test_sanitize_name(spark):
    df = spark.createDataFrame(
        [(" Player_One ",), ("A-B_c",), ("plain",)], ["name"]
    )
    out = [r[0] for r in df.select(transforms.sanitize_name("name")).collect()]
    assert out == ["player one", "a b c", "plain"]


def test_normalize_ts_ms_vs_s(spark):
    df = spark.createDataFrame(
        [(1704223737,), (1704223737123,)], ["ts"]
    )
    out = [r[0] for r in df.select(transforms.normalize_ts("ts")).collect()]
    assert out == [1704223737, 1704223737]


def test_bounds_filter(spark):
    rows = [
        (TS_LOWER_BOUND - 1,),
        (TS_LOWER_BOUND,),
        (TS_UPPER_BOUND,),
        (TS_UPPER_BOUND + 1,),
    ]
    df = spark.createDataFrame(rows, ["ts"])
    kept = [r[0] for r in transforms.bounds_filter(df).collect()]
    assert sorted(kept) == [TS_LOWER_BOUND, TS_UPPER_BOUND]


def test_clamp_equipment_and_flag(spark):
    df = spark.createDataFrame(
        [(40000, 5), (100, None), (None, 32768)],
        ["equip_head_id", "equip_weapon_id"],
    )
    out = transforms.clamp_equipment(
        df, slots=["equip_head_id", "equip_weapon_id"]
    ).collect()
    assert [(r.equip_head_id, r.equip_weapon_id, r.item_bug) for r in out] == [
        (0, 5, True),
        (100, None, False),
        (None, 0, True),
    ]


def test_version_dispatch_default_v1(spark):
    df = spark.createDataFrame(
        [(None, 1), ("v1.0.0", 2), ("v2.0.0", 3)],
        "version_in string, x int",
    ).select(F.struct(F.col("version_in").alias("version")).alias("metadata"), "x")
    # null version inside the struct ⇒ defaults to v1 (reference main.py:202)
    v1, v2 = transforms.version_dispatch(df)
    assert sorted(r.x for r in v1.collect()) == [1, 2]
    assert [r.x for r in v2.collect()] == [3]
