from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from report_worker_spark.operators import scd2_merge

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def test_scd2_close_open_insert(spark):
    current = _dim(spark, [
        (1, "A", T0, None, True),
        (2, "B", T0, None, True),
    ])
    updates = spark.createDataFrame(
        [(1, "A2", T1), (3, "C", T1), (2, "B", T1)],  # change, new, unchanged
        "k long, seg string, eff timestamp",
    )
    out = scd2_merge(current, updates, key="k", attrs=["seg"], effective_col="eff")
    rows = {(r.k, r.seg, r.is_current): (r.valid_from, r.valid_to) for r in out.collect()}
    # k=1: old version closed at T1, new version open
    assert rows[(1, "A", False)] == (T0, T1)
    assert rows[(1, "A2", True)] == (T1, None)
    # k=2 unchanged: single open version intact
    assert rows[(2, "B", True)] == (T0, None)
    # k=3 brand-new key
    assert rows[(3, "C", True)] == (T1, None)
    assert len(rows) == 4


def test_scd2_reapply_is_idempotent(spark):
    current = _dim(spark, [(1, "A", T0, None, True)])
    updates = spark.createDataFrame([(1, "A2", T1)], "k long, seg string, eff timestamp")
    once = scd2_merge(current, updates, "k", ["seg"], "eff")
    twice = scd2_merge(once, updates, "k", ["seg"], "eff")
    a = sorted(map(tuple, once.collect()), key=repr)
    b = sorted(map(tuple, twice.collect()), key=repr)
    assert a == b  # same update applied again: no new versions


def test_scd2_history_preserved(spark):
    current = _dim(spark, [(1, "A", T0, T1, False), (1, "A2", T1, None, True)])
    updates = spark.createDataFrame([(1, "A3", T2)], "k long, seg string, eff timestamp")
    out = scd2_merge(current, updates, "k", ["seg"], "eff").collect()
    assert len(out) == 3
    assert sorted((r.seg, r.is_current) for r in out) == [
        ("A", False), ("A2", False), ("A3", True),
    ]
