"""asof_join directions vs pandas merge_asof — an independent reference
implementation with the same tie convention (nearest ties -> backward)."""

from __future__ import annotations

import pandas as pd

from report_worker_spark.operators import asof_join

LEFT = [
    # (key, t)
    (1, 10), (1, 20), (1, 35), (1, 4),
    (2, 100), (2, 7),
    (3, 50),  # key with no right rows at all
]
RIGHT = [
    # (key, t, v)
    (1, 5, 11), (1, 20, 12), (1, 30, 13),
    (2, 90, 21), (2, 110, 22),
]


def _spark_result(spark, direction):
    l = spark.createDataFrame(LEFT, ["k", "lt"])
    r = spark.createDataFrame(RIGHT, ["k", "rt", "v"])
    out = asof_join(
        l, r, on="k", left_time="lt", right_time="rt",
        right_payload=["v"], direction=direction,
    )
    return {(row.k, row.lt): row.v for row in out.collect()}


def _pandas_result(direction):
    l = pd.DataFrame(LEFT, columns=["k", "lt"]).sort_values("lt")
    r = pd.DataFrame(RIGHT, columns=["k", "rt", "v"]).sort_values("rt")
    m = pd.merge_asof(
        l, r, left_on="lt", right_on="rt", by="k", direction=direction
    )
    return {
        (row.k, row.lt): (None if pd.isna(row.v) else int(row.v))
        for row in m.itertuples()
    }


def test_asof_backward_matches_pandas(spark):
    assert _spark_result(spark, "backward") == _pandas_result("backward")


def test_asof_forward_matches_pandas(spark):
    assert _spark_result(spark, "forward") == _pandas_result("forward")


def test_asof_nearest_matches_pandas(spark):
    assert _spark_result(spark, "nearest") == _pandas_result("nearest")


def _spark_tol(spark, direction, tol):
    l = spark.createDataFrame(LEFT, ["k", "lt"])
    r = spark.createDataFrame(RIGHT, ["k", "rt", "v"])
    out = asof_join(
        l, r, on="k", left_time="lt", right_time="rt",
        right_payload=["v"], direction=direction, tolerance=tol,
    )
    return {(row.k, row.lt): row.v for row in out.collect()}


def _pandas_tol(direction, tol):
    l = pd.DataFrame(LEFT, columns=["k", "lt"]).sort_values("lt")
    r = pd.DataFrame(RIGHT, columns=["k", "rt", "v"]).sort_values("rt")
    m = pd.merge_asof(
        l, r, left_on="lt", right_on="rt", by="k",
        direction=direction, tolerance=tol,
    )
    return {
        (row.k, row.lt): (None if pd.isna(row.v) else int(row.v))
        for row in m.itertuples()
    }


def test_asof_tolerance_backward_matches_pandas(spark):
    for tol in (5, 10, 100):
        assert _spark_tol(spark, "backward", tol) == _pandas_tol(
            "backward", tol
        ), tol


def test_asof_tolerance_forward_matches_pandas(spark):
    for tol in (5, 10, 100):
        assert _spark_tol(spark, "forward", tol) == _pandas_tol(
            "forward", tol
        ), tol


def test_asof_tolerance_nearest_matches_pandas(spark):
    for tol in (5, 10, 100):
        assert _spark_tol(spark, "nearest", tol) == _pandas_tol(
            "nearest", tol
        ), tol
