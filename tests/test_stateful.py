"""Stateful streaming operators driven through real streams (memory sink)."""

from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.plans.tables import load
from report_worker_spark.streaming.stateful import (
    ProgressRecorder,
    running_error_ratio,
    session_windows,
    windowed_counts,
)


def _stream_events(spark, tmp_path, n=2000):
    src = str(tmp_path / "events_src")
    e = load(spark, "/root/testdata/sf0.001", "events").limit(n)
    e.write.parquet(src)
    schema = e.schema
    return e, spark.readStream.schema(schema).parquet(src)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    batch, stream = _stream_events(spark, tmp_path)

    out = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM win_counts ORDER BY window_start, event_type"
    ).collect()
    # batch mode executes the same plan without watermark-based dropping
    expect = (
        windowed_counts(batch, window="1 hour", watermark="2 hours")
        .orderBy("window_start", "event_type")
        .collect()
    )
    # availableNow processes everything; final watermark may hold back the
    # tail window(s) in append mode — got must be a prefix of expect
    assert len(got) > 0
    assert all(g in expect for g in got)
    assert len(expect) - len(got) <= 10  # only trailing windows withheld


def test_session_windows_batch(spark):
    e = load(spark, "/root/testdata/sf0.001", "events")
    s = session_windows(e, gap="30 minutes")
    rows = s.collect()
    assert len(rows) > 0
    # sessions are per-user, non-overlapping, ordered
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2  # no overlap


def test_running_error_ratio_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "err_src")
    e = load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type"
    )
    # two files → availableNow processes them as (at least) one batch each;
    # deterministic split (limit() could pick different rows on re-plan)
    e1 = load(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("event_id") % 2 == 0
    ).select("user_id", "event_type")
    e1.write.parquet(f"{src}/part1")
    e.write.parquet(f"{src}/part2")
    stream = spark.readStream.schema(e.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/part*")

    out = running_error_ratio(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("err_ratio")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    rec = ProgressRecorder()
    q.awaitTermination(180)
    rec.record(q)

    res = spark.sql(
        "SELECT user_id, max(n_total) AS n_total, max(n_errors) AS n_errors "
        "FROM err_ratio GROUP BY user_id"
    )
    # final state equals the batch ground truth
    truth = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("t_total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("t_errors"),
    )
    # totals must equal part1+part2 counts
    expect = (
        e1.unionAll(e)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("t_total"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("t_errors"),
        )
    )
    diff = (
        res.join(expect, "user_id")
        .filter(
            (F.col("n_total") != F.col("t_total"))
            | (F.col("n_errors") != F.col("t_errors"))
        )
        .count()
    )
    assert diff == 0
    assert rec.snapshots and rec.snapshots[-1]["batchId"] is not None


def test_stream_dedup_within_watermark(spark, tmp_path):
    from report_worker_spark.streaming.stateful import stream_dedup

    src = str(tmp_path / "dup_src")
    e = load(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "user_id", "event_type"
    )
    # duplicate every row → stream should emit each key once
    e.unionAll(e).write.parquet(src)
    stream = spark.readStream.schema(e.schema).parquet(src)
    out = stream_dedup(stream, ["user_id", "event_type"], watermark="90 days")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, event_type FROM dedup_out")
    assert got.count() == got.dropDuplicates(["user_id", "event_type"]).count()
    expect = e.select("user_id", "event_type").distinct().count()
    assert got.count() == expect


def test_hll_merge_matches_exact_within_error(spark):
    """Per-day sketches unioned == one global sketch semantics; the
    estimate lands within HLL error of the exact distinct count."""
    from report_worker_spark.plans.catalog import agg_hll_mergeable

    est = {
        r.event_type: r.n_users_est
        for r in agg_hll_mergeable(spark, "/root/testdata/sf0.01").collect()
    }
    e = load(spark, "/root/testdata/sf0.01", "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05  # lgK=12 → ~1.6% rsd
