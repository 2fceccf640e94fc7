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
from tests.conftest import await_finished


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
    await_finished(q)
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


def test_session_windows_stream_matches_batch(spark, tmp_path):
    """Native session_window through a REAL stream (state-store merge
    path) equals the same plan in batch mode, up to watermark-withheld
    trailing sessions — the streaming twin of ts_session_window_agg."""
    batch, stream = _stream_events(spark, tmp_path)

    out = session_windows(stream, gap="30 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    got = spark.sql("SELECT * FROM sess_win").collect()
    expect = session_windows(batch, gap="30 minutes", watermark="2 hours").collect()
    assert len(got) > 0
    exp_set = {tuple(r) for r in expect}
    assert all(tuple(g) in exp_set for g in got)
    # append mode withholds only sessions the final watermark keeps open
    assert len(expect) - len(got) <= 20


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_plan_builds(spark):
    """transformWithStateInPandas: the plan must analyze (API wiring,
    schemas) even where the protobuf runtime for execution is absent."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS user_id", "CAST(value AS DOUBLE) AS value")
    )
    from report_worker_spark.streaming.stateful import running_value_stats

    out = running_value_stats(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n", "sum_cents", "max_cents",
    ]


def test_transform_with_state_matches_batch(spark, tmp_path):
    """Full TWS execution (RocksDB state store) — runs only where the
    protobuf package exists; the build container lacks it."""
    import pytest

    if not _protobuf_ok():
        pytest.skip("google.protobuf unavailable: TWS worker channel needs it")
    from report_worker_spark.streaming.stateful import running_value_stats

    batch, stream = _stream_events(spark, tmp_path, n=1000)
    out = running_value_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .start()
    )
    await_finished(q)
    got = {
        r.user_id: (r.n, r.sum_cents, r.max_cents)
        for r in spark.sql("SELECT * FROM tws_stats").collect()
    }
    want = {
        r.user_id: (r.n, r.s, r.m)
        for r in batch.select(
            "user_id", F.round(F.col("value") * 100).cast("long").alias("c")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("c").alias("s"), F.max("c").alias("m"))
        .collect()
    }
    assert got == want


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
    await_finished(q)
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
    await_finished(q)
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


def test_streaming_drift_monitor_matches_batch_psi(spark, tmp_path):
    """End-to-end drift monitor: windowed bin counts stream through
    foreachBatch PSI scoring; the scored view must equal the same math
    run in plain batch mode."""
    from report_worker_spark.streaming.drift import (
        psi_against_reference,
        run_drift_monitor,
        windowed_bin_counts,
    )

    batch, stream = _stream_events(spark, tmp_path)
    bin_col = F.floor(F.col("value") / 50.0).cast("long")
    reference = (
        batch.groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )

    q = run_drift_monitor(
        stream,
        reference,
        bin_col,
        checkpoint=str(tmp_path / "ckpt"),
        out_table="drift_t",
        window="6 hours",
        watermark="12 hours",
    )
    await_finished(q)

    views = [
        r.viewName
        for r in spark.sql("SHOW VIEWS IN global_temp").collect()
        if r.viewName.startswith("drift_t_epoch_")
    ]
    assert views, "monitor produced no scored epochs"
    got = spark.table(f"global_temp.{views[-1]}")

    want = psi_against_reference(
        windowed_bin_counts(batch, bin_col, window="6 hours", watermark="12 hours"),
        reference,
    )
    # availableNow + watermark: the final (unclosed) windows may be held
    # back in append mode, so the streamed scores are a subset of the
    # batch scores over the windows that DID close — compare on those.
    got_rows = {tuple(map(str, r)) for r in got.collect()}
    want_rows = {tuple(map(str, r)) for r in want.collect()}
    assert got_rows, "no scored rows"
    assert got_rows <= want_rows
    # the self-comparison reference: closed full windows score ~0 drift
    # only where distributions match; just assert values are finite
    import math

    assert all(
        math.isfinite(r.psi_contrib) for r in got.collect()
    )


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Two real file streams (events split by id parity), watermarked
    interval join — every pair the batch join produces must come out of
    the streaming join under availableNow (inner join emits eagerly;
    nothing is withheld once both inputs are exhausted)."""
    from report_worker_spark.streaming.stateful import stream_interval_join

    e = load(spark, "/root/testdata/sf0.001", "events").limit(4000)
    src_a, src_b = str(tmp_path / "sa"), str(tmp_path / "sb")
    a_batch = e.filter(F.col("event_id") % 2 == 0)
    b_batch = e.filter(F.col("event_id") % 2 == 1)
    a_batch.write.parquet(src_a)
    b_batch.write.parquet(src_b)
    sa = spark.readStream.schema(e.schema).parquet(src_a)
    sb = spark.readStream.schema(e.schema).parquet(src_b)

    q = (
        stream_interval_join(sa, sb)
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM ssj").collect())
    )
    expect = sorted(
        map(
            tuple,
            stream_interval_join(a_batch, b_batch).collect(),
        )
    )
    assert len(expect) > 0
    assert got == expect


def test_stream_near_dedup_drops_clones_keeps_distinct(spark, tmp_path):
    """Streaming MinHash-LSH near-dedup (r13): documents arriving
    AFTER an identical/near-identical doc lose their LSH band buckets
    and are SUPPRESSED from the deduped output; originals and genuinely
    distinct docs keep (nearly) all bands and pass through. Exact
    clones are used for the drop assertion so the verdict is
    deterministic (J=1 → every band stolen). Batches are forced file-at-a-time so arrival order is
    original → clone, and two far-future sentinel files advance the
    append-mode watermark past the corpus windows so the chained
    windowed count actually emits."""
    import time as _time

    from report_worker_spark.streaming.stateful import stream_near_dedup

    src = str(tmp_path / "near_src")
    schema = "doc_id long, ts timestamp, text string"

    def _mk(rows):
        return spark.createDataFrame(rows, schema)

    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango uniform victor whiskey xray yankee zulu"
    ).split()

    import hashlib

    def text(seed):
        # md5-seeded word choice per position: distinct seeds give
        # near-disjoint shingle SETS (a first draft used cyclic shifts
        # of one word ring — every doc had the IDENTICAL 26-gram set
        # and the whole corpus was one giant near-dup family)
        return " ".join(
            words[
                int(
                    hashlib.md5(f"{seed}-{j}".encode()).hexdigest()[:4],
                    16,
                )
                % len(words)
            ]
            for j in range(30)
        )

    t0 = "2024-01-01 00:00:00"
    t1 = "2024-01-01 00:10:00"
    import datetime

    ts0 = datetime.datetime.fromisoformat(t0)
    ts1 = datetime.datetime.fromisoformat(t1)
    originals = [(i, ts0, text(i)) for i in range(20)]
    clones = [(100 + i, ts1, text(i)) for i in range(8)]  # exact dups
    fresh = [(200 + i, ts1, text(1000 + 7 * i)) for i in range(8)]
    # shingle-less docs (< n words): the LSH math yields NULL
    # signatures for these; pre-r14 they all collided on constant
    # buckets and every short doc after the first was dropped. They
    # must ALL be kept (batch semantics: no shingles → never paired).
    shorts = [(300, ts0, "tiny doc"), (301, ts1, "two words"),
              (302, ts1, "tiny doc")]
    sent1 = [(901, ts0 + datetime.timedelta(days=40), "sentinel one")]
    sent2 = [(902, ts0 + datetime.timedelta(days=80), "sentinel two")]

    for batch in (originals, clones + fresh + shorts, sent1, sent2):
        _mk(batch).write.mode("append").parquet(src)
        _time.sleep(1.2)  # distinct mod-times → deterministic order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_near_dedup(
        stream, watermark="7 days", agg_window="1 day"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("near_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    got = {
        r.doc_id: r.n_bands_retained
        for r in spark.sql(
            "SELECT doc_id, n_bands_retained FROM near_dedup_out"
        ).collect()
    }
    for i in range(20):  # originals own every bucket and are kept
        assert got.get(i) == 16, (i, got.get(i))
    for i in range(8):  # exact clones lose every band → suppressed
        assert (100 + i) not in got, (100 + i, got.get(100 + i))
    for i in range(8):  # distinct late arrivals keep their buckets
        assert got.get(200 + i, 0) >= 13, (200 + i, got.get(200 + i))
    for i in (300, 301, 302):  # shingle-less docs always kept —
        # even textually identical shorts (300 vs 302): with no
        # shingles there is no LSH evidence, so none is suppressed
        assert got.get(i) == 16, (i, got.get(i))
