"""Misra-Gries heavy hitters: undercount bound, merge validity, and
sketch-pruned exact top-k vs naive full-shuffle counts — including the
adversarial near-uniform case where the sketch guarantee degrades."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from report_worker_spark.functions.topk import (
    mg_merged,
    mg_partials,
    sketch_pruned_topk,
)


def _df_from_keys(spark, keys, parts=8):
    return spark.createDataFrame(
        [(k,) for k in keys], ["key"]
    ).repartition(parts)


def test_mg_weights_are_underestimates_within_bound(spark):
    # Zipf-ish: key i appears ~1000/i times
    keys = [f"k{i}" for i in range(1, 60) for _ in range(1000 // i)]
    true = Counter(keys)
    n = len(keys)
    m = 16
    rows = mg_merged(
        mg_partials(_df_from_keys(spark, keys), "key", m=m), m=m
    ).collect()
    merged = {r.key: r.weight for r in rows}
    assert len(merged) <= m
    # the summary now reports its own accumulated undercount, tighter
    # than the analytic 2*N/(m+1) worst case
    reported = {r.bound for r in rows}
    assert len(reported) == 1  # constant across rows
    bound = reported.pop()
    assert 0 <= bound <= 2 * n / (m + 1)
    for k, w in merged.items():
        assert w <= true[k], (k, w, true[k])
        assert true[k] - w <= bound, (k, w, true[k], bound)
    # every key whose count clears the reported bound must be present
    for k, c in true.items():
        if c > bound:
            assert k in merged, (k, c, bound)


def test_sketch_pruned_topk_exact_on_zipf(spark):
    keys = [f"k{i}" for i in range(1, 200) for _ in range(2000 // i)]
    df = _df_from_keys(spark, keys)
    got = [
        (r.key, r.n, r.rank)
        for r in sketch_pruned_topk(df, "key", k=10, m=64).collect()
    ]
    true = Counter(keys)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(k, n, i + 1) for i, (k, n) in enumerate(want)]


def test_sketch_pruned_topk_near_uniform_still_exact_with_big_m(spark):
    """Near-uniform counts are the worst case for MG pruning; with
    m >= distinct keys nothing truncates and the result is trivially
    exact — the documented fallback regime."""
    keys = [f"u{i}" for i in range(50) for _ in range(20)] + ["hot"] * 25
    df = _df_from_keys(spark, keys)
    got = sketch_pruned_topk(df, "key", k=3, m=128).collect()
    assert got[0].key == "hot" and got[0].n == 25 and got[0].rank == 1
    assert all(r.n == 20 for r in got[1:])


def test_sketch_pruned_topk_near_uniform_small_m_falls_back_exact(spark):
    """m far below the distinct-key count on near-uniform data: the
    certification (k-th summary weight > bound) fails, the naive
    full-shuffle path kicks in, and the answer is still bit-exact."""
    keys = [f"u{i}" for i in range(400) for _ in range(10)] + ["hot"] * 15
    df = _df_from_keys(spark, keys)
    got = [
        (r.key, r.n, r.rank)
        for r in sketch_pruned_topk(df, "key", k=5, m=8).collect()
    ]
    true = Counter(keys)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(k, n, i + 1) for i, (k, n) in enumerate(want)]


def test_null_keys_excluded_on_both_paths(spark):
    """NULL keys never count: the sketch drops them (value_counts), so
    the naive fallback must too — certified and fallback paths agree."""
    keys = ["a"] * 30 + ["b"] * 20 + [None] * 50
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    # certified regime (tiny key space, big m)
    got = [(r.key, r.n) for r in sketch_pruned_topk(df, "key", k=2, m=64).collect()]
    assert got == [("a", 30), ("b", 20)]
    # forced-fallback regime (m too small to certify on near-uniform)
    many = [f"u{i}" for i in range(300) for _ in range(3)] + [None] * 500
    df2 = spark.createDataFrame([(k,) for k in many], "key string")
    got2 = sketch_pruned_topk(df2, "key", k=5, m=4).collect()
    assert all(r.key is not None for r in got2)


def test_null_sentinel_cut_reaches_bound(spark):
    """Pins the load-bearing ordering inside mg_merged: the NULL-key
    sentinel rows (one per partition, carrying that partition's
    truncation cutoff) must flow into the whole-frame _pcut sum BEFORE
    the isNotNull filter. A refactor that filters nulls first (or
    partitions the window by key) drops the cutoffs and this fails."""
    partials = spark.createDataFrame(
        [
            ("a", 10, 0),
            ("b", 7, 0),
            (None, 0, 5),   # partition-1 sentinel: cutoff 5
            (None, 0, 3),   # partition-2 sentinel: cutoff 3
        ],
        "key string, weight long, cut long",
    )
    rows = mg_merged(partials, m=16).collect()
    assert {r.key for r in rows} == {"a", "b"}  # sentinels never emitted
    bounds = {r.bound for r in rows}
    assert bounds == {8}, bounds  # 5 + 3 from the null-key sentinels
