"""Property-based tests (hypothesis) for the pure transforms —
the reference's semantics as laws, not examples."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from report_worker_spark import transforms
from report_worker_spark.schemas import (
    EQUIP_MAX_ID,
    MS_EPOCH_CUTOFF,
    TS_LOWER_BOUND,
    TS_UPPER_BOUND,
)

# One shared batch per property run: hypothesis drives values, Spark
# evaluates them in a single DataFrame pass (per-example sessions would
# be seconds each).

names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_- "),
    min_size=0,
    max_size=30,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(names, min_size=1, max_size=50))
def test_sanitize_idempotent_and_clean(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], ["name"])
    once = df.select(transforms.sanitize_name("name").alias("s"))
    twice = once.select(transforms.sanitize_name("s").alias("s"))
    a = [r.s for r in once.collect()]
    b = [r.s for r in twice.collect()]
    assert a == b  # idempotent
    for s in a:
        assert s == s.lower()
        assert "_" not in s and "-" not in s
        assert s == s.strip()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**45), min_size=1, max_size=100))
def test_normalize_ts_range_and_idempotence(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "ts long")
    once = df.select(transforms.normalize_ts("ts").alias("t"))
    vals = [r.t for r in once.collect()]
    for x, t in zip(xs, vals):
        if x > MS_EPOCH_CUTOFF:
            assert t == x // 1000
        else:
            assert t == x
    # applying again never changes an already-normalized value that is
    # itself below the cutoff (true for every real epoch second)
    again = once.select(transforms.normalize_ts("t").alias("t"))
    vals2 = [r.t for r in again.collect()]
    for t, t2 in zip(vals, vals2):
        if t <= MS_EPOCH_CUTOFF:
            assert t2 == t


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=70000)),
        min_size=1,
        max_size=60,
    )
)
def test_clamp_bounds_and_flag(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "equip_head_id int")
    out = transforms.clamp_equipment(df, slots=["equip_head_id"]).collect()
    for x, r in zip(xs, out):
        v = r.equip_head_id
        assert v is None or 0 <= v <= EQUIP_MAX_ID
        assert r.item_bug == (x is not None and x > EQUIP_MAX_ID)
        if x is not None and x <= EQUIP_MAX_ID:
            assert v == x  # in-range values untouched


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**34), min_size=1, max_size=100))
def test_bounds_filter_is_exact_subset(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "ts long")
    kept = sorted(r.ts for r in transforms.bounds_filter(df).collect())
    expect = sorted(x for x in xs if TS_LOWER_BOUND <= x <= TS_UPPER_BOUND)
    assert kept == expect
