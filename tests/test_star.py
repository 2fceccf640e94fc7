from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark import star


def test_anti_join_null_safe(spark):
    batch = spark.createDataFrame(
        [(1, None), (1, 2), (3, 3)], "a int, b int"
    )
    existing = spark.createDataFrame([(1, None), (3, 3)], "a int, b int")
    out = star.anti_join_new(batch, existing, ["a", "b"]).collect()
    # null-safe: (1, NULL) matches (1, NULL) and does NOT re-insert
    assert [(r.a, r.b) for r in out] == [(1, 2)]


def test_anti_join_null_unsafe_reference_bug(spark):
    """The reference's MySQL `=` semantics: NULL keys never match ⇒
    (1,NULL) re-inserts forever. Kept available for bug-compat."""
    batch = spark.createDataFrame([(1, None)], "a int, b int")
    existing = spark.createDataFrame([(1, None)], "a int, b int")
    out = star.anti_join_new(batch, existing, ["a", "b"], null_safe=False)
    assert out.count() == 1


def test_surrogate_hash_deterministic(spark):
    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, None)], "a int, b string")
    d1 = star.build_dim(df, ["a", "b"], "id", key_mode="hash")
    d2 = star.build_dim(df, ["a", "b"], "id", key_mode="hash")
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    assert d1.count() == 2  # dedup applied


def test_upsert_star_shapes(spark):
    batch = spark.createDataFrame(
        [
            (10, 20, True, 1, 2, 3, 4, None, 5),
            (10, 20, True, 1, 2, 3, 4, None, 5),  # exact dup
            (10, 21, False, 1, 2, 3, 4, 7, 5),
        ],
        "reporting_id long, reported_id long, manual_detect boolean, "
        "region_id int, x_coord int, y_coord int, z_coord int, "
        "equip_head_id int, equip_weapon_id int",
    )
    # fill the remaining gear slots as nulls
    for slot in [
        "equip_amulet_id", "equip_torso_id", "equip_legs_id", "equip_boots_id",
        "equip_cape_id", "equip_hands_id", "equip_shield_id",
    ]:
        batch = batch.withColumn(slot, F.lit(None).cast("int"))
    out = star.upsert_star(batch, key_mode="hash")
    assert out["sighting"].count() == 2
    assert out["gear"].count() == 2
    assert out["location"].count() == 1
    fact = out["fact"]
    assert fact.count() == 2  # dup row collapsed by fact PK
    assert {"sighting_id", "gear_id", "location_id"} <= set(fact.columns)


def test_get_or_insert_dim(spark):
    batch = spark.createDataFrame([("a",), ("b",), ("c",), ("a",)], ["name"])
    dim = spark.createDataFrame([("a", 100)], "name string, id long")
    resolved, new_rows = star.get_or_insert_dim(batch, dim, key_mode="rank")
    assert sorted((r.name, r.id) for r in new_rows.collect()) == [("b", 1), ("c", 2)]
    res = {(r.name, r.id) for r in resolved.collect()}
    assert ("a", 100) in res and ("b", 1) in res and ("c", 2) in res
    assert resolved.filter(F.col("id").isNull()).count() == 0


def test_rank_ids_matches_global_dense_rank_window(spark):
    """rank_ids (range-bucketed row_number + prefix offsets, r15) must
    reproduce dense_rank() OVER (ORDER BY keys) exactly on distinct-on-
    key input — including NULL key parts (nulls first) and multi-column
    keys — while its plan carries no global single-partition window."""
    from pyspark.sql import Window

    rows = [
        (None, None),
        (None, 5),
        (1, None),
        (1, 2),
        (1, 7),
        (3, 0),
        (3, 1),
        (8, None),
        (8, 4),
        (9, 9),
    ]
    df = spark.createDataFrame(rows, "k1 int, k2 int").repartition(7)
    got = {
        ((r.k1, r.k2), r.sid)
        for r in star.rank_ids(df, ["k1", "k2"], "sid").collect()
    }
    w = Window.orderBy(
        F.col("k1").asc_nulls_first(), F.col("k2").asc_nulls_first()
    )
    want = {
        ((r.k1, r.k2), r.sid)
        for r in df.withColumn(
            "sid", F.dense_rank().over(w).cast("long")
        ).collect()
    }
    assert got == want
    # the whole point: no global (empty-partition-spec) window sort
    plan = star.rank_ids(df, ["k1", "k2"], "sid")._jdf.queryExecution()
    optimized = plan.optimizedPlan().toString()
    assert "windowspecdefinition(k1" not in optimized.replace(" ", "").lower()


def test_build_dim_rank_mode_ids_unchanged(spark):
    """build_dim(key_mode='rank') after the r15 rank_ids rewrite must
    assign the same ids as the dense_rank window form it replaced."""
    batch = spark.createDataFrame(
        [(2, None), (2, 5), (None, 5), (2, None), (7, 1)],
        "a int, b int",
    )
    out = {
        ((r.a, r.b), r.did)
        for r in star.build_dim(batch, ["a", "b"], "did", key_mode="rank")
        .collect()
    }
    assert out == {
        ((None, 5), 1),
        ((2, None), 2),
        ((2, 5), 3),
        ((7, 1), 4),
    }
