"""JDBC source/sink exercised against embedded Derby (bundled with
Spark) — the closest available stand-in for the reference's MySQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from report_worker_spark.sources import jdbc as j


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _exec(spark, url, sql):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute(sql)
        st.close()
    finally:
        conn.close()


def test_append_and_read_dim_roundtrip(spark, derby_url):
    _exec(
        spark, derby_url,
        "CREATE TABLE players (id BIGINT NOT NULL, name VARCHAR(50) NOT NULL)",
    )
    dim = spark.createDataFrame([(1, "alice"), (2, "bob")], "id long, name string")
    j.append_table(dim, derby_url, "players")
    back = j.read_dim(spark, derby_url, "players")
    back = back.toDF(*[c.lower() for c in back.columns])  # Derby uppercases
    assert sorted((r.id, r.name) for r in back.collect()) == [
        (1, "alice"), (2, "bob"),
    ]


def test_transactional_multi_table_commit(spark, derby_url):
    _exec(spark, derby_url, "CREATE TABLE sighting (sid BIGINT, rid BIGINT)")
    _exec(spark, derby_url, "CREATE TABLE fact (sid BIGINT, region INT)")
    sight = spark.createDataFrame([(10, 20), (11, 21)], "sid long, rid long")
    fact = spark.createDataFrame([(10, 1)], "sid long, region int")
    j.transactional_multi_table_write(
        spark, derby_url, [("sighting", sight), ("fact", fact)],
        insert_verb="INSERT INTO",
    )
    assert j.read_dim(spark, derby_url, "sighting").count() == 2
    assert j.read_dim(spark, derby_url, "fact").count() == 1


def test_transactional_rollback_on_failure(spark, derby_url):
    """Second table's insert fails (missing table) → the first table's
    rows must be rolled back: the atomicity the reference gets from one
    MySQL transaction (S6/ST1)."""
    _exec(spark, derby_url, "CREATE TABLE gear (gid BIGINT)")
    good = spark.createDataFrame([(1,), (2,)], "gid long")
    with pytest.raises(Exception):
        j.transactional_multi_table_write(
            spark, derby_url,
            [("gear", good), ("does_not_exist", good)],
            insert_verb="INSERT INTO",
        )
    assert j.read_dim(spark, derby_url, "gear").count() == 0  # rolled back


def test_null_values_cross_the_boundary(spark, derby_url):
    _exec(spark, derby_url, "CREATE TABLE g (gid BIGINT, head INT)")
    df = spark.createDataFrame([(1, None), (2, 5)], "gid long, head int")
    j.transactional_multi_table_write(
        spark, derby_url, [("g", df)], insert_verb="INSERT INTO"
    )
    got = j.read_dim(spark, derby_url, "g")
    got = got.toDF(*[c.lower() for c in got.columns])  # Derby uppercases
    back = {r.gid: r.head for r in got.collect()}
    assert back == {1: None, 2: 5}


def test_jdbc_star_sink_stream_idempotent(spark, derby_url):
    """Full reference deployment: staging batch → JdbcStarSink → Derby
    star schema in one txn. Re-processing the same rows must insert
    nothing new (DB-backed NOT EXISTS guards + fact-PK anti-join)."""
    from pyspark.sql import functions as F

    from report_worker_spark.sources.jdbc import JdbcStarSink, read_dim
    from report_worker_spark.sources.synthetic import generate_reports
    from report_worker_spark.streaming.pipeline import wire_to_staging

    for ddl in [
        """CREATE TABLE report_sighting (
             reporting_id BIGINT, reported_id BIGINT, manual_detect BOOLEAN,
             sighting_id BIGINT)""",
        """CREATE TABLE report_gear (
             equip_head_id INT, equip_amulet_id INT, equip_torso_id INT,
             equip_legs_id INT, equip_boots_id INT, equip_cape_id INT,
             equip_hands_id INT, equip_weapon_id INT, equip_shield_id INT,
             gear_id BIGINT)""",
        """CREATE TABLE report_location (
             region_id INT, x_coord INT, y_coord INT, z_coord INT,
             location_id BIGINT)""",
        """CREATE TABLE report (
             sighting_id BIGINT, location_id BIGINT, gear_id BIGINT,
             region_id INT)""",
    ]:
        _exec(spark, derby_url, ddl)

    players = spark.range(300).select(
        F.concat(F.lit("player"), F.col("id")).alias("name"),
        F.col("id").alias("id"),
    )
    staging = wire_to_staging(
        generate_reports(spark, n=800, seed=17), players
    ).drop("timestamp", "on_members_world", "on_pvp_world", "world_number",
           "equip_ge_value", "item_bug", "manual_detect")
    staging = staging.withColumn("manual_detect", F.lit(True)) \
        .withColumnRenamed("reporting_id", "reporting_id")
    sink = JdbcStarSink(derby_url, insert_verb="INSERT INTO")

    sink(staging, 0)
    counts1 = {
        t: read_dim(spark, derby_url, t).count()
        for t in ["report_sighting", "report_gear", "report_location", "report"]
    }
    assert all(v > 0 for v in counts1.values())

    sink(staging, 1)  # same batch again — everything anti-joined away
    counts2 = {
        t: read_dim(spark, derby_url, t).count()
        for t in ["report_sighting", "report_gear", "report_location", "report"]
    }
    assert counts1 == counts2
    assert [s["status"] for s in sink.stats] == ["ok", "ok"]
