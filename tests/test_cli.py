from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.__main__ import main
from report_worker_spark.sources.synthetic import generate_report_json


def test_cli_ingest_batch_and_list(spark, tmp_path, capsys):
    generate_report_json(spark, n=1000, seed=5).write.parquet(
        str(tmp_path / "wire")
    )
    spark.range(300).select(
        F.concat(F.lit("player"), F.col("id")).alias("name"),
        F.col("id").alias("id"),
    ).write.parquet(str(tmp_path / "players"))

    rc = main(
        [
            "ingest",
            "--input", str(tmp_path / "wire"),
            "--out", str(tmp_path / "star"),
            "--players", str(tmp_path / "players"),
        ]
    )
    assert rc == 0
    fact = spark.read.parquet(str(tmp_path / "star/fact"))
    assert fact.count() > 0
    assert "dt" in fact.columns

    rc = main(["list-queries"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "flagship_top_reported\toracle" in out

    assert main(["query", "nope_not_real"]) == 2


def test_cli_ingest_ids_stable_across_runs(spark, tmp_path):
    """Two separate ingest invocations over different batches must
    resolve the same player name to the same id (dim store persists)."""
    generate_report_json(spark, n=400, seed=21).write.parquet(
        str(tmp_path / "w1")
    )
    generate_report_json(spark, n=400, seed=22).write.parquet(
        str(tmp_path / "w2")
    )
    out = str(tmp_path / "star2")
    assert main(["ingest", "--input", str(tmp_path / "w1"), "--out", out]) == 0
    dim1 = {
        r.name: r.id
        for r in spark.read.parquet(f"{out}/_dims/players").collect()
    }
    assert main(["ingest", "--input", str(tmp_path / "w2"), "--out", out]) == 0
    dim2 = {
        r.name: r.id
        for r in spark.read.parquet(f"{out}/_dims/players")
        .dropDuplicates(["name"]).collect()
    }
    for name, i in dim1.items():
        assert dim2[name] == i  # stable
    assert len(dim2) >= len(dim1)


def test_cli_ingest_jsonl(spark, tmp_path):
    msgs = generate_report_json(spark, n=300, seed=8)
    msgs.select("value").write.text(str(tmp_path / "jl"))
    out = str(tmp_path / "star_jl")
    rc = main(
        ["ingest", "--input", str(tmp_path / "jl"), "--out", out,
         "--format", "jsonl"]
    )
    assert rc == 0
    assert spark.read.parquet(f"{out}/fact").count() > 0


def test_cli_explain(spark, capsys):
    assert main(["explain", "nope_not_real"]) == 2
    capsys.readouterr()
    rc = main(
        ["explain", "stats_benford_first_digit",
         "--sf-dir", "/root/testdata/sf0.001", "--mode", "formatted"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out
    # the 1-column projection must reach the scan
    assert "o_totalprice" in out
