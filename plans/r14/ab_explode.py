#!/usr/bin/env python
"""A/B the explode(expensive-expr) inferred-filter fix variants.

Times the `wins` half of _grouped_dup_windows (shingle + posexplode)
and the full duplicate_spans consumption under:
  A. current code (explode, filter inferred+pushed below spread)
  B. posexplode_outer + isNotNull post-filter (rule skips outer)
  C. lazy localCheckpoint pin of the shingled base
  D. A but with InferFiltersFromGenerate excluded via conf
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from report_worker_spark.session import get_spark  # noqa: E402
from report_worker_spark.functions.dedup import (  # noqa: E402
    tokens,
    _window_hashes,
)
from report_worker_spark.plans.tables import load  # noqa: E402
from report_worker_spark.util import spread  # noqa: E402

K = 8


def wins_a(d):
    base = (
        spread(d)
        .select(F.col("doc_id").alias("_id"), tokens("text").alias("_t"))
        .select("_id", _window_hashes(F.col("_t"), K).alias("_wh"))
    )
    return base.select("_id", F.posexplode("_wh").alias("pos", "_h"))


def wins_b(d):
    base = (
        spread(d)
        .select(F.col("doc_id").alias("_id"), tokens("text").alias("_t"))
        .select("_id", _window_hashes(F.col("_t"), K).alias("_wh"))
    )
    return base.select(
        "_id", F.posexplode_outer("_wh").alias("pos", "_h")
    ).filter(F.col("pos").isNotNull())


def wins_c(d):
    base = (
        spread(d)
        .select(F.col("doc_id").alias("_id"), tokens("text").alias("_t"))
        .select("_id", _window_hashes(F.col("_t"), K).alias("_wh"))
        .localCheckpoint(eager=False)
    )
    return base.select("_id", F.posexplode("_wh").alias("pos", "_h"))


def main() -> None:
    variant = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    extra = {}
    if variant == "d":
        extra["spark.sql.optimizer.excludedRules"] = (
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
        )
    spark = get_spark(f"ab-explode-{variant}", extra_conf=extra)
    d = load(spark, bench.SF_DIR, "documents")
    d.count()  # warm metadata
    fn = {"a": wins_a, "b": wins_b, "c": wins_c, "d": wins_a}[variant]
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        bench.materialize(fn(d))
        times.append(time.perf_counter() - t0)
    print(
        f"wins[{variant}]: {['%.3f' % t for t in times]} min={min(times):.3f}"
    )


if __name__ == "__main__":
    main()
