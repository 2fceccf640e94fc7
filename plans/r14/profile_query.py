#!/usr/bin/env python
"""Per-stage profile of one bench query (round-14 working tool).

Usage: python plans/r14/profile_query.py <name> [runs]

Runs the query with the Spark UI enabled, materializes via the noop
sink (warmup + timed runs), then dumps per-stage wall/task metrics from
the UI REST API for the LAST run so the expensive stages are visible.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, ROOT)

import bench  # noqa: E402
from report_worker_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        f"rws-profile-{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    from report_worker_spark.plans.tables import load

    load(spark, bench.SF_DIR, "lineitem").count()
    build = bench.bench_builders()[name]
    times = []
    for i in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        bench.materialize(build(spark))
        times.append(time.perf_counter() - t0)
    print(f"{name}: runs={['%.3f' % t for t in times]} min={min(times):.3f}")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    # keep only completed stages, sorted by submission time; report the
    # tail (the last run's stages)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: s.get("submissionTime", ""))
    per_run = len(done) // runs if runs else len(done)
    tail = done[-per_run:] if per_run else done
    total_ms = 0
    rows = []
    for s in tail:
        t0 = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        t1 = s.get("completionTime")
        from datetime import datetime

        def _p(x):
            return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

        wall = (_p(t1) - _p(t0)).total_seconds() if t0 and t1 else 0.0
        total_ms += wall
        rows.append(
            (
                wall,
                s["stageId"],
                s["numCompleteTasks"],
                s.get("executorRunTime", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    rows.sort(reverse=True)
    print(f"last-run stages={len(tail)} stage-wall-sum={total_ms:.3f}s")
    print(f"{'wall_s':>7} {'stage':>5} {'tasks':>5} {'runtime_ms':>10} "
          f"{'shufR':>9} {'shufW':>9}  name")
    for wall, sid, nt, rt, sr, sw, nm in rows[:25]:
        print(f"{wall:7.3f} {sid:5d} {nt:5d} {rt:10d} {sr:9d} {sw:9d}  {nm}")


if __name__ == "__main__":
    main()
