#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench queries into plans/r15/.

Usage: python scripts/explain_query.py <suffix> <name> [<name> ...]
       python scripts/explain_query.py before dedup_minhash_lsh sim_lsh_topk

Writes plans/r15/<name>_<suffix>.txt for each query, using the same
session/builders as bench.py so the captured plan is the benched plan.
One shared session (explain is plan-only, no execution — neighbor noise
does not apply).
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402
from report_worker_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("rws-explain")
    builders = bench.bench_builders()
    for name in names:
        df = builders[name](spark)
        # DataFrame.explain prints to stdout; capture it
        buf = io.StringIO()
        stdout = sys.stdout
        try:
            sys.stdout = buf
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
