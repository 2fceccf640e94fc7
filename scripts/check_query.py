#!/usr/bin/env python
"""Oracle-parity spot check for named catalog queries.

Usage: python scripts/check_query.py <sf_dir> <name> [<name> ...]

Runs each query through the SAME comparison the local parity tests use
(tests/oracle_harness.compare) against its DuckDB oracle twin. Exits
non-zero on any mismatch. Rows-tier queries (no oracle) are skipped
with a note.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from oracle_harness import compare  # noqa: E402

from report_worker_spark.plans import ORACLE, QUERIES  # noqa: E402
from report_worker_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("rws-check")
    failed = []
    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT A CATALOG QUERY")
            failed.append(name)
            continue
        if name not in ORACLE or not ORACLE[name]:
            print(f"{name}: rows-tier (no oracle) — skipped")
            continue
        df = QUERIES[name](spark, sf_dir)
        problems = compare(df, ORACLE[name], sf_dir)
        if problems:
            print(f"{name}: FAIL")
            for p in problems:
                print(f"  - {p}")
            failed.append(name)
        else:
            print(f"{name}: ok")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
