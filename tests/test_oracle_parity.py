"""Every oracle-paired catalog query must hash-match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from report_worker_spark.plans import ORACLE, QUERIES

from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    problems = compare(df, ORACLE[name], sf_oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_no_oracle_queries_run(spark, sf_oracle, name):
    """Hash-free (rows-tier) queries must run, be deterministic, and be
    non-degenerate: a named schema, at least one row at sf0.01, and no
    column that comes back entirely null."""
    df = QUERIES[name](spark, sf_oracle)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, QUERIES[name](spark, sf_oracle).collect()))
    assert a == b
    assert df.columns and all(c for c in df.columns), df.columns
    assert len(a) > 0, f"{name}: empty result at sf0.01"
    for idx, col in enumerate(df.columns):
        assert any(row[idx] is not None for row in a), (
            f"{name}: column {col!r} is entirely null"
        )
