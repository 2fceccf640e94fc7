"""Every catalog query must run at sf0.001 (the driver's smoke scale):
empty/small inputs are where sequence(), slice(), limit() and window
edge cases bite."""

from __future__ import annotations

import pytest

from report_worker_spark.plans import QUERIES

# O(n²)-exact oracle baselines and heavy ANN are exercised at sf0.01 by
# the parity suite; at sf0.001 they're cheap anyway — include everything.


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_runs_at_smoke_scale(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    n = df.count()
    assert n >= 0
    # schema must be stable across immediate re-invocation
    assert df.schema == QUERIES[name](spark, sf_small).schema


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
