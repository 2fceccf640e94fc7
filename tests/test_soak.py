"""Composed-curation soak guard (VERDICT_r6 item 9): the K=10 stress
battery runs by hand (stress.py, STRESS.md), but the growth-ratio
invariant — COMPOSITION stays ~linear, no stage feeds a superlinear
blowup into the next — must hold in CI too. This runs the SAME
composed pipeline (stress.run_composed_curation) at K=1 and K=2 over
the sf0.01 documents and bounds the wall-growth ratio."""

from __future__ import annotations

import time

import pytest


@pytest.mark.soak
def test_composed_curation_growth_ratio(spark, sf_oracle):
    import stress

    old_sf = stress.SF_DIR
    stress.SF_DIR = sf_oracle
    try:
        def timed(k: int) -> float:
            docs = stress.upscale_documents(spark, k)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            stress.run_composed_curation(spark, docs)
            return time.perf_counter() - t0

        timed(1)  # warm codegen/JIT outside the clock
        t1 = timed(1)
        t2 = timed(2)
    finally:
        stress.SF_DIR = old_sf

    # 2× data. Linear composition ⇒ ratio ≈ 2 (STRESS.md's K=10 run
    # measured 1.34 at scale); a superlinear stage (all-pairs join,
    # unbounded fan-out) shows up as ≫4 even at this size. The bound
    # is deliberately loose — small-K wall clocks carry fixed costs
    # and host noise; this is a blowup tripwire, not a benchmark.
    assert t2 / t1 < 4.0, (t1, t2)
