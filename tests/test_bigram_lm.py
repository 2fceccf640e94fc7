"""text_bigram_lm_score vs hand-computed add-0.5 bigram cross-entropy
on a corpus small enough to verify with a calculator. The catalog query
reads parquet, so the math is exercised through a temp-dir parquet copy
of the tiny corpus (the oracle-parity sweep covers the real tables)."""

from __future__ import annotations

import math

import pytest

from report_worker_spark.plans.catalog import QUERIES


def test_bigram_lm_hand_computed(spark, tmp_path):
    docs = [(0, "a b a b"), (1, "a b c")]
    sf = str(tmp_path)
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r.doc_id: (r.n_transitions, r.cross_entropy_nats)
        for r in QUERIES["text_bigram_lm_score"](spark, sf).collect()
    }
    # c2: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V=3
    lp_ab = math.log(3.5 / 4.5)
    lp_ba = math.log(1.5 / 3.5)
    lp_bc = math.log(1.5 / 3.5)
    h0 = -(2 * lp_ab + lp_ba) / 3
    h1 = -(lp_ab + lp_bc) / 2
    assert got[0][0] == 3 and got[1][0] == 2
    assert got[0][1] == pytest.approx(h0, abs=1e-9)
    assert got[1][1] == pytest.approx(h1, abs=1e-9)
    # gibberish scores worse than common text: the repeated (a,b)
    # transition makes doc 0 lower-entropy than doc 1
    assert got[0][1] < got[1][1]
