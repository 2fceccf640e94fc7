from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.functions.dedup import (
    connected_components,
    dedup_canonical,
    ngram_jaccard_pairs,
)


def test_components_chain_and_islands(spark):
    # graph: 1-2-3 chain, 5-6 pair, 9 isolated (no edges → absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_components_long_chain_converges(spark):
    n = 16  # diameter 16 — several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comps = connected_components(pairs, max_iterations=50).collect()
    assert {r.component for r in comps} == {0}
    assert len(comps) == n + 1


def test_dedup_canonical_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d e f g"),        # dup of 1
            (3, "a b c d e f g h"),      # near-dup of 1/2
            (10, "x y z w q r t"),
            (11, "completely different text here now ok yes"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    out = dedup_canonical(docs, pairs)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 10, 11]
