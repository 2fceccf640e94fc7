"""k-core peeling (functions/graph.py:kcore): known cores on
hand-built graphs, cascade behavior, and convergence of the catalog
configuration (one extra round is a no-op at the catalog's fixed
budget — the invariant the unrolled oracle depends on)."""

from __future__ import annotations

from report_worker_spark.functions import graph as gr
from report_worker_spark.plans.catalog import _cooccur_edges


def _edges(spark, pairs):
    return gr.undirected_edges(
        spark.createDataFrame(pairs, ["src", "dst"])
    )


def test_clique_with_pendants(spark):
    # 4-clique {1,2,3,4} + pendant chain 4-5-6: the 3-core is exactly
    # the clique, every member with in-core degree 3
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),
    ]
    got = sorted(
        (r.node, r.core_deg)
        for r in gr.kcore(_edges(spark, pairs), k=3).collect()
    )
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]


def test_path_cascades_to_empty(spark):
    # a 10-node path has no 2-core; peeling eats one node per end per
    # round, so this also exercises multi-round cascade
    pairs = [(i, i + 1) for i in range(1, 10)]
    got = gr.kcore(_edges(spark, pairs), k=2, max_iterations=8).collect()
    assert got == []


def test_cycle_is_its_own_2core(spark):
    pairs = [(i, i + 1) for i in range(1, 8)] + [(8, 1)]
    got = sorted(
        (r.node, r.core_deg)
        for r in gr.kcore(_edges(spark, pairs), k=2).collect()
    )
    assert got == [(i, 2) for i in range(1, 9)]


def test_catalog_budget_converged(spark, sf_oracle):
    """The catalog query's 16-round budget must be a fixpoint on the
    driver corpus: a 17th round changes nothing."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf_oracle)).cache()
    a = sorted(
        map(tuple, gr.kcore(e, k=3, max_iterations=16).collect())
    )
    b = sorted(
        map(tuple, gr.kcore(e, k=3, max_iterations=17).collect())
    )
    assert a == b and len(a) > 0
