"""Unit tests for the graph operators (functions/graph.py),
cross-checked against hand-countable graphs and a pure-Python
PageRank reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.functions import graph as gr


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_undirected_edges_canonicalizes(spark):
    e = _edges(
        spark,
        [(2, 1), (1, 2), (3, 3), (1, 3), (3, 1)],
    )
    got = sorted(map(tuple, gr.undirected_edges(e).collect()))
    assert got == [(1, 2), (1, 3)]  # dupes merged, self-loop dropped


def test_triangle_count_known_graphs(spark):
    # K4: C(4,3) = 4 triangles, 6 edges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = gr.triangle_count(gr.undirected_edges(_edges(spark, k4))).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)

    # triangle + pendant vertex + disconnected edge: exactly 1 triangle
    g = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)]
    row = gr.triangle_count(gr.undirected_edges(_edges(spark, g))).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (6, 5, 1)

    # square (4-cycle): 0 triangles
    sq = [(1, 2), (2, 3), (3, 4), (1, 4)]
    row = gr.triangle_count(gr.undirected_edges(_edges(spark, sq))).collect()[0]
    assert row.n_triangles == 0


def _py_pagerank(pairs, iters=3, d=0.85):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    pr = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(sorted(pr[u] / len(adj[u]) for u in adj[v]))
            nxt[v] = (1.0 - d) / n + d * s
        pr = nxt
    return pr


def test_pagerank_matches_python_reference(spark):
    # star graph + a path hanging off it: asymmetric degrees
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5), (5, 6)]
    e = gr.undirected_edges(_edges(spark, pairs))
    got = {
        r.node: r.pr
        for r in gr.pagerank(e, iterations=3, deterministic=True).collect()
    }
    want = _py_pagerank(pairs)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # mass is conserved up to the damping leak (undirected: no dangling)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_modes_agree(spark):
    """SUM mode (scale path) and the deterministic fold agree to float
    tolerance — same semantics, different summation order."""
    pairs = [(a, a + 1) for a in range(20)] + [(0, 10), (5, 15), (3, 18)]
    e = gr.undirected_edges(_edges(spark, pairs))
    fast = {r.node: r.pr for r in gr.pagerank(e, iterations=3).collect()}
    det = {
        r.node: r.pr
        for r in gr.pagerank(e, iterations=3, deterministic=True).collect()
    }
    assert set(fast) == set(det)
    for v in det:
        assert abs(fast[v] - det[v]) < 1e-12


def test_common_neighbors_hand_graph(spark):
    """1-2, 1-3, 2-3 triangle plus 1-4 and 2-4: pair (3,4) shares
    neighbors {1, 2} but is NOT an edge → the only candidate at
    min_common=2. Adjacent pairs (e.g. (1,2), also sharing 2 common
    neighbors) must be anti-joined away."""
    e = gr.undirected_edges(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    )
    got = [tuple(r) for r in gr.common_neighbors(e, k=10).collect()]
    assert got == [(1, 3, 4, 2)]
    # min_common=1 admits more pairs, still never adjacent ones
    more = {(r.a, r.b) for r in gr.common_neighbors(e, k=10, min_common=1).collect()}
    assert (3, 4) in more
    assert not more & {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}


def test_adamic_adar_hand_graph(spark):
    """Same 5-edge graph as the common-neighbors test: candidate (3,4)
    shares apexes {1, 2} with deg(1)=3, deg(2)=3, so the score is
    exactly 2/ln(3). Hub discount check at min_common=1: a pair whose
    single shared neighbor is the degree-3 hub scores 1/ln(3), below a
    pair sharing a degree-2 apex (1/ln(2))."""
    import math

    e = gr.undirected_edges(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    )
    got = gr.adamic_adar(e, k=10).collect()
    assert [(r.rank, r.a, r.b, r.n_common) for r in got] == [(1, 3, 4, 2)]
    assert abs(got[0].aa_score - 2 / math.log(3)) < 1e-9

    # path graph 5-6, 6-7 plus hub wedge: (5,7) via apex 6 (deg 2)
    e2 = gr.undirected_edges(
        _edges(spark, [(5, 6), (6, 7), (1, 5), (1, 7), (1, 2), (2, 3)])
    )
    more = {
        (r.a, r.b): r.aa_score
        for r in gr.adamic_adar(e2, k=10, min_common=1).collect()
    }
    # (5,7) shares BOTH apex 6 (deg 2) and hub 1 (deg 3)
    assert abs(more[(5, 7)] - (1 / math.log(2) + 1 / math.log(3))) < 1e-9
    # (2,5) shares only hub 1 → pure hub-discounted score
    assert abs(more[(2, 5)] - 1 / math.log(3)) < 1e-9
    assert more[(5, 7)] > more[(2, 5)]


def test_jaccard_neighbors_hand_graph(spark):
    """Triangle 1-2-3 plus 1-4, 2-4: candidate (3,4) has Γ3={1,2},
    Γ4={1,2} → jaccard 2/2 = 1.0 exactly (1_000_000 ppm)."""
    e = gr.undirected_edges(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    )
    adj = e.select(F.col("src").alias("n"), F.col("dst").alias("x")).unionAll(
        e.select(F.col("dst").alias("n"), F.col("src").alias("x"))
    )
    deg = adj.groupBy(F.col("x").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    got = {
        (r.v): r.d for r in deg.collect()
    }
    assert got == {1: 3, 2: 3, 3: 2, 4: 2}
    cn = gr.common_neighbors(e, k=10).collect()
    assert [(r.a, r.b, r.n_common) for r in cn] == [(3, 4, 2)]
    # union = deg(3) + deg(4) - common = 2 + 2 - 2 = 2 → ppm = 10⁶
    assert (cn[0].n_common * 1_000_000) // (got[3] + got[4] - cn[0].n_common) == 1_000_000
