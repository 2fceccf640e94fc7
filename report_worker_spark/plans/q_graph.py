"""Catalog family: graph analytics over co-occurrence edges.

Mechanically split from the monolithic plans/catalog.py (round
12); query definition order within the family is the original
file order, and all shared helpers come from ``_qshared``.
"""

from __future__ import annotations

from ._qshared import *  # noqa: F401,F403




@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL}
    SELECT
      (SELECT count(*) FROM (SELECT src FROM edges UNION SELECT dst FROM edges))
        AS n_nodes,
      (SELECT count(*) FROM edges) AS n_edges,
      (SELECT count(*) FROM edges e1
         JOIN edges e2 ON e2.src = e1.dst
         JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Degree-oriented wedge counting (graph.py) vs the oracle's naive
    a<b<c triple join — different physical strategy, same count. The
    orientation bounds wedge fan-out by the arboricity, which is what
    survives a power-law degree distribution at 100 TB; the oracle's
    e1⋈e2 join explodes on hot vertices."""
    return gr.triangle_count(gr.undirected_edges(_cooccur_edges(spark, sf)))




@query(
    "graph_degree_topk",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    d AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
    deg AS (SELECT src AS node, count(*) AS deg FROM d GROUP BY src)
    SELECT node, deg, rank FROM (
      SELECT node, deg,
             ROW_NUMBER() OVER (ORDER BY deg DESC, node ASC) AS rank
      FROM deg)
    WHERE rank <= 20
    """,
)
def graph_degree_topk(spark: SparkSession, sf: str) -> DataFrame:
    deg = gr.degrees(gr.undirected_edges(_cooccur_edges(spark, sf)))
    w = Window.orderBy(F.col("deg").desc(), F.col("node").asc())
    return (
        deg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("node", "deg", "rank")
    )




@query("graph_pagerank_top20", oracle=_pagerank_oracle(3))
def graph_pagerank_top20(spark: SparkSession, sf: str) -> DataFrame:
    """3-iteration PageRank, deterministic mode: per-node contributions
    are folded smallest-first (array_sort + sequential aggregate), so
    pr is bit-identical to the oracle's list_sort + list_reduce fold —
    the float-discipline pattern this catalog uses everywhere. The
    scale mode (deterministic=False) swaps the fold for a map-side
    combinable SUM."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    pr = gr.pagerank(e, iterations=3, damping=0.85, deterministic=True)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        pr.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )




@query("graph_kcore_membership", oracle=_kcore_oracle(3, 16))
def graph_kcore_membership(spark: SparkSession, sf: str) -> DataFrame:
    """3-core of the part co-occurrence graph (node, degree within the
    core): peeling fixpoint, 16 fixed rounds (convergence within the
    budget is pytest-asserted — an extra round is a no-op). The oracle
    replays the peel unrolled, so every intermediate frontier is
    hash-checked through the final membership."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    return gr.kcore(e, k=3, max_iterations=16)




@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (
      SELECT src AS n, dst AS x FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY n
    ),
    wadj AS (
      SELECT adj.n, adj.x, 1.0 / ln(CAST(deg.d AS DOUBLE)) AS w
      FROM adj JOIN deg USING (n)
    ),
    cand AS (
      SELECT l.x AS a, r.x AS b,
             CAST(count(*) AS BIGINT) AS n_common,
             round(list_reduce(list_sort(list(l.w)), (x, y) -> x + y), 12)
               AS aa_score
      FROM wadj l JOIN wadj r ON l.n = r.n AND l.x < r.x
      GROUP BY l.x, r.x
      HAVING count(*) >= 2
    ),
    nonadj AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.src = c.a AND e.dst = c.b
      )
    )
    SELECT CAST(row_number() OVER (ORDER BY aa_score DESC, a, b) AS INT)
             AS rank,
           a, b, n_common, aa_score
    FROM nonadj
    ORDER BY aa_score DESC, a, b
    LIMIT 20
    """,
)
def graph_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    """Adamic-Adar link prediction over the co-purchase graph: top-20
    non-adjacent part pairs weighting rare shared neighbors above hubs
    (graph.py:adamic_adar — degree join ahead of the apex wedge join,
    sorted float fold, 12-decimal ln discipline)."""
    return gr.adamic_adar(
        gr.undirected_edges(_cooccur_edges(spark, sf)), k=20, min_common=2
    )




@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (
      SELECT src AS n, dst AS x FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (
      SELECT x AS v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY x
    ),
    cand AS (
      SELECT l.x AS a, r.x AS b, CAST(count(*) AS BIGINT) AS n_common
      FROM adj l JOIN adj r ON l.n = r.n AND l.x < r.x
      GROUP BY l.x, r.x
      HAVING count(*) >= 2
    ),
    nonadj AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.src = c.a AND e.dst = c.b
      )
    ),
    scored AS (
      SELECT n.a, n.b, n.n_common,
             da.d + db.d - n.n_common AS n_union
      FROM nonadj n
      JOIN deg da ON da.v = n.a
      JOIN deg db ON db.v = n.b
    )
    SELECT CAST(row_number() OVER (
             ORDER BY n_common * 1000000 // n_union DESC, a, b) AS INT)
             AS rank,
           a, b, n_common, n_union,
           CAST(n_common * 1000000 // n_union AS BIGINT) AS jaccard_ppm
    FROM scored
    ORDER BY jaccard_ppm DESC, a, b
    LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction: |Γa∩Γb| / |Γa∪Γb| for
    non-adjacent pairs, ranked ENTIRELY in integer arithmetic — the
    similarity is kept as parts-per-million via integer division
    (n_common·10⁶ div n_union), so unlike the Adamic-Adar ln fold
    there is no float discipline at all; ranking ties break on (a, b).
    Same apex wedge join as common_neighbors plus two dim-sized degree
    joins."""
    edges = gr.undirected_edges(_cooccur_edges(spark, sf))
    adj = edges.select(
        F.col("src").alias("n"), F.col("dst").alias("x")
    ).unionAll(edges.select(F.col("dst").alias("n"), F.col("src").alias("x")))
    deg = adj.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    left = adj.select("n", F.col("x").alias("a"))
    right = adj.select(
        (F.col("n") + F.lit(0)).alias("n"), F.coalesce(F.col("x")).alias("b")
    )
    cand = (
        left.join(right, on="n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
        .join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            on=["a", "b"],
            how="left_anti",
        )
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    scored = (
        cand.join(da, on="a")
        .join(db, on="b")
        .select(
            "a",
            "b",
            "n_common",
            (F.col("da") + F.col("db") - F.col("n_common")).alias("n_union"),
        )
        .withColumn(
            "jaccard_ppm",
            F.expr("n_common * 1000000 DIV n_union").cast("long"),
        )
    )
    top = scored.orderBy(
        F.col("jaccard_ppm").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(20)
    w = Window.orderBy(F.col("jaccard_ppm").desc(), F.col("a"), F.col("b"))
    return top.select(
        F.row_number().over(w).alias("rank"),
        "a",
        "b",
        "n_common",
        "n_union",
        "jaccard_ppm",
    )




@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (
      SELECT src AS n, dst AS x FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    cand AS (
      SELECT l.x AS a, r.x AS b, CAST(count(*) AS BIGINT) AS n_common
      FROM adj l JOIN adj r ON l.n = r.n AND l.x < r.x
      GROUP BY l.x, r.x
      HAVING count(*) >= 2
    ),
    nonadj AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.src = c.a AND e.dst = c.b
      )
    )
    SELECT CAST(row_number() OVER (ORDER BY n_common DESC, a, b) AS INT)
             AS rank,
           a, b, n_common
    FROM nonadj
    ORDER BY n_common DESC, a, b
    LIMIT 20
    """,
)
def graph_common_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """Link prediction over the co-purchase graph: top-20 non-adjacent
    part pairs by common-neighbor count (graph.py:common_neighbors —
    apex-keyed wedge join, anti-join of existing edges, integer counts
    so the ranking is engine-exact)."""
    return gr.common_neighbors(
        gr.undirected_edges(_cooccur_edges(spark, sf)), k=20, min_common=2
    )




@query("graph_bfs_khop", oracle=_bfs_oracle(4))
def graph_bfs_khop(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS over the part co-occurrence graph: minimum hop
    distance from the seed set (partkeys ≡ 0 mod 97) within 4 hops.
    The reference has no graph traversal; this is the training-data
    lineage/reachability primitive (e.g. crawl-frontier expansion,
    contamination reach) in Pregel frontier form — per round one
    frontier⋈adjacency equi-join plus one visited anti-join, cost
    proportional to the frontier's out-edges, not the graph. The
    oracle replays the same rounds as unrolled SQL layers."""
    # pin: the join-derived edge list feeds BOTH the seed pick
    # (degrees) and the BFS adjacency (r15 multi-consumer pin)
    e = gr.undirected_edges(_cooccur_edges(spark, sf)).localCheckpoint(
        eager=False
    )
    nodes = gr.degrees(e).select("node")
    seeds = nodes.filter(F.col("node") % 97 == 0)
    return gr.bfs_khop(e, seeds, max_hops=4)




@query("graph_label_propagation", oracle=_labelprop_oracle(3))
def graph_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """Synchronous min-label propagation (3 rounds) over the part
    co-occurrence graph — the deterministic proto-community detector
    (Raghavan et al. 2007, min-tiebreak variant): each round every
    node adopts min(own, neighbors) label. Min is order-independent,
    so the result is bit-stable across partitionings — unlike
    classic argmax-frequency LPA whose tie-breaks are run-dependent.
    Per round ONE groupBy(node) with map-side-combining MIN; the
    oracle replays the rounds as unrolled SQL."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    return gr.label_propagation(e, rounds=3)




@query(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges
      ) GROUP BY node
    ),
    ends AS (
      SELECT da.d AS x, db.d AS y
      FROM edges e JOIN deg da ON e.src = da.node
                   JOIN deg db ON e.dst = db.node
      UNION ALL
      SELECT db.d, da.d
      FROM edges e JOIN deg da ON e.src = da.node
                   JOIN deg db ON e.dst = db.node
    ),
    s AS (
      SELECT count(*) AS m2, sum(x) AS sx, sum(x*x) AS sxx,
             sum(x*y) AS sxy
      FROM ends
    )
    SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
           round(CAST(m2 * sxy - sx * sx AS DOUBLE)
                 / CAST(m2 * sxx - sx * sx AS DOUBLE), 12)
             AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree ASSORTATIVITY coefficient (Newman 2002): the Pearson
    correlation of degrees across edge endpoints — positive means hubs
    attach to hubs (social nets), negative means hub-and-spoke
    (technological nets). Both orientations of every edge enter, so
    the x/y marginals coincide and r reduces to (MΣxy−(Σx)²)/
    (MΣx²−(Σx)²) in EXACT integers; one float division + round 12 at
    the end. Shape: two broadcast-able degree joins + one map-side-
    combining aggregate — the graph-level summary costs one pass over
    the edge list."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    deg = gr.degrees(e).select("node", F.col("deg").cast("long").alias("d"))
    j = (
        e.join(deg.withColumnRenamed("node", "src"), on="src")
        .withColumnRenamed("d", "dx")
        .join(deg.withColumnRenamed("node", "dst"), on="dst")
        .withColumnRenamed("d", "dy")
    )
    ends = j.select(F.col("dx").alias("x"), F.col("dy").alias("y")).unionAll(
        j.select(F.col("dy").alias("x"), F.col("dx").alias("y"))
    )
    s = ends.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m2, sx = F.col("m2"), F.col("sx")
    return s.select(
        (m2 / 2).cast("long").alias("n_edges"),
        F.round(
            (m2 * F.col("sxy") - sx * sx).cast("double")
            / (m2 * F.col("sxx") - sx * sx).cast("double"),
            12,
        ).alias("assortativity"),
    )




@query("graph_personalized_pagerank", oracle=_ppr_oracle(3))
def graph_personalized_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PERSONALIZED PageRank top-20 from the mod-97 seed set — random
    walk with restart, the 'related items' / local-community
    primitive the global PageRank can't answer (its scores are
    query-independent). Deterministic fold mode for the oracle; the
    scale mode swaps in map-side-combinable SUM. Per round one
    contribution shuffle + a left join back to the node table (so
    unreached nodes carry exact 0.0 on both engines)."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    seeds = gr.degrees(e).select("node").filter(F.col("node") % 97 == 0)
    pr = gr.personalized_pagerank(
        e, seeds, iterations=3, damping=0.85, deterministic=True
    )
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        pr.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )




@query(
    "graph_clustering_global",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY node
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT agg.n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           tri.n_triangles, agg.n_wedges,
           CAST(3 * tri.n_triangles AS DOUBLE) / agg.n_wedges
             AS transitivity
    FROM agg CROSS JOIN tri
    """,
)
def graph_clustering_global(spark: SparkSession, sf: str) -> DataFrame:
    """GLOBAL CLUSTERING COEFFICIENT (transitivity = 3·triangles /
    wedges) — the one-number 'is this graph clique-ish or tree-ish'
    summary (Watts-Strogatz). Triangles come from the degree-oriented
    wedge counter (arboricity-bounded fan-out — the count that
    survives power-law degrees); wedges are a pure degree aggregate
    Σd(d−1)/2. Everything integer until one mirrored division. The
    oracle counts triangles with the naive a<b<c triple join —
    different physical strategy, same numbers."""
    # one pin: the triangle counter and the wedge aggregate otherwise
    # each re-derive the whole lineitem co-occurrence self-join
    e = gr.undirected_edges(_cooccur_edges(spark, sf)).localCheckpoint(
        eager=False
    )
    tri = gr.triangle_count(e).select("n_nodes", "n_edges", "n_triangles")
    deg = gr.degrees(e)
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("n_wedges")
    )
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        (
            (3 * F.col("n_triangles")).cast("double") / F.col("n_wedges")
        ).alias("transitivity"),
    )




@query(
    "graph_preferential_attachment",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY node
    ),
    topdeg AS (
      SELECT node, d FROM deg
      QUALIFY row_number() OVER (ORDER BY d DESC, node) <= 32
    ),
    cand AS (
      SELECT a.node AS a, b.node AS b, a.d * b.d AS pa_score
      FROM topdeg a JOIN topdeg b ON a.node < b.node
    ),
    nonadj AS (
      SELECT c.a, c.b, c.pa_score
      FROM cand c
      LEFT JOIN edges e ON e.src = c.a AND e.dst = c.b
      WHERE e.src IS NULL
    )
    SELECT CAST(row_number() OVER (ORDER BY pa_score DESC, a, b)
           AS BIGINT) AS rank, a, b, pa_score
    FROM nonadj
    QUALIFY row_number() OVER (ORDER BY pa_score DESC, a, b) <= 20
    """,
)
def graph_preferential_attachment(spark: SparkSession, sf: str) -> DataFrame:
    """PREFERENTIAL-ATTACHMENT link prediction (deg(u)·deg(v) — the
    Barabási-Albert growth score) — fourth member of the
    link-prediction family beside common-neighbors, Adamic-Adar and
    Jaccard. Unlike those, PA needs NO shared-neighbor evidence, so
    the candidate space is all non-edges; the scalable cut is the
    top-32 degree nodes (hub pairs dominate the score by
    construction), 496 bounded pairs, anti-join out existing edges,
    top-20 with full tiebreaks. Degree table + one bounded self-join
    — the fan-out never touches the fact."""
    # pinned: degrees + the existing-edge anti-join both consume e
    e = gr.undirected_edges(_cooccur_edges(spark, sf)).localCheckpoint(
        eager=False
    )
    deg = gr.degrees(e).select(
        "node", F.col("deg").cast("long").alias("d")
    )
    wtop = Window.orderBy(F.col("d").desc(), F.col("node"))
    top = (
        deg.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 32)
        .select("node", "d")
    )
    a = top.select(F.col("node").alias("a"), F.col("d").alias("da"))
    b = top.select(F.col("node").alias("b"), F.col("d").alias("db"))
    cand = a.join(b, F.col("a") < F.col("b")).select(
        "a", "b", (F.col("da") * F.col("db")).alias("pa_score")
    )
    nonadj = cand.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        on=["a", "b"],
        how="left_anti",
    )
    w = Window.orderBy(F.col("pa_score").desc(), F.col("a"), F.col("b"))
    return (
        nonadj.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("rank", "a", "b", "pa_score")
    )




@query(
    "graph_hits_scores",
    oracle=f"""
    WITH {_BUY_EDGES_SQL},
    h0 AS (SELECT DISTINCT src AS node, CAST(1 AS BIGINT) AS h FROM e),
    a1 AS MATERIALIZED (
      SELECT e.dst AS node, sum(h0.h) AS a
      FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst
    ),
    h1 AS MATERIALIZED (
      SELECT e.src AS node, sum(a1.a) AS h
      FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src
    ),
    a2 AS MATERIALIZED (
      SELECT e.dst AS node, sum(h1.h) AS a
      FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst
    ),
    h2 AS MATERIALIZED (
      SELECT e.src AS node, sum(a2.a) AS h
      FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
    SELECT n.node,
           CAST(coalesce(h2.h, 0) AS BIGINT) AS hub,
           CAST(coalesce(a2.a, 0) AS BIGINT) AS auth
    FROM nodes n
    LEFT JOIN h2 ON n.node = h2.node
    LEFT JOIN a2 ON n.node = a2.node
    """,
)
def graph_hits_scores(spark: SparkSession, sf: str) -> DataFrame:
    """HITS hubs/authorities on the directed customer→supplier
    purchase graph (1997 orders): hub customers buy from many
    well-sourced suppliers, authority suppliers are bought from by
    many well-connected customers. Unnormalized with an all-ones
    start, so both score vectors stay EXACT BIGINT path counts
    (functions/graph.py:hits) — no float fold discipline anywhere.
    Two rounds, each half-round one equi-join + integer map-side
    combinable SUM; the oracle replays the alternation unrolled."""
    return gr.hits(_buy_edges(spark, sf), rounds=2)




@query(
    "graph_butterfly_support",
    oracle=f"""
    WITH {_BUY_EDGES_SQL},
    wedges AS (
      SELECT a.dst AS s1, b.dst AS s2, count(*) AS support
      FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
      GROUP BY 1, 2
    ),
    total AS (
      SELECT CAST(coalesce(sum(support * (support - 1) / 2), 0)
                  AS BIGINT) AS butterflies
      FROM wedges WHERE support >= 2
    )
    SELECT s1, s2, CAST(support AS BIGINT) AS support,
           CAST(rank AS BIGINT) AS rank, t.butterflies
    FROM (
      SELECT s1, s2, support,
             row_number() OVER (
               ORDER BY support DESC, s1 ASC, s2 ASC) AS rank
      FROM wedges
    ) CROSS JOIN total t
    WHERE rank <= 20
    """,
)
def graph_butterfly_support(spark: SparkSession, sf: str) -> DataFrame:
    """BUTTERFLY (2×2 biclique) structure of the bipartite purchase
    graph: top-20 supplier pairs by co-purchase support plus the
    global butterfly count Σ C(support, 2) — the bipartite analogue
    of triangle counting (Wang et al., 'Butterfly Counting in
    Bipartite Networks'). Wedges pivot on the CUSTOMER side, whose
    Σdeg² is ~8× smaller than the supplier side here (the same
    degree-orientation economics as graph_triangle_count): one
    self-equi-join on src + one integer groupBy. Exact integers end
    to end."""
    e = _buy_edges(spark, sf)
    # pin the join-derived edge list: BOTH sides of the wedge self-join
    # consume it, and without the pin each side re-runs the
    # orders⋈lineitem derivation + distinct (r15, same device as the
    # r14 graph pins)
    e = e.localCheckpoint(eager=False)
    a = e.select("src", F.col("dst").alias("s1"))
    b = e.select("src", F.col("dst").alias("s2"))
    wedges = (
        a.join(b, on="src")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    wedges = wedges.localCheckpoint(eager=False)  # consumed twice
    total = wedges.filter(F.col("support") >= 2).agg(
        F.coalesce(
            F.sum(F.col("support") * (F.col("support") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("butterflies")
    )
    # top-20 tail as orderBy().limit() → TakeOrderedAndProject; the rank
    # window then runs over 20 rows, not a 1-partition sort of all wedges
    top = wedges.orderBy(
        F.col("support").desc(), F.col("s1").asc(), F.col("s2").asc()
    ).limit(20)
    w = Window.orderBy(
        F.col("support").desc(), F.col("s1").asc(), F.col("s2").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "s1",
            "s2",
            F.col("support").cast("long").alias("support"),
            "rank",
            "butterflies",
        )
    )




@query("graph_closeness_topk", oracle=_harmonic_oracle(4))
def graph_closeness_topk(spark: SparkSession, sf: str) -> DataFrame:
    """HARMONIC CLOSENESS centrality (Σ 1/d over reached nodes —
    well-defined on disconnected graphs, unlike classic closeness)
    for the 8 highest-degree vertices of the part co-occurrence
    graph, truncated at 4 hops. Per-seed BFS rides the bfs_khop
    frontier discipline with a seed tag: each round is ONE equi-join
    of the (seed, node) frontier against the adjacency list + one
    anti-join against the visited set, frontiers localCheckpoint'ed.
    Distances are integers; the ≤ O(V) reciprocal terms fold
    smallest-first per seed, round 12."""
    d = gr.undirected_edges(_cooccur_edges(spark, sf))
    adj = d.select("src", "dst").unionAll(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = adj.localCheckpoint(eager=False)  # consumed every round
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # seed pick as orderBy().limit() → TakeOrderedAndProject, not a
    # single-partition row_number window over the degree aggregate
    seeds = (
        deg.orderBy(F.col("deg").desc(), F.col("src").asc())
        .limit(8)
        .select(F.col("src").alias("seed"))
    )
    visited = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=False)
    frontier = visited.select("seed", "node")
    for h in range(1, 5):
        nxt = (
            adj.join(
                frontier.withColumnRenamed("node", "src"), on="src"
            )
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(
                visited.select("seed", "node"),
                on=["seed", "node"],
                how="left_anti",
            )
            .select("seed", "node", F.lit(h).alias("dist"))
            .localCheckpoint(eager=False)
        )
        # visited is a UNION of already-pinned frontiers — consuming it
        # re-reads their blocks, so pinning the union again only paid 4
        # extra full materializations of the growing visited set (r15)
        visited = visited.unionAll(nxt)
        frontier = nxt.select("seed", "node")
    recip = F.when(
        F.col("dist") > 0, F.lit(1.0) / F.col("dist")
    ).otherwise(F.lit(0.0))
    return visited.groupBy(F.col("seed").alias("node")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("reached"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(recip)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            12,
        ).alias("harmonic"),
    )




@query(
    "graph_k_truss",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj1 AS (
      SELECT src AS s, dst AS t FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    sup1 AS (
      SELECT e.src, e.dst, CAST(count(*) AS BIGINT) AS sup
      FROM edges e
      JOIN adj1 a ON a.s = e.src
      JOIN adj1 b ON b.s = e.dst AND b.t = a.t
      GROUP BY e.src, e.dst
    ),
    e1 AS (SELECT src, dst FROM sup1 WHERE sup >= 2),
    adj2 AS (
      SELECT src AS s, dst AS t FROM e1
      UNION ALL SELECT dst, src FROM e1
    ),
    sup2 AS (
      SELECT e.src, e.dst, CAST(count(*) AS BIGINT) AS sup
      FROM e1 e
      JOIN adj2 a ON a.s = e.src
      JOIN adj2 b ON b.s = e.dst AND b.t = a.t
      GROUP BY e.src, e.dst
    ),
    e2 AS (SELECT src, dst FROM sup2 WHERE sup >= 2),
    adj3 AS (
      SELECT src AS s, dst AS t FROM e2
      UNION ALL SELECT dst, src FROM e2
    ),
    sup3 AS (
      SELECT e.src, e.dst, CAST(count(*) AS BIGINT) AS sup
      FROM e2 e
      JOIN adj3 a ON a.s = e.src
      JOIN adj3 b ON b.s = e.dst AND b.t = a.t
      GROUP BY e.src, e.dst
    ),
    e3 AS (SELECT src, dst FROM sup3 WHERE sup >= 2)
    SELECT sup, CAST(count(*) AS BIGINT) AS n_edges
    FROM sup3 WHERE sup >= 2 GROUP BY sup
    """,
)
def graph_k_truss(spark: SparkSession, sf: str) -> DataFrame:
    """4-TRUSS PEELING census on the part co-occurrence graph: 3
    rounds of "recompute per-edge triangle support, drop edges in
    < k−2 = 2 triangles", then a histogram of the surviving support
    values — the cohesive-subgraph screen that is stricter than
    k-core (truss edges sit in many triangles, cores only need
    degree). Support per round is TWO node-keyed equi-joins of the
    edge list against the adjacency list + one groupBy (wedge budget
    Σ deg², the triangle-count economics — no all-pairs); each round
    localCheckpoints so the unrolled plan stays linear. Fixed round
    count (fixpoint not asserted; round-3 support is reported), the
    same discipline as the unrolled BFS/label-prop oracles."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)
    sup = None
    for _ in range(3):
        adj = e.select(
            F.col("src").alias("s"), F.col("dst").alias("t")
        ).unionAll(
            e.select(F.col("dst").alias("s"), F.col("src").alias("t"))
        )
        a = adj.select(F.col("s").alias("src"), F.col("t").alias("w"))
        b = adj.select(F.col("s").alias("dst"), F.col("t").alias("w"))
        sup = (
            e.join(a, on="src")
            .join(b, on=["dst", "w"])
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        e = (
            sup.filter(F.col("sup") >= 2)
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return (
        sup.filter(F.col("sup") >= 2)
        .groupBy("sup")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.col("sup").cast("long").alias("sup"), "n_edges")
    )




@query(
    "graph_rich_club",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (
      SELECT src AS s, dst AS t FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS deg
            FROM adj GROUP BY s),
    ks AS (SELECT CAST(unnest([2, 4, 8, 16, 32]) AS BIGINT) AS k),
    nk AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS n_k
      FROM ks k JOIN deg d ON d.deg > k.k GROUP BY k.k
    ),
    ek AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS e_k
      FROM ks k
      JOIN edges e ON TRUE
      JOIN deg ds ON ds.node = e.src
      JOIN deg dd ON dd.node = e.dst
      WHERE ds.deg > k.k AND dd.deg > k.k
      GROUP BY k.k
    )
    SELECT n.k, n.n_k, coalesce(e.e_k, 0) AS e_k,
           round(CAST(2 * coalesce(e.e_k, 0) AS DOUBLE)
                 / (n.n_k * (n.n_k - 1)), 12) AS phi
    FROM nk n LEFT JOIN ek e ON e.k = n.k
    WHERE n.n_k >= 2
    """,
)
def graph_rich_club(spark: SparkSession, sf: str) -> DataFrame:
    """RICH-CLUB COEFFICIENT φ(k) = 2·E_k / (N_k(N_k−1)) for degree
    thresholds k ∈ {2,4,8,16,32} — do high-degree parts
    preferentially co-occur with each other? (The hub-interconnect
    audit behind assortativity.) One degree pass; the threshold
    table (5 rows) broadcasts against nodes and against the
    degree-annotated edge list, so everything is counts — φ is the
    only float, round 12. Thresholds with fewer than 2 qualifying
    nodes are dropped (φ undefined)."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)  # consumed twice
    deg = gr.degrees(e)
    ks = spark.range(5).select(
        F.expr("cast(shiftleft(2, cast(id as int)) as bigint)").alias("k")
    )  # 2, 4, 8, 16, 32
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    ds = deg.select(F.col("node").alias("src"), F.col("deg").alias("sd"))
    dd = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dg"))
    ek = (
        e.join(ds, on="src")
        .join(dd, on="dst")
        .crossJoin(F.broadcast(ks))
        .filter((F.col("sd") > F.col("k")) & (F.col("dg") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    out = nk.join(ek, on="k", how="left").filter(F.col("n_k") >= 2)
    ekc = F.coalesce(F.col("e_k"), F.lit(0))
    return out.select(
        F.col("k").cast("long").alias("k"),
        "n_k",
        ekc.cast("long").alias("e_k"),
        F.round(
            (2 * ekc).cast("double")
            / (F.col("n_k") * (F.col("n_k") - 1)),
            12,
        ).alias("phi"),
    )




@query(
    "graph_modularity_labelprop",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
adj AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM adj),
l0 AS (SELECT node, node AS lbl FROM nodes)
, l1 AS (SELECT node, min(lbl) AS lbl FROM (SELECT node, lbl FROM l0 UNION ALL SELECT adj.a AS node, p.lbl FROM adj JOIN l0 p ON adj.b = p.node) GROUP BY node)
, l2 AS (SELECT node, min(lbl) AS lbl FROM (SELECT node, lbl FROM l1 UNION ALL SELECT adj.a AS node, p.lbl FROM adj JOIN l1 p ON adj.b = p.node) GROUP BY node)
, l3 AS (SELECT node, min(lbl) AS lbl FROM (SELECT node, lbl FROM l2 UNION ALL SELECT adj.a AS node, p.lbl FROM adj JOIN l2 p ON adj.b = p.node) GROUP BY node),
    comm AS (SELECT node, lbl FROM l3),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
    intra AS (
      SELECT CAST(count(*) AS BIGINT) AS ie
      FROM edges e
      JOIN comm a ON a.node = e.src
      JOIN comm b ON b.node = e.dst
      WHERE a.lbl = b.lbl
    ),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY a),
    dc AS (
      SELECT c.lbl, CAST(sum(d.d) AS BIGINT) AS dsum
      FROM comm c JOIN deg d USING (node) GROUP BY c.lbl
    ),
    summ AS (
      SELECT CAST(count(*) AS BIGINT) AS n_communities,
             CAST(sum(dsum * dsum) AS BIGINT) AS sum_d2
      FROM dc
    )
    SELECT s.n_communities, m.m AS n_edges, i.ie AS intra_edges,
           s.sum_d2,
           round(CAST(i.ie AS DOUBLE) / m.m
                 - CAST(s.sum_d2 AS DOUBLE) / (4 * m.m * m.m), 12)
             AS modularity
    FROM summ s CROSS JOIN mm m CROSS JOIN intra i
    """,
)
def graph_modularity_labelprop(spark: SparkSession, sf: str) -> DataFrame:
    """NEWMAN MODULARITY of the min-label-propagation communities
    (3 rounds, the graph_label_propagation partition): Q = Σ_c
    [e_c/m − (d_c/2m)²] — the "did the community detector find real
    structure?" score (Q≈0: random; Q>0.3: strong). Every input is
    an exact integer (intra-edge count via two label joins, Σd_c²
    from one degree aggregate), so Q is two divisions of exact
    integers in a mirrored double expression, round 12. Cost on top
    of propagation: two node-keyed joins + two aggregates."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)  # edges consumed 3×
    comm = gr.label_propagation(e, rounds=3)
    comm = comm.localCheckpoint(eager=False)  # consumed 3×
    m = e.agg(F.count(F.lit(1)).alias("m"))
    ca = comm.select(F.col("node").alias("src"), F.col("lbl").alias("la"))
    cb = comm.select(F.col("node").alias("dst"), F.col("lbl").alias("lb"))
    intra = (
        e.join(ca, on="src")
        .join(cb, on="dst")
        .filter(F.col("la") == F.col("lb"))
        .agg(F.count(F.lit(1)).alias("ie"))
    )
    deg = gr.degrees(e)
    dc = comm.join(deg, on="node").groupBy("lbl").agg(
        F.sum("deg").alias("dsum")
    )
    summ = dc.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum(F.col("dsum") * F.col("dsum")).alias("sum_d2"),
    )
    out = (
        summ.crossJoin(F.broadcast(m)).crossJoin(F.broadcast(intra))
    )
    return out.select(
        "n_communities",
        F.col("m").alias("n_edges"),
        F.col("ie").alias("intra_edges"),
        "sum_d2",
        F.round(
            F.col("ie").cast("double") / F.col("m")
            - F.col("sum_d2").cast("double")
            / (4 * F.col("m") * F.col("m")),
            12,
        ).alias("modularity"),
    )




@query(
    "graph_local_bridges",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS s, dst AS t FROM edges
            UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY s),
    supported AS (
      SELECT DISTINCT e.src, e.dst
      FROM edges e
      JOIN adj a ON a.s = e.src
      JOIN adj b ON b.s = e.dst AND b.t = a.t
    ),
    bridges AS (
      SELECT e.src, e.dst
      FROM edges e
      LEFT JOIN supported s ON s.src = e.src AND s.dst = e.dst
      WHERE s.src IS NULL
    ),
    counts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
             (SELECT CAST(count(*) AS BIGINT) FROM bridges) AS n_bridges
    ),
    top AS (
      SELECT b.src, b.dst, ds.d * dd.d AS deg_product,
             row_number() OVER (ORDER BY ds.d * dd.d DESC, b.src, b.dst)
               AS rank
      FROM bridges b
      JOIN deg ds ON ds.node = b.src
      JOIN deg dd ON dd.node = b.dst
    )
    SELECT t.rank, t.src, t.dst, CAST(t.deg_product AS BIGINT)
             AS deg_product,
           c.n_edges, c.n_bridges,
           round(CAST(c.n_bridges AS DOUBLE) / c.n_edges, 12)
             AS bridge_share
    FROM top t CROSS JOIN counts c
    WHERE t.rank <= 20
    """,
)
def graph_local_bridges(spark: SparkSession, sf: str) -> DataFrame:
    """LOCAL BRIDGES (Easley–Kleinberg): edges whose endpoints share
    NO common neighbor — the weak-tie shortcuts whose removal
    lengthens paths, and exactly the span>2 edges a triangle-based
    spam filter cannot vouch for. Computed as an anti-join of the
    edge list against the wedge-closure support set (the k-truss
    round-1 machinery); the top-20 by endpoint degree product ranks
    the highest-traffic shortcuts (TakeOrdered tail). Counts are
    exact; only the bridge share is float, round 12."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)  # consumed 4×
    adj = e.select(F.col("src").alias("s"), F.col("dst").alias("t")).unionAll(
        e.select(F.col("dst").alias("s"), F.col("src").alias("t"))
    )
    adj = adj.localCheckpoint(eager=False)
    a = adj.select(F.col("s").alias("src"), F.col("t").alias("w"))
    b = adj.select(F.col("s").alias("dst"), F.col("t").alias("w"))
    supported = (
        e.join(a, on="src").join(b, on=["dst", "w"]).select("src", "dst")
        .distinct()
    )
    bridges = e.join(supported, on=["src", "dst"], how="left_anti")
    bridges = bridges.localCheckpoint(eager=False)  # consumed twice
    deg = adj.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    ds = deg.select(F.col("s").alias("src"), F.col("d").alias("sd"))
    dd = deg.select(F.col("s").alias("dst"), F.col("d").alias("dg"))
    counts = (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(
            F.broadcast(bridges.agg(F.count(F.lit(1)).alias("n_bridges")))
        )
    )
    scored = (
        bridges.join(ds, on="src")
        .join(dd, on="dst")
        .select("src", "dst", (F.col("sd") * F.col("dg")).alias("deg_product"))
    )
    top = scored.orderBy(
        F.col("deg_product").desc(), "src", "dst"
    ).limit(20)
    wr = Window.orderBy(F.col("deg_product").desc(), "src", "dst")
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("long"))
        .crossJoin(F.broadcast(counts))
        .select(
            "rank",
            "src",
            "dst",
            F.col("deg_product").cast("long").alias("deg_product"),
            "n_edges",
            "n_bridges",
            F.round(
                F.col("n_bridges").cast("double") / F.col("n_edges"), 12
            ).alias("bridge_share"),
        )
    )




@query(
    "graph_degree_ccdf",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS s FROM edges UNION ALL SELECT dst FROM edges),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY s),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
    buckets AS (
      SELECT CAST(floor(ln(CAST(d AS DOUBLE)) / ln(2.0)) AS BIGINT)
               AS log2_bucket,
             CAST(count(*) AS BIGINT) AS n_in_bucket
      FROM deg GROUP BY 1
    ),
    cum AS (
      SELECT log2_bucket, n_in_bucket,
             sum(n_in_bucket) OVER (
               ORDER BY log2_bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_at_least
      FROM buckets
    )
    SELECT c.log2_bucket, c.n_in_bucket,
           CAST(c.n_at_least AS BIGINT) AS n_at_least,
           round(CAST(c.n_at_least AS DOUBLE) / t.n_nodes, 12) AS ccdf
    FROM cum c CROSS JOIN tot t
    """,
)
def graph_degree_ccdf(spark: SparkSession, sf: str) -> DataFrame:
    """LOG-BINNED DEGREE CCDF of the co-occurrence graph: per
    power-of-two degree bucket, how many nodes sit AT OR ABOVE it —
    the straight-line-on-log-log plot that diagnoses a power-law
    tail (and therefore whether skew remedies like salting are
    needed at all; pairs with stats_hill_tail_estimator, which fits
    the word-frequency tail the same way). Bucket = ⌊log₂ d⌋; the
    descending cumulative runs over the ≤~40-bucket table (tiny
    window by construction); counts exact, CCDF one division,
    round 12."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    deg = gr.degrees(e)
    tot = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    buckets = deg.groupBy(
        F.floor(F.log(F.col("deg").cast("double")) / F.log(F.lit(2.0)))
        .cast("long")
        .alias("log2_bucket")
    ).agg(F.count(F.lit(1)).alias("n_in_bucket"))
    wcum = Window.orderBy(F.col("log2_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )  # ≤ ~40 buckets — the tiny-window exception
    cum = buckets.withColumn(
        "n_at_least", F.sum("n_in_bucket").over(wcum)
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "log2_bucket",
        "n_in_bucket",
        F.col("n_at_least").cast("long").alias("n_at_least"),
        F.round(
            F.col("n_at_least").cast("double") / F.col("n_nodes"), 12
        ).alias("ccdf"),
    )




@query(
    "graph_ego_density_top",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS s, dst AS t FROM edges
            UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY s),
    hubs AS (
      SELECT node, d FROM deg ORDER BY d DESC, node ASC LIMIT 5
    ),
    ego AS (
      SELECT h.node AS hub, h.d, a.t AS nbr
      FROM hubs h JOIN adj a ON a.s = h.node
    ),
    closed AS (
      SELECT e1.hub, CAST(count(*) AS BIGINT) AS intra2
      FROM ego e1
      JOIN ego e2 ON e2.hub = e1.hub
      JOIN adj a ON a.s = e1.nbr AND a.t = e2.nbr
      GROUP BY e1.hub
    )
    SELECT h.node AS hub, h.d AS degree,
           CAST(coalesce(c.intra2, 0) // 2 AS BIGINT) AS intra_edges,
           round(CAST(coalesce(c.intra2, 0) AS DOUBLE)
                 / (h.d * (h.d - 1)), 12) AS ego_density
    FROM hubs h LEFT JOIN closed c ON c.hub = h.node
    """,
)
def graph_ego_density_top(spark: SparkSession, sf: str) -> DataFrame:
    """EGO-NETWORK DENSITY of the 5 highest-degree hubs: what share
    of the possible edges AMONG a hub's neighbors exist — the local
    clustering coefficient of exactly the vertices where
    graph_clustering_global's average hides the story (dense ego =
    tight community around the hub; sparse = a pure broker). Hubs
    pick by TakeOrdered; intra-neighborhood edges count by closing
    neighbor pairs against the adjacency (each edge seen twice —
    exact halving); density = intra2 / d(d−1), round 12. Wedge
    budget is Σ_hub d² over FIVE hubs — bounded."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)
    adj = e.select(F.col("src").alias("s"), F.col("dst").alias("t")).unionAll(
        e.select(F.col("dst").alias("s"), F.col("src").alias("t"))
    )
    adj = adj.localCheckpoint(eager=False)  # consumed 3x
    deg = adj.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    hubs = (
        deg.orderBy(F.col("d").desc(), F.col("s").asc())
        .limit(5)
        .select(F.col("s").alias("hub"), "d")
    )
    ego = hubs.join(
        adj.select(F.col("s").alias("hub"), F.col("t").alias("nbr")),
        on="hub",
    )
    e1 = ego.select("hub", F.col("nbr").alias("n1"))
    e2 = ego.select("hub", F.col("nbr").alias("n2"))
    closed = (
        e1.join(e2, on="hub")
        .join(
            adj.select(F.col("s").alias("n1"), F.col("t").alias("n2")),
            on=["n1", "n2"],
        )
        .groupBy("hub")
        .agg(F.count(F.lit(1)).alias("intra2"))
    )
    return (
        hubs.join(closed, on="hub", how="left")
        .select(
            "hub",
            F.col("d").cast("long").alias("degree"),
            F.expr("coalesce(intra2, 0) div 2").alias("intra_edges"),
            F.round(
                F.coalesce("intra2", F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1)),
                12,
            ).alias("ego_density"),
        )
    )




@query(
    "graph_degree_h_index",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS s FROM edges UNION ALL SELECT dst FROM edges),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY s),
    ranked AS (
      SELECT d, row_number() OVER (ORDER BY d DESC, s ASC) AS rk
      FROM deg
    ),
    h AS (
      SELECT CAST(max(CASE WHEN d >= rk THEN rk ELSE 0 END) AS BIGINT)
               AS h_index
      FROM ranked
    )
    SELECT h.h_index,
           (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(max(d) AS BIGINT) FROM deg) AS max_degree,
           (SELECT CAST(count(*) AS BIGINT) FROM deg, h
             WHERE d >= h.h_index) AS n_at_h
    FROM h
    """,
)
def graph_degree_h_index(spark: SparkSession, sf: str) -> DataFrame:
    """DEGREE H-INDEX of the co-occurrence graph: the largest h with
    ≥ h vertices of degree ≥ h — a one-number upper bound on the
    graph's degeneracy (every k-core needs k vertices of degree ≥ k,
    so core numbers can't exceed it) and therefore a cheap
    feasibility probe before paying for the iterative k-core peel
    (graph_kcore_membership). One degree aggregate + one descending
    rank over the degree table; all integers. The rank window is a
    single ordered pass over |V| degree rows — at extreme scale the
    same h resolves by binary search over degree-histogram
    cumulative counts (graph_degree_ccdf's table) with no per-node
    sort; the census columns (n_nodes, max_degree, n_at_h) are plain
    aggregates."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    deg = gr.degrees(e)
    deg = deg.localCheckpoint(eager=False)  # consumed 3×
    wrk = Window.orderBy(F.col("deg").desc(), F.col("node").asc())
    ranked = deg.select(
        "deg", F.row_number().over(wrk).alias("rk")
    )
    h = ranked.agg(
        F.max(
            F.when(F.col("deg") >= F.col("rk"), F.col("rk")).otherwise(0)
        ).alias("h_index")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("deg").alias("max_degree"),
    )
    out = h.crossJoin(F.broadcast(stats))
    n_at_h = (
        deg.crossJoin(F.broadcast(h))
        .filter(F.col("deg") >= F.col("h_index"))
        .agg(F.count(F.lit(1)).alias("n_at_h"))
    )
    return out.crossJoin(F.broadcast(n_at_h)).select(
        F.col("h_index").cast("long").alias("h_index"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("max_degree").cast("long").alias("max_degree"),
        F.col("n_at_h").cast("long").alias("n_at_h"),
    )




@query(
    "graph_degree_gini",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    ends AS (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges),
    deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM ends GROUP BY n),
    hist AS (
      SELECT d, CAST(count(*) AS BIGINT) AS m FROM deg GROUP BY d
    ),
    blocks AS (
      SELECT d, m,
             CAST(coalesce(sum(m) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prefix
      FROM hist
    ),
    agg_ AS (
      SELECT CAST(sum(m) AS BIGINT) AS n_nodes,
             CAST(sum(d * m) AS BIGINT) AS sum_deg,
             CAST(sum(d * (m * prefix + m * (m + 1) // 2)) AS BIGINT)
               AS rank_weighted
      FROM blocks
    )
    SELECT n_nodes, sum_deg, rank_weighted,
           round(2.0 * rank_weighted
                   / (CAST(n_nodes AS DOUBLE) * sum_deg)
                 - (n_nodes + 1.0) / n_nodes, 12) AS gini
    FROM agg_
    """,
)
def graph_degree_gini(spark: SparkSession, sf: str) -> DataFrame:
    """GINI COEFFICIENT of the degree distribution — the single-number
    inequality summary behind the CCDF/rich-club plots (0 = regular
    graph, →1 = hub-dominated): G = 2·Σᵢ i·dᵢ/(n·Σd) − (n+1)/n over
    ascending-sorted degrees. The rank-weighted sum is computed WITHOUT
    a global row sort via the counting-sort device: degrees are
    histogram-bounded, and a tie block of m nodes at degree d starting
    after `prefix` smaller nodes contributes d·(m·prefix + m(m+1)/2)
    regardless of intra-block order — so the only window runs over the
    degree histogram (domain-bounded), everything else is exact-BIGINT
    map-combinable aggregation."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    deg = gr.degrees(e).select(F.col("deg").cast("long").alias("d"))
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("m"))
    wpre = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = hist.select(
        "d",
        "m",
        F.coalesce(F.sum("m").over(wpre), F.lit(0))
        .cast("long")
        .alias("prefix"),
    )
    agg_ = blocks.agg(
        F.sum("m").cast("long").alias("n_nodes"),
        F.sum(F.col("d") * F.col("m")).cast("long").alias("sum_deg"),
        F.sum(
            F.col("d")
            * (
                F.col("m") * F.col("prefix")
                + F.expr("m * (m + 1) div 2")
            )
        )
        .cast("long")
        .alias("rank_weighted"),
    )
    gini = F.lit(2.0) * F.col("rank_weighted") / (
        F.col("n_nodes").cast("double") * F.col("sum_deg")
    ) - (F.col("n_nodes") + F.lit(1.0)) / F.col("n_nodes")
    return agg_.select(
        "n_nodes",
        "sum_deg",
        "rank_weighted",
        F.round(gini, 12).alias("gini"),
    )




@query(
    "graph_harmonic_2hop",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges),
    two AS (
      SELECT DISTINCT x.a AS node, y.b AS nb
      FROM adj x JOIN adj y ON x.b = y.a
      WHERE y.b <> x.a
    ),
    d1 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS n1
           FROM adj GROUP BY a),
    d2 AS (
      SELECT t.node, CAST(count(*) AS BIGINT) AS n2
      FROM two t
      WHERE NOT EXISTS (SELECT 1 FROM adj
                        WHERE adj.a = t.node AND adj.b = t.nb)
      GROUP BY t.node
    )
    SELECT d1.node, d1.n1, CAST(coalesce(d2.n2, 0) AS BIGINT) AS n2,
           CAST(6 * d1.n1 + 3 * coalesce(d2.n2, 0) AS BIGINT)
             AS harmonic_sixths
    FROM d1 LEFT JOIN d2 ON d1.node = d2.node
    """,
)
def graph_harmonic_2hop(spark: SparkSession, sf: str) -> DataFrame:
    """2-HOP TRUNCATED HARMONIC CENTRALITY: per node, n₁ + n₂/2 where
    n₁ = neighbors and n₂ = nodes at exactly distance 2 — the
    locality-bounded centrality that (unlike closeness) needs no
    all-pairs BFS. Carried as exact integer SIXTHS (6n₁ + 3n₂) so no
    float leaves either engine. The 2-hop set is one adjacency
    self-join + distinct + direct-edge anti-join — the
    common-neighbors shape, O(Σ deg²) candidate pairs; at corpus
    scale the standard cap is degree-bounding the hub side first
    (same remedy the triangle/butterfly counts pin in
    test_scale_plans)."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    adj = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = adj.localCheckpoint(eager=False)  # consumed 4×
    x = adj.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    y = adj.select(F.col("src").alias("mid"), F.col("dst").alias("nb"))
    two = (
        x.join(y, "mid")
        .filter(F.col("nb") != F.col("node"))
        .select("node", "nb")
        .distinct()
    )
    d1 = adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n1")
    )
    direct = adj.select(
        F.col("src").alias("node"), F.col("dst").alias("nb")
    )
    d2 = (
        two.join(direct, ["node", "nb"], "left_anti")
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    return (
        d1.join(d2, "node", "left")
        .select(
            "node",
            "n1",
            F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
            (
                F.lit(6) * F.col("n1")
                + F.lit(3) * F.coalesce("n2", F.lit(0))
            )
            .cast("long")
            .alias("harmonic_sixths"),
        )
    )




@query(
    "graph_avg_neighbor_degree",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY a)
    SELECT da.d AS degree_class,
           CAST(count(DISTINCT adj.a) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_edge_ends,
           CAST(sum(db.d) AS BIGINT) AS sum_neighbor_deg,
           round(CAST(sum(db.d) AS DOUBLE) / count(*), 12)
             AS knn_k
    FROM adj
    JOIN deg da ON adj.a = da.node
    JOIN deg db ON adj.b = db.node
    GROUP BY da.d
    """,
)
def graph_avg_neighbor_degree(spark: SparkSession, sf: str) -> DataFrame:
    """AVERAGE NEIGHBOR DEGREE curve knn(k) — for each degree class
    k, the mean degree of the neighbors of degree-k nodes: the full
    assortativity PROFILE (rising = assortative core, falling =
    disassortative hub-periphery) that the single
    graph_degree_assortativity coefficient summarizes. One degree
    table joined onto both edge endpoints, grouped by the source's
    degree class — exact BIGINT sums, one mirrored division per
    class; degree-histogram-bounded output."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    adj = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = adj.localCheckpoint(eager=False)  # feeds deg + the join
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    deg = deg.localCheckpoint(eager=False)  # joined twice
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("dda"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("ddb"))
    return (
        adj.withColumnRenamed("src", "a")
        .withColumnRenamed("dst", "b")
        .join(da, "a")
        .join(db, "b")
        .groupBy(F.col("dda").alias("degree_class"))
        .agg(
            F.countDistinct("a").cast("long").alias("n_nodes"),
            F.count(F.lit(1)).cast("long").alias("n_edge_ends"),
            F.sum("ddb").cast("long").alias("sum_neighbor_deg"),
            F.round(
                F.sum("ddb").cast("double") / F.count(F.lit(1)), 12
            ).alias("knn_k"),
        )
    )




@query(
    "graph_fof_recommendations",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges),
    cand AS (
      SELECT x.a AS node, y.b AS rec,
             CAST(count(*) AS BIGINT) AS common
      FROM adj x JOIN adj y ON x.b = y.a
      WHERE y.b <> x.a
        AND NOT EXISTS (SELECT 1 FROM adj
                        WHERE adj.a = x.a AND adj.b = y.b)
      GROUP BY x.a, y.b
    ),
    ranked AS (
      SELECT node, rec, common,
             row_number() OVER (PARTITION BY node
                                ORDER BY common DESC, rec) AS rk
      FROM cand
    )
    SELECT node, rec, common, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def graph_fof_recommendations(spark: SparkSession, sf: str) -> DataFrame:
    """FRIEND-OF-FRIEND link recommendations: for every node, the
    top-3 non-neighbors ranked by common-neighbor count (full
    (count desc, id) tiebreak) — the production form of the
    common-neighbors link predictor (graph_common_neighbors scores
    pairs; this turns the scores into per-node recommendation lists
    with the direct-edge anti-join applied). Candidate generation is
    the 2-hop self-join (degree-bound the hub side at scale, same
    remedy as the triangle path); the per-node top-3 is a bounded
    rank window."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    adj = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = adj.localCheckpoint(eager=False)  # 3 consumers
    x = adj.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    y = adj.select(F.col("src").alias("mid"), F.col("dst").alias("rec"))
    direct = adj.select(
        F.col("src").alias("node"), F.col("dst").alias("rec")
    )
    cand = (
        x.join(y, "mid")
        .filter(F.col("rec") != F.col("node"))
        .join(direct, ["node", "rec"], "left_anti")
        .groupBy("node", "rec")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    wr = Window.partitionBy("node").orderBy(
        F.col("common").desc(), F.col("rec")
    )
    return (
        cand.select(
            "node",
            "rec",
            "common",
            F.row_number().over(wr).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )




@query(
    "graph_triangle_participation",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    per AS (
      SELECT node, CAST(count(*) AS BIGINT) AS tri_count
      FROM corners GROUP BY node
    ),
    nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ),
    full_ AS (
      SELECT n.node, CAST(coalesce(p.tri_count, 0) AS BIGINT)
               AS tri_count
      FROM nodes n LEFT JOIN per p ON n.node = p.node
    )
    SELECT tri_count, CAST(count(*) AS BIGINT) AS n_nodes
    FROM full_ GROUP BY tri_count
    """,
)
def graph_triangle_participation(
    spark: SparkSession, sf: str
) -> DataFrame:
    """TRIANGLE PARTICIPATION histogram: how many nodes sit in 0, 1,
    2, … triangles — the local-cohesion distribution behind the
    single global triangle count (a high zero-bucket with a fat tail
    = hub-and-spoke; uniform participation = community lattice; also
    the support histogram k-truss peeling consumes). Triangles
    enumerate once through the ordered (a<b<c) edge join — the same
    degree-bounded join shape as graph_triangle_count — then three
    corner projections, one groupBy, and a zero-fill against the
    node set."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)  # 3 join legs + node set
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    per = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("tri_count")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        nodes.join(per, "node", "left")
        .select(
            F.coalesce("tri_count", F.lit(0))
            .cast("long")
            .alias("tri_count")
        )
        .groupBy("tri_count")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )




@query(
    "graph_edge_embeddedness",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    adj AS (SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges),
    emb AS (
      SELECT e.src, e.dst, CAST(count(*) AS BIGINT) AS common
      FROM edges e
      JOIN adj x ON x.a = e.src
      JOIN adj y ON y.a = e.dst AND y.b = x.b
      GROUP BY e.src, e.dst
    ),
    full_ AS (
      SELECT e.src, e.dst, CAST(coalesce(m.common, 0) AS BIGINT)
               AS embeddedness
      FROM edges e LEFT JOIN emb m
        ON e.src = m.src AND e.dst = m.dst
    )
    SELECT embeddedness, CAST(count(*) AS BIGINT) AS n_edges
    FROM full_ GROUP BY embeddedness
    """,
)
def graph_edge_embeddedness(spark: SparkSession, sf: str) -> DataFrame:
    """EDGE EMBEDDEDNESS histogram — per edge, how many common
    neighbors its endpoints share (Granovetter's strong-tie measure:
    embeddedness 0 = a LOCAL BRIDGE carrying novel information, high
    = redundant intra-community tie). The distribution separates
    community-dense graphs from tree-like ones and prices how much
    triangle-based dedup/trust logic will find. Per-edge common
    neighbors is the triangle join restricted to existing edges, with
    a zero-fill left join so bridges are counted — the same
    degree-bounded 2-hop shape as the triangle family."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    e = e.localCheckpoint(eager=False)  # join legs + zero-fill
    adj = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    x = adj.select(F.col("src").alias("a"), F.col("dst").alias("w1"))
    y = adj.select(F.col("src").alias("b"), F.col("dst").alias("w2"))
    emb = (
        e.join(x, e.src == x.a)
        .join(y, (e.dst == y.b) & (F.col("w1") == F.col("w2")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    return (
        e.join(emb, ["src", "dst"], "left")
        .select(
            F.coalesce("common", F.lit(0))
            .cast("long")
            .alias("embeddedness")
        )
        .groupBy("embeddedness")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )




@query(
    "graph_brand_assortativity",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    lbl AS (SELECT p_partkey AS node, p_brand AS brand FROM part),
    le AS (
      SELECT ba.brand AS brand_a, bb.brand AS brand_b
      FROM edges e
      JOIN lbl ba ON e.src = ba.node
      JOIN lbl bb ON e.dst = bb.node
    ),
    m_ AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CASE WHEN brand_a = brand_b THEN 1 ELSE 0 END)
               AS BIGINT) AS trace_cnt
      FROM le
    ),
    ends AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS k FROM (
        SELECT brand_a AS brand FROM le
        UNION ALL SELECT brand_b FROM le
      ) GROUP BY brand
    ),
    sq AS (SELECT CAST(sum(k * k) AS BIGINT) AS sum_ends_sq FROM ends)
    SELECT m_.m, m_.trace_cnt, sq.sum_ends_sq,
           CAST(4 * m_.m * m_.trace_cnt - sq.sum_ends_sq AS BIGINT)
             AS r_num,
           CAST(4 * m_.m * m_.m - sq.sum_ends_sq AS BIGINT) AS r_den,
           round(CAST(4 * m_.m * m_.trace_cnt - sq.sum_ends_sq
                   AS DOUBLE)
                 / (4 * m_.m * m_.m - sq.sum_ends_sq), 12)
             AS assortativity
    FROM m_ CROSS JOIN sq
    """,
)
def graph_brand_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """CATEGORICAL (attribute) ASSORTATIVITY of the co-occurrence
    graph by part brand — Newman's mixing coefficient r = (tr(e) −
    Σaᵢ²)/(1 − Σaᵢ²): do parts co-occur within brands (+) or across
    them (−)? The degree-assortativity op answers the structural
    question; this answers the METADATA one (the homophily check
    behind 'should brand be a blocking key'). Carried as an exact
    integer numerator/denominator pair (4m·trace − Σends² over 4m² −
    Σends²; algebraically identical) plus one mirrored ratio. Brand
    labels broadcast onto both endpoints, two map-combinable
    aggregates."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    lbl = load(spark, sf, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("brand")
    )
    le = (
        e.join(
            F.broadcast(lbl.withColumnRenamed("brand", "brand_a")),
            e.src == F.col("node"),
        )
        .drop("node")
        .join(
            F.broadcast(lbl.withColumnRenamed("brand", "brand_b")),
            e.dst == F.col("node"),
        )
        .select("brand_a", "brand_b")
    )
    le = le.localCheckpoint(eager=False)  # m + ends
    m_ = le.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(
            F.when(F.col("brand_a") == F.col("brand_b"), 1).otherwise(0)
        )
        .cast("long")
        .alias("trace_cnt"),
    )
    ends = (
        le.select(F.col("brand_a").alias("brand"))
        .unionAll(le.select(F.col("brand_b").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    sq = ends.agg(
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sum_ends_sq")
    )
    j = m_.crossJoin(F.broadcast(sq))
    num = 4 * F.col("m") * F.col("trace_cnt") - F.col("sum_ends_sq")
    den = 4 * F.col("m") * F.col("m") - F.col("sum_ends_sq")
    return j.select(
        "m",
        "trace_cnt",
        "sum_ends_sq",
        num.cast("long").alias("r_num"),
        den.cast("long").alias("r_den"),
        F.round(num.cast("double") / den, 12).alias("assortativity"),
    )




@query(
    "graph_path_census",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY node
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    wed AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg
    ),
    ecnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges),
    pth AS (
      SELECT CAST(sum((da.d - 1) * (db.d - 1)) AS BIGINT) AS raw_p3
      FROM edges e
      JOIN deg da ON da.node = e.src
      JOIN deg db ON db.node = e.dst
    )
    SELECT wed.n_nodes, ecnt.n_edges, wed.n_wedges AS n_paths2,
           tri.n_triangles,
           pth.raw_p3 - 3 * tri.n_triangles AS n_paths3,
           round(CAST(3 * tri.n_triangles AS DOUBLE) / wed.n_wedges, 9)
             AS transitivity
    FROM wed, ecnt, tri, pth
    """,
)
def graph_path_census(spark: SparkSession, sf: str) -> DataFrame:
    """GRAPHLET PATH CENSUS — exact counts of 2-paths (wedges,
    Σd(d−1)/2), 3-paths (Σ_{(u,v)∈E}(dᵤ−1)(dᵥ−1) − 3·triangles, the
    closed-form that needs NO 4-node enumeration), and triangles,
    plus transitivity: the cheapest graphlet signature used for
    graph-similarity fingerprinting and null-model comparison. All
    counts are pure degree/edge aggregates + the degree-oriented
    triangle counter — one degree join on the edge list, no path
    materialization, so the census scales with E, not with the path
    counts themselves (which grow superlinearly)."""
    # pinned: triangle counter, degree census and the 3-path edge
    # aggregate all consume e
    e = gr.undirected_edges(_cooccur_edges(spark, sf)).localCheckpoint(
        eager=False
    )
    tri = gr.triangle_count(e).select(
        "n_nodes", "n_edges", "n_triangles"
    )
    deg = gr.degrees(e)
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("n_wedges")
    )
    half = e.filter(F.col("src") < F.col("dst"))
    da = deg.select(F.col("node").alias("src"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("deg").alias("db"))
    p3 = (
        half.join(da, "src")
        .join(db, "dst")
        .agg(
            F.sum((F.col("da") - 1) * (F.col("db") - 1)).alias("raw_p3")
        )
    )
    return (
        tri.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(p3))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_wedges").alias("n_paths2"),
            "n_triangles",
            (F.col("raw_p3") - 3 * F.col("n_triangles"))
            .cast("long")
            .alias("n_paths3"),
            F.round(
                (3 * F.col("n_triangles")).cast("double")
                / F.col("n_wedges"),
                9,
            ).alias("transitivity"),
        )
    )




@query(
    "graph_clustering_by_degree",
    oracle=f"""
    WITH {_COOCCUR_EDGES_SQL},
    und AS (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS d
      FROM und GROUP BY src
    ),
    tri AS (
      SELECT a.src AS node, CAST(count(*) AS BIGINT) AS t2
      FROM und a JOIN und b ON b.src = a.dst
      JOIN und c ON c.src = b.dst AND c.dst = a.src
      GROUP BY a.src
    ),
    loc AS (
      SELECT d.node, d.d,
             length(bin(d.d)) AS deg_bucket,
             coalesce(t.t2, 0) AS t2
      FROM deg d LEFT JOIN tri t ON t.node = d.node
      WHERE d.d >= 2
    ),
    terms AS (
      SELECT deg_bucket,
             round(CAST(t2 AS DOUBLE) / (CAST(d AS DOUBLE) * (d - 1)),
                   12) AS c_i
      FROM loc
    )
    SELECT CAST(deg_bucket AS BIGINT) AS deg_bucket,
           CAST(power(2, deg_bucket - 1) AS BIGINT) AS bucket_low_degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(list_reduce(list_sort(list(c_i)), (x, y) -> x + y)
                 / count(*), 9) AS mean_local_clustering
    FROM terms GROUP BY deg_bucket
    """,
)
def graph_clustering_by_degree(
    spark: SparkSession, sf: str
) -> DataFrame:
    """CLUSTERING-BY-DEGREE PROFILE c(k) — mean local clustering
    coefficient per log₂ degree bucket: a falling c(k) ∝ 1/k is the
    hierarchical-modularity fingerprint (Ravasz–Barabási), flat c(k)
    says the graph is degree-mixed — the structural readout the
    global transitivity number averages away. Per-node triangle
    participation comes from the directed triple join (each triangle
    counted 2× per member node — t₂/(d(d−1)) IS the local
    coefficient); buckets use the exact binary-digit device; the
    per-node cᵢ terms pre-round at 12 and fold SORTED per bucket,
    round 9."""
    e = gr.undirected_edges(_cooccur_edges(spark, sf))
    # canonical (src < dst) pairs — symmetrize for the directed
    # triple join (the oracle's UNION ALL twin)
    und = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = gr.degrees(e).filter(F.col("deg") >= 2)
    a = und.select(F.col("src").alias("node"), F.col("dst").alias("m1"))
    b = und.select(F.col("src").alias("m1"), F.col("dst").alias("m2"))
    c = und.select(F.col("src").alias("m2"), F.col("dst").alias("node"))
    tri = (
        a.join(b, "m1")
        .join(c, ["m2", "node"])
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t2"))
    )
    loc = deg.join(tri, deg.node == tri.node, "left").select(
        deg.node,
        F.col("deg").alias("d"),
        F.length(F.conv(F.col("deg").cast("string"), 10, 2)).alias(
            "deg_bucket"
        ),
        F.coalesce("t2", F.lit(0)).alias("t2"),
    )
    c_i = F.round(
        F.col("t2").cast("double")
        / (F.col("d").cast("double") * (F.col("d") - 1)),
        12,
    )
    terms = loc.select("deg_bucket", c_i.alias("c_i"))
    return terms.groupBy("deg_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("c_i")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.count(F.lit(1)),
            9,
        ).alias("mean_local_clustering"),
    ).select(
        F.col("deg_bucket").cast("long").alias("deg_bucket"),
        F.pow(F.lit(2), F.col("deg_bucket") - 1)
        .cast("long")
        .alias("bucket_low_degree"),
        "n_nodes",
        "mean_local_clustering",
    )


__all__ = sorted(n for n in dir() if not n.startswith("__"))
