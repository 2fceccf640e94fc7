"""Distributed graph operators over edge-list DataFrames.

The reference has no graph engine; these are the graph-shaped steps a
training-data pipeline runs on top of pairwise outputs this repo
already produces (near-dup pairs → components in dedup.py, co-occurrence
edges → triangles / PageRank here).

Design for 100 TB:

- Triangle counting uses the standard degree orientation (count each
  triangle once from its lowest-degree vertex): wedge generation is an
  equi-join on the wedge apex and wedge *closure* is an equi-join on
  the (v, w) edge key — never an all-pairs join. Wedge fan-out is
  bounded by Σ out_deg(u)², and orienting by degree provably minimizes
  that bound (arboricity bound, O(m^{3/2}) worst case).
- PageRank is the classic join-aggregate iteration: contributions
  shuffle once per round on dst; out-degrees are computed once. A
  fixed iteration count keeps the plan finite; callers that iterate to
  convergence should localCheckpoint per round (see
  dedup.connected_components for the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pin(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint for an input consumed by several branches
    (or every round of an iterative loop). Edge lists here are usually
    themselves join-derived (e.g. the lineitem co-occurrence self-join),
    so without a pin each branch re-executes that whole derivation —
    measured 2-6 full re-derivations per graph query at sf0.1 (r14).
    RDD blocks are shared across all consuming stages of a job, and the
    truncated lineage also keeps iterative plans (and their AQE
    re-optimization time) from growing per round."""
    return df.localCheckpoint(eager=False)


def undirected_edges(pairs: DataFrame, a: str = "src", b: str = "dst") -> DataFrame:
    """Canonicalize an edge list: distinct undirected edges (src < dst),
    self-loops dropped."""
    lo = F.least(F.col(a), F.col(b))
    hi = F.greatest(F.col(a), F.col(b))
    return (
        pairs.select(lo.alias("src"), hi.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from canonical undirected edges."""
    return (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from the (deg, id)-smaller endpoint
    to the larger; carries both endpoints' (deg, id) rank keys so
    downstream joins can compare ranks without re-joining degrees."""
    deg = degrees(edges)
    e = (
        edges.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("dsrc")), on="src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddst")), on="dst")
    )
    src_first = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, F.col("dsrc")).otherwise(F.col("ddst")).alias("du"),
        F.when(src_first, F.col("ddst")).otherwise(F.col("dsrc")).alias("dv"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """One-row (n_nodes, n_edges, n_triangles) for a canonical
    undirected edge list.

    Degree-oriented wedge counting: every triangle, under the total
    order (deg, id), has exactly one vertex with two outgoing oriented
    edges — generate wedges (v, w) from that apex (equi-join on u,
    rank(v) < rank(w)), then close them against the oriented edge set
    (equi-join on (v, w)). Each triangle is counted exactly once.
    """
    edges = _pin(edges)  # feeds orientation, degrees, closure, counts
    o = _pin(_oriented(edges))  # wedge sides + closure probe
    lhs = o.select(
        F.col("u").alias("_a"), F.col("v").alias("_v"),
        F.col("dv").alias("_dv"),
    )
    rhs = o.select(
        F.col("u").alias("_a"), F.col("v").alias("_w"),
        F.col("dv").alias("_dw"),
    )
    rank_lt = (F.col("_dv") < F.col("_dw")) | (
        (F.col("_dv") == F.col("_dw")) & (F.col("_v") < F.col("_w"))
    )
    wedges = lhs.join(rhs, on="_a").filter(rank_lt).select(
        F.col("_v").alias("u"), F.col("_w").alias("v")
    )
    closed = wedges.join(o.select("u", "v"), on=["u", "v"], how="inner")
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    nn = degrees(edges).agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nn.crossJoin(ne).crossJoin(tri)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    deterministic: bool = False,
) -> DataFrame:
    """PageRank over the undirected edge list (each edge walks both
    ways), fixed iteration count, uniform 1/n start.

    Returns (node, pr) with pr as raw float64. One shuffle per round
    (contributions aggregate on dst); out-degrees computed once and
    reused. No dangling-node term: an undirected graph has none.

    ``deterministic=True`` replaces the order-dependent float ``SUM``
    with a sorted left-to-right fold (collect → array_sort →
    aggregate), making pr bit-reproducible across partitionings and
    engines — the oracle-parity mode. The default SUM mode is the
    scale mode: partial aggregation map-side, no per-node value lists.
    """
    d = _pin(
        edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    deg = d.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # attach outdeg to the edge list ONCE, outside the loop: every
    # round then joins pr only, instead of re-joining deg per round
    dd = _pin(d.join(deg, on="src"))
    # node count rides along as a broadcast one-row crossJoin — the
    # whole plan stays lazy (no eager .count() job at construction)
    nn = deg.agg(F.count(F.lit(1)).alias("_n"))
    n_col = F.col("_n").cast("double")
    base = F.lit(1.0 - damping) / n_col
    pr = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"),
        (F.lit(1.0) / n_col).alias("pr"),
        "_n",
    )
    for _ in range(iterations):
        contrib = (
            dd.join(pr, dd.src == pr.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
                "_n",
            )
        )
        if deterministic:
            s = F.aggregate(
                F.array_sort(F.collect_list("c")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        else:
            s = F.sum("c")
        # _n is constant — grouping on it just keeps it in scope
        pr = contrib.groupBy("node", "_n").agg(
            (base + F.lit(damping) * s).alias("pr")
        )
    return pr.select("node", "pr")


def kcore(
    edges: DataFrame,
    k: int,
    max_iterations: int = 8,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph in which
    every node has degree ≥ k, as ``(node, core_deg)`` (core_deg = the
    node's degree WITHIN the k-core). Standard peeling fixpoint:
    repeatedly drop nodes with current degree < k and the edges that
    touch them, until stable.

    Each round is two shuffles on the surviving edge set (degree
    groupBy + the keep semi-joins); the edge set only shrinks, so
    round cost is monotonically non-increasing — the 100 TB shape of
    every distributed k-core (Quick et al. 2012 style). The frontier
    is ``localCheckpoint``'ed per round: the surviving set feeds three
    consumers per round (degree count + two joins), so an uncut
    lineage re-expands exponentially exactly as in
    dedup.connected_components.

    A FIXED ``max_iterations`` keeps the op deterministic and lets an
    unrolled SQL twin replay it; peeling converges in ≤ diameter-ish
    rounds on sparse graphs (callers/tests should assert one extra
    round is a no-op — see tests/test_graph_kcore.py)."""
    cur = edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iterations):
        deg = degrees(cur)
        keep = deg.filter(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "src"), on="src")
            .join(keep.withColumnRenamed("node", "dst"), on="dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        cur = nxt
    return (
        degrees(cur)
        .filter(F.col("deg") >= k)
        .select("node", F.col("deg").cast("long").alias("core_deg"))
    )


def common_neighbors(
    edges: DataFrame, k: int = 20, min_common: int = 2
) -> DataFrame:
    """Link-prediction candidates (the common-neighbors score of
    Liben-Nowell & Kleinberg 2003): for every NON-adjacent vertex pair
    sharing at least ``min_common`` neighbors, the shared-neighbor
    count; returns the global top-``k`` as
    ``(rank, a, b, n_common)`` ordered (count DESC, a ASC, b ASC).

    Scale shape: wedges are generated by one self-equi-join of the
    adjacency list on the APEX key — fan-out Σ deg(n)², the same
    budget degree-oriented triangle counting pays, and the same hub
    remedies apply (cap or sample apex neighborhoods before the join).
    Existing edges are removed with a key anti-join, the pair count is
    one map-combinable groupBy, and the global top-k is orderBy+limit
    (k rows to the driver-side sort, never the candidate set)."""
    edges = _pin(edges)  # adjacency (×2) + existing-edge anti-join
    adj = _pin(
        edges.select(F.col("src").alias("n"), F.col("dst").alias("x")).unionAll(
            edges.select(F.col("dst").alias("n"), F.col("src").alias("x"))
        )
    )
    left = adj.select("n", F.col("x").alias("a"))
    # fresh attribute ids (no-op exprs) — self-join disambiguation
    right = adj.select(
        (F.col("n") + F.lit(0)).alias("n"), F.coalesce(F.col("x")).alias("b")
    )
    cand = (
        left.join(right, on="n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            on=["a", "b"],
            how="left_anti",
        )
    )
    top = cand.orderBy(
        F.col("n_common").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_common").desc(), F.col("a"), F.col("b"))
    return top.select(
        F.row_number().over(w).alias("rank"), "a", "b", "n_common"
    )


def adamic_adar(
    edges: DataFrame, k: int = 20, min_common: int = 2
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): for every
    non-adjacent pair, sum 1/ln(deg(z)) over shared neighbors z — a
    rare shared neighbor is worth more than a hub. Returns the global
    top-``k`` as ``(rank, a, b, n_common, aa_score)``.

    Same wedge-join budget as :func:`common_neighbors` (Σ deg(n)² on
    the apex key); the only additions are a degree equi-join to attach
    the apex weight before the wedge fan-out and a sorted float fold
    (array_sort + sequential aggregate) so the per-pair sum is
    order-independent across engines. ln() is the one op platforms
    round differently (≤1 ulp each), so the score rounds to 12
    decimals — the entropy/PSI discipline. Apex degree ≥ 2 by
    construction (it has two distinct neighbors), so ln(d) > 0."""
    edges = _pin(edges)  # adjacency (×2) + existing-edge anti-join
    adj = _pin(
        edges.select(F.col("src").alias("n"), F.col("dst").alias("x")).unionAll(
            edges.select(F.col("dst").alias("n"), F.col("src").alias("x"))
        )
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    # pin (n, x, d) and derive w behind a d>=2 guard: the pin barrier
    # stops the optimizer from deferring the projection past the a<b
    # wedge filter, so an unguarded 1/ln(d) would now be EVALUATED for
    # degree-1 apexes too and trip ANSI divide-by-zero (ln(1)=0).
    # Degree-1 apex rows never survive the a<b filter (their only
    # wedge is (x, x)), so the guard's NULL arm is unreachable in the
    # output and every surviving w is bit-identical to before.
    wadj = _pin(adj.join(deg, on="n").select("n", "x", "d"))
    wexpr = F.when(
        F.col("d") >= 2, F.lit(1.0) / F.log(F.col("d").cast("double"))
    ).alias("w")
    left = wadj.select("n", F.col("x").alias("a"), wexpr)
    # fresh attribute ids (no-op exprs) — self-join disambiguation
    right = wadj.select(
        (F.col("n") + F.lit(0)).alias("n"), F.coalesce(F.col("x")).alias("b")
    )
    cand = (
        left.join(right, on="n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("w")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                12,
            ).alias("aa_score"),
        )
        .filter(F.col("n_common") >= min_common)
        .join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            on=["a", "b"],
            how="left_anti",
        )
    )
    top = cand.orderBy(
        F.col("aa_score").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(k)
    w = Window.orderBy(F.col("aa_score").desc(), F.col("a"), F.col("b"))
    return top.select(
        F.row_number().over(w).alias("rank"), "a", "b", "n_common", "aa_score"
    )


def bfs_khop(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 4
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed node,
    truncated at ``max_hops``. ``seeds`` is a one-column (node)
    DataFrame; returns ``(node, dist)`` for every node reached within
    the budget (seeds at dist 0).

    Frontier-expansion shape — the 100 TB form of distributed BFS
    (Pregel without the framework): each round is ONE equi-join of the
    current frontier against the adjacency list plus one anti-join
    against the visited set, so round cost is O(frontier out-edges),
    never O(graph). Each round's NEW frontier is
    ``localCheckpoint(eager=False)``'ed; ``visited`` itself is a plain
    union of those pinned frontiers — re-pinning the union would pay
    one extra materialization of the growing set per hop for blocks
    that are already resident (r15, the closeness lesson). ``adj`` is
    pinned once: edge lists here are join-derived and every round
    consumes them. A fixed hop budget keeps the op deterministic and
    lets an unrolled SQL twin replay it round by round."""
    adj = _pin(
        edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    visited = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=False)
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("node", "src"), on="src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), on="node", how="left_anti")
            .select("node", F.lit(h).alias("dist"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt.select("node")
    return visited.select("node", F.col("dist").cast("int").alias("dist"))


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous min-label propagation: every node starts labelled
    with its own id; each round every node takes the minimum of its own
    label and its neighbors' labels. After a FIXED number of rounds the
    labels partition the graph into proto-communities (and converge to
    connected components as rounds → diameter).

    Same frontier economics as :func:`bfs_khop`: one groupBy(node) per
    round over self ∪ neighbor label candidates — partial aggregation
    (min) combines map-side, so the shuffle carries one row per
    (node, distinct label) not per edge. Synchronous + min makes the
    result order-independent, hence bit-stable across partitionings and
    replayable by an unrolled SQL twin. Per-round lazy localCheckpoint
    keeps the iterated plan linear; ``adj`` is pinned once because the
    join-derived edge list is consumed by every round (r15, the
    closeness-query device)."""
    adj = _pin(
        edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    nodes = adj.select(F.col("src").alias("node")).distinct()
    lab = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint(
        eager=False
    )
    for _ in range(rounds):
        neigh = adj.join(
            lab.withColumnRenamed("node", "dst"), on="dst"
        ).select(F.col("src").alias("node"), "lbl")
        lab = (
            lab.unionAll(neigh)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return lab.select("node", "lbl")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    deterministic: bool = False,
) -> DataFrame:
    """PERSONALIZED PageRank (random walk with restart to the seed
    set): teleportation mass (1−d) returns to the seeds instead of
    spreading uniformly, so scores measure proximity-weighted
    relevance TO the seeds — the recommendation / local-community
    primitive (Jeh & Widom 2003). Start = 1/|S| on seeds; per round
    r(v) = 1_S(v)·(1−d)/|S| + d·Σ_{u→v} r(u)/deg(u) over ALL nodes
    (missing contributions coalesce to 0, so unreached nodes carry
    exact 0.0 and stay comparable across engines).

    Same per-round economics as :func:`pagerank` — one shuffle on the
    contribution aggregate; ``deterministic=True`` folds each node's
    contributions smallest-first for bit-reproducibility (the oracle
    mode), default SUM is the map-side-combinable scale mode."""
    d = _pin(
        edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    deg = d.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # attach outdeg to the edge list ONCE (the per-round deg join moved
    # out of the loop, same as pagerank)
    dd = _pin(d.join(deg, on="src"))
    nodes = deg.select(F.col("src").alias("node"))
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).join(
        nodes, on="node"
    )
    ns = s.agg(F.count(F.lit(1)).alias("_ns"))
    base_tbl = nodes.join(
        s.select("node", F.lit(1).alias("_is_seed")), on="node", how="left"
    ).crossJoin(F.broadcast(ns)).select(
        "node",
        F.when(
            F.col("_is_seed").isNotNull(),
            F.lit(1.0 - damping) / F.col("_ns").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("base"),
        F.when(
            F.col("_is_seed").isNotNull(),
            F.lit(1.0) / F.col("_ns").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("p0"),
    )
    # base_tbl is consumed every round (and seeds/deg feed it through
    # joins) — one lazy checkpoint cuts that re-expansion; pr itself
    # has a LINEAR lineage (each round consumes it exactly once), so
    # per-round checkpoints would only add materialization cost
    base_tbl = base_tbl.localCheckpoint(eager=False)
    pr = base_tbl.select("node", F.col("p0").alias("pr"))
    for _ in range(iterations):
        contrib = (
            dd.join(pr, dd.src == pr.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
        )
        if deterministic:
            fold = F.aggregate(
                F.array_sort(F.collect_list("c")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        else:
            fold = F.sum("c")
        agg = contrib.groupBy("node").agg(fold.alias("_s"))
        pr = (
            base_tbl.select("node", "base")
            .join(agg, on="node", how="left")
            .select(
                "node",
                (
                    F.col("base")
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr


def hits(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    list, UNNORMALIZED with an all-ones start — which makes every
    iterate an exact integer: h⁰=1, aᵏ(v)=Σ_{u→v} hᵏ⁻¹(u),
    hᵏ(u)=Σ_{u→v} aᵏ(v) are alternating neighbor-path counts, so the
    whole fixpoint is BIGINT arithmetic (no float fold discipline
    needed — normalization only rescales, the ranking is identical).
    Callers normalize by the max at the end if they want scores.

    Returns (node, hub, auth) with exact BIGINT scores; nodes that
    only appear on one side carry 0 on the other role.

    100 TB shape: each half-round is one equi-join of the edge list
    against the current score vector plus a map-side-combinable
    integer SUM on the other endpoint — the same per-round economics
    as :func:`pagerank`, and integer partials never lose associativity.
    Values grow like (σ₁)²ᵏ, so keep ``rounds`` small (2-3) or switch
    to floats past ~4 rounds on dense graphs."""
    if rounds < 1:
        raise ValueError(f"hits() needs rounds >= 1 (got {rounds})")
    d = edges.select("src", "dst").distinct()
    d = d.localCheckpoint(eager=False)  # consumed twice per round
    srcs = d.select(F.col("src").alias("node")).distinct()
    dsts = d.select(F.col("dst").alias("node")).distinct()
    h = srcs.select("node", F.lit(1).cast("long").alias("h"))
    a = None
    for _ in range(rounds):
        a = (
            d.join(h, d.src == h.node)
            .groupBy(F.col("dst").alias("n"))
            .agg(F.sum("h").alias("a"))
            .select(F.col("n").alias("node"), "a")
        )
        h = (
            d.join(a, d.dst == a.node)
            .groupBy(F.col("src").alias("n"))
            .agg(F.sum("a").alias("h"))
            .select(F.col("n").alias("node"), "h")
        )
    nodes = srcs.unionAll(dsts).distinct()
    return (
        nodes.join(h, on="node", how="left")
        .join(a, on="node", how="left")
        .select(
            "node",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth"),
        )
    )


def boruvka_rounds(
    edges: DataFrame, rounds: int = 3, relabel_steps: int = 10
) -> DataFrame:
    """FIXED-BUDGET BORŮVKA for the maximum-weight spanning forest:
    each round every component picks its best incident cross-edge
    (highest ``support``, ties to the smaller (src, dst) — a strict
    total order, so the choice is unique), the picks join the forest,
    and components merge by ``relabel_steps`` rounds of min-label
    propagation over the forest built so far.

    Budgets are FIXED so an unrolled SQL twin can replay every
    intermediate state: with enough steps this is exactly Borůvka
    (components halve per round, so ``rounds``=⌈log₂V⌉ completes the
    forest); with truncated budgets the result is still deterministic
    — both engines run the identical truncation. Callers/tests assert
    convergence sufficiency separately (acyclic picks, extra
    propagation step is a no-op).

    100 TB shape: a round is one edge↔component double equi-join, one
    per-component window argmax (map-side combinable after the window
    shuffle on the component key), and node-sized relabel joins —
    never an all-pairs step; every loop-carried table is
    ``localCheckpoint``'ed so lineage stays linear.

    Returns (round, src, dst, support) — the edges picked per round.
    """
    ew = edges.select("src", "dst", "support").localCheckpoint(
        eager=False
    )
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionAll(ew.select(F.col("dst").alias("node")))
        .distinct()
    )
    comp = nodes.select("node", F.col("node").alias("comp"))
    comp = comp.localCheckpoint(eager=False)
    forest = None
    picks = []
    wsel = Window.partitionBy("c").orderBy(
        F.col("support").desc(), F.col("src").asc(), F.col("dst").asc()
    )
    for r in range(1, rounds + 1):
        ca = comp.select(
            F.col("node").alias("src"), F.col("comp").alias("ca")
        )
        cb = comp.select(
            F.col("node").alias("dst"), F.col("comp").alias("cb")
        )
        cross = (
            ew.join(ca, on="src")
            .join(cb, on="dst")
            .filter(F.col("ca") != F.col("cb"))
        )
        side = cross.select(
            F.col("ca").alias("c"), "src", "dst", "support"
        ).unionAll(
            cross.select(
                F.col("cb").alias("c"), "src", "dst", "support"
            )
        )
        pick = (
            side.withColumn("rn", F.row_number().over(wsel))
            .filter(F.col("rn") == 1)
            .select("src", "dst", "support")
            .distinct()
            .localCheckpoint(eager=False)
        )
        picks.append(pick.withColumn("round", F.lit(r).cast("long")))
        forest = (
            pick
            if forest is None
            else forest.unionAll(pick).distinct()
        )
        forest = forest.localCheckpoint(eager=False)
        fadj = forest.select(
            F.col("src").alias("node"), F.col("dst").alias("nbr")
        ).unionAll(
            forest.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr")
            )
        )
        for _ in range(relabel_steps):
            m = (
                fadj.join(
                    comp.withColumnRenamed("node", "nbr"), on="nbr"
                )
                .groupBy("node")
                .agg(F.min("comp").alias("mn"))
            )
            comp = comp.join(m, on="node", how="left").select(
                "node",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("mn"), F.col("comp")),
                ).alias("comp"),
            )
            comp = comp.localCheckpoint(eager=False)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out.select("round", "src", "dst", "support")


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
