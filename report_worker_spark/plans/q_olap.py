"""Catalog family: customer / revenue / merchandising OLAP analytics.

Mechanically split from the monolithic plans/catalog.py (round
12); query definition order within the family is the original
file order, and all shared helpers come from ``_qshared``.
"""

from __future__ import annotations

from ._qshared import *  # noqa: F401,F403




# --- OLAP baseline (TPC-H Q1 shape) — bench headline -------------------------


@query(
    "olap_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           count(*) AS count_order,
           min(l_shipdate) AS min_shipdate
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def olap_q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Classic scan→filter→agg: exercises pushdown + partial aggregation
    (extension surface; the reference itself has no GROUP BY)."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.min("l_shipdate").alias("min_shipdate"),
        )
    )




# --- OLAP breadth: multi-join aggregates over the TPC-H-ish tables -----------


@query(
    "olap_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS revenue_c4,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_c4 DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def olap_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter →
    fact-fact join → top-10 by aggregated revenue. Money math in exact
    integer cents ×(100−disc_cents) so the sum is order-independent and
    bit-identical cross-engine (float Σ(price·(1−disc)) is neither).
    Plan shape at scale: filters push to scans, customer is the small
    build side, orders⋈lineitem shuffles on orderkey once."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_c4"))
        .select("l_orderkey", "revenue_c4", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )




@query(
    "olap_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS revenue_c4
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue_c4 DESC, n_name ASC
    """,
)
def olap_q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-table join where the
    region/nation dims prune early and broadcast, the customer-nation =
    supplier-nation predicate rides the supplier join, and only the
    orders⋈lineitem step is a real shuffle. Integer-cents money math as
    in Q3."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("n_name").asc())
    )




@query(
    "funnel_3step_1day",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
            AND e.ts <= v.t1 + INTERVAL 1 DAY
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
            AND e.ts <= c.t2 + INTERVAL 1 DAY
          GROUP BY e.user_id)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after
    """,
)
def funnel_3step_1day(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (view → click ≤1d → purchase ≤1d):
    per-stage first-event times via joins back to the event stream —
    each stage is one groupBy + one equi-join on user_id, so the whole
    funnel co-partitions on the user key (a single shuffle family at
    scale, no windows over the full stream)."""
    e = load(spark, sf, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 1 DAY")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, on="user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, on="user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )




@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(datediff('week', f.cohort, date_trunc('week', e.ts)) AS BIGINT)
               AS week_n
      FROM events e JOIN f1rst f ON e.user_id = f.user_id
    )
    SELECT cohort, week_n, CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort, week_n
    """.replace("f1rst", "first"),
)
def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, active
    user counts per subsequent week. Both engines truncate to week
    starts, so the week offset is an exact integer (day diff / 7).
    Scale shape: one groupBy for cohorts (broadcastable), a distinct on
    (user, week) — the event stream is touched twice, shuffled on
    user_id both times."""
    e = load(spark, sf, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = (
        e.join(first, on="user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .dropDuplicates(["user_id", "cohort", "week_n"])
    )
    return act.groupBy("cohort", "week_n").agg(
        F.count(F.lit(1)).alias("n_active")
    )




@query(
    "olap_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def olap_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: existential semi-join with an inequality on the
    correlated row, then a tiny aggregate. Catalyst plans the EXISTS as
    a left-semi hash join on l_orderkey (the inequality stays a join
    residual) — one shuffle each side, no correlated per-row subquery
    execution anywhere."""
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem")
    cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate")
        > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.alias("o")
        .join(l.alias("l"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )




@query(
    "olap_q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 120
    )
    SELECT c.c_name, o.o_orderkey, o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def olap_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): pre-aggregate the fact to
    its join key FIRST (map-side-combinable sum + HAVING shrinks the
    fact by ~orders-per-key before any join), then two dim joins that
    AQE turns into broadcasts at these sizes. Quantities are integral
    in the data — summed as BIGINT, so the HAVING boundary is exact."""
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 120)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )




@query(
    "olap_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c4,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def olap_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): the purest
    scan-dominated query — every predicate pushes to the parquet scan
    (date/discount/quantity are all min-max-prunable), and the agg is a
    single map-side-combinable partial. At 100 TB this is the query
    where pushdown either happens or you read the whole fact; the plan
    test asserts PushedFilters carries all three."""
    li = load(spark, sf, "lineitem")
    disc_rev = F.round(F.col("l_extendedprice") * 100).cast(
        "long"
    ) * F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )




@query(
    "olap_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_C4_SQL}
                         ELSE 0 END) AS BIGINT) AS promo_c4,
           CAST(sum({_REV_C4_SQL}) AS BIGINT) AS total_c4,
           100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_C4_SQL}
                                 ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_REV_C4_SQL}) AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def olap_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one selective month of the
    fact joined to the part dim, conditional sum ratio. The dim is
    broadcast (no fact shuffle at any scale); the ratio divides two
    exact BIGINT cents-sums in double, so it is bit-reproducible."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf, "part")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev_c4()).otherwise(F.lit(0))
    ).alias("promo_c4")
    total = F.sum(_rev_c4()).alias("total_c4")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(promo, total)
        .select(
            "promo_c4",
            "total_c4",
            (
                F.lit(100.0)
                * F.col("promo_c4").cast("double")
                / F.col("total_c4").cast("double")
            ).alias("promo_pct"),
        )
    )




@query(
    "olap_q19_disjunctive_pushdown",
    oracle=f"""
    SELECT CAST(sum({_REV_C4_SQL}) AS BIGINT) AS revenue_c4,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def olap_q19_disjunctive_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three conjunctive brackets OR-ed across both join sides. Catalyst
    factors the single-side conjuncts out of the OR — the part scan
    keeps only rows matching SOME bracket's (brand, size) and lineitem
    only rows in SOME quantity range — then the residual OR rides the
    broadcast hash join. The plan test asserts both scans carry pushed
    Or filters rather than filtering after the join."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    br = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(br)
        .agg(
            F.sum(_rev_c4()).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )




@query(
    "olap_q17_small_qty_orders",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*)
               AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS total_price_c,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DOUBLE) < 0.2 * pa.avg_qty
    """,
)
def olap_q17_small_qty_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    AVG subquery decorrelates into a per-partkey pre-aggregate joined
    back to the fact. Quantities are integral, so sum-as-BIGINT /
    count is an exact double and the 0.2× threshold is deterministic.
    At scale both sides shuffle once on l_partkey; the brand filter
    broadcasts."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity").cast("double") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "total_price_c"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )




@query(
    "olap_q22_dormant_customers",
    oracle="""
    WITH pos AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / count(*) AS avg_bal_c
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_c
    FROM customer c, pos
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > pos.avg_bal_c
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
)
def olap_q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): rich-but-dormant
    customers — balance above the global positive-balance average
    (scalar subquery → one-row broadcast) and no orders since the
    cutoff (anti-join on a pre-filtered orders side; the filter pushes
    to the scan). Balances compare in exact integer cents against a
    double average of exact cent sums. The anti-join shuffles on
    custkey; at 100× the scalar pre-agg is still one row."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bal_c).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal_c"
            )
        )
    )
    return (
        c.withColumn("bal_c", bal_c)
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") > F.col("avg_bal_c"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
    )




@query(
    "cust_rfm_segments",
    oracle="""
    WITH m AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(date_diff('day', max(o.o_orderdate),
                            TIMESTAMP '2002-01-01') AS BIGINT) AS r_days,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    )
    SELECT c_custkey, c_nationkey, r_days, freq, monetary_c,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY r_days ASC, c_custkey ASC)
                AS BIGINT) AS r_q,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY freq DESC, c_custkey ASC)
                AS BIGINT) AS f_q,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY monetary_c DESC, c_custkey ASC)
                AS BIGINT) AS m_q
    FROM m
    """,
)
def cust_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles), the
    classic customer-analytics operator. Metrics are exact integers
    (days, counts, cents); quartiles are ntile(4) PER NATION with a
    full custkey tiebreak — deterministic, and the windows parallelize
    across nations instead of forcing one global sort partition (the
    scale trap of ungrouped ntile)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    m = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.datediff(
                F.lit("2002-01-01").cast("timestamp"),
                F.max("o_orderdate"),
            )
            .cast("long")
            .alias("r_days"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_c"
            ),
        )
    )
    wr = Window.partitionBy("c_nationkey").orderBy(
        F.col("r_days").asc(), F.col("c_custkey").asc()
    )
    wf = Window.partitionBy("c_nationkey").orderBy(
        F.col("freq").desc(), F.col("c_custkey").asc()
    )
    wm = Window.partitionBy("c_nationkey").orderBy(
        F.col("monetary_c").desc(), F.col("c_custkey").asc()
    )
    return m.select(
        "c_custkey",
        "c_nationkey",
        "r_days",
        "freq",
        "monetary_c",
        F.ntile(4).over(wr).cast("long").alias("r_q"),
        F.ntile(4).over(wf).cast("long").alias("f_q"),
        F.ntile(4).over(wm).cast("long").alias("m_q"),
    )




@query(
    "olap_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def olap_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    named nations in both directions, by ship year. The two nation
    lookups and supplier/customer dims broadcast; only the
    lineitem-orders join shuffles (on orderkey), and the symmetric
    nation disjunction is applied after the broadcast joins, where it
    costs nothing. Revenue in exact c4 integers."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    both = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(both)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(_rev_c4()).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )




@query(
    "olap_q9_nation_part_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY nation, l_year
    """,
)
def olap_q9_nation_part_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by nation and year), reshaped
    for the reduced schema: the testdata has no partsupp/ps_supplycost,
    so profit degrades to discounted revenue — the plan shape (LIKE
    filter on part, star joins out to supplier nation, group by
    nation x year) is the point. The part filter broadcasts AND prunes:
    ~13% of parts survive, so the fact join drops rows before the agg
    shuffle."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_c4()).alias("revenue_c4"))
    )




@query(
    "olap_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
         AND o.o_orderdate >= TIMESTAMP '1997-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-07-01'
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY c.c_custkey, c.c_name, nation, acctbal_c
    ORDER BY revenue_c4 DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def olap_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in a half-year window. The returnflag and
    date filters push to the scans; customer/nation broadcast; the
    global top-20 is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition top-20 then a 20-row driver
    merge — no global sort shuffle, the only top-k plan that survives
    100 TB). Exact-cents revenue with a custkey tiebreak makes the
    selected SET deterministic."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
        )
        .agg(F.sum(_rev_c4()).alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey").asc())
        .limit(20)
    )




@query(
    "olap_q12_ship_delay_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 30
                  THEN 'lt30'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 60
                  THEN 'lt60'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 90
                  THEN 'lt90'
                ELSE 'ge90' END AS delay_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY delay_bucket
    """,
)
def olap_q12_ship_delay_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority analysis), reshaped: the
    testdata has no l_shipmode/commitdate/receiptdate, so the grouping
    dimension becomes the order-to-ship delay bucket and the
    high/low-priority conditional counts are kept verbatim. One
    fact-fact join on orderkey (both sides pre-filtered), one 4-group
    agg. Day arithmetic on UTC-midnight timestamps is exact."""
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    dd = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(dd < 30, "lt30")
        .when(dd < 60, "lt60")
        .when(dd < 90, "lt90")
        .otherwise("ge90")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )




@query(
    "olap_q13_cust_order_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
)
def olap_q13_cust_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT outer
    join so zero-order customers survive with c_count=0, with the
    exclusion predicate INSIDE the join condition (moving it to WHERE
    would silently drop the nulls — the classic outer-join bug the
    reference's NOT-EXISTS family guards against). Two cascaded aggs;
    the second input is one row per customer, so the distribution agg
    is tiny."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    co = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))




@query(
    "olap_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS total_revenue_c4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_c4
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue_c4 = (SELECT max(total_revenue_c4) FROM rev)
    """,
)
def olap_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    then the supplier(s) achieving the maximum — the tie-INCLUSIVE
    formulation (all maximal suppliers, not an arbitrary one), which is
    only deterministic because revenue is an exact c4 integer; a float
    sum here could make the equality test partition-order-dependent.
    The scalar max broadcasts as a one-row cross join."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load(spark, sf, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_rev_c4()).alias("total_revenue_c4")
    )
    mx = rev.agg(F.max("total_revenue_c4").alias("max_rev"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_c4") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue_c4")
    )




@query(
    "olap_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def olap_q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), reshaped: with no
    partsupp the supplier-per-part-spec census runs over lineitem, and
    the 'customer complaints' exclusion becomes negative-balance
    suppliers. The excluded-supplier set is tiny -> broadcast ANTI
    join before the distinct-count agg; count(DISTINCT) shuffles once
    on the (brand, type, size) grid."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_brand") != "Brand#45")
    bad = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )




@query(
    "olap_q20_dominant_suppliers",
    oracle="""
    WITH sq AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ), pt AS (
      SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
      FROM sq GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
         AND n.n_name = 'NATION_5'
    WHERE EXISTS (
      SELECT 1 FROM sq
      JOIN pt ON pt.l_partkey = sq.l_partkey
      JOIN part p ON p.p_partkey = sq.l_partkey AND p.p_name LIKE 'red %'
      WHERE sq.l_suppkey = s.s_suppkey AND sq.supp_qty * 4 > pt.part_qty
    )
    """,
)
def olap_q20_dominant_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), reshaped: with no
    partsupp availqty, a supplier 'dominates' a red part when it
    shipped more than a quarter of that part's total 1997 quantity. Two
    stacked integer aggs on the pre-filtered fact, a broadcast part
    filter, then a LEFT SEMI join into the nation-filtered supplier
    dim — the EXISTS decorrelates to a semi-join on suppkey, so
    supplier rows never duplicate. All-quantity integer math keeps the
    x2 > total comparison exact."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load(spark, sf, "part").filter(F.col("p_name").like("red %"))
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_5")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("supp_qty")
    )
    pt = sq.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        sq.join(pt, sq.l_partkey == F.col("pt_partkey"))
        .join(F.broadcast(p), sq.l_partkey == p.p_partkey)
        .filter(F.col("supp_qty") * 4 > F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )




@query(
    "olap_q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
           AND o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
         AND n.n_name = 'NATION_2'
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    """,
)
def olap_q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), reshaped:
    lateness is shipping >60 days after the order date (no
    receipt/commit dates in the testdata). The EXISTS/NOT-EXISTS pair
    decorrelates into ONE order-level aggregate — n_supps =
    countDistinct(suppkey), n_late_supps = countDistinct(suppkey when
    late) — joined back to the late rows: EXISTS(other supplier) is
    n_supps >= 2, NOT EXISTS(other late supplier) is n_late_supps = 1
    given this row is late. One extra agg replaces two correlated
    fact self-joins; both formulations must and do agree (the oracle
    keeps the EXISTS form)."""
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = (
        load(spark, sf, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("late"),
        )
    )
    stats = li.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        li.filter(F.col("late"))
        .join(stats, F.col("l_orderkey") == F.col("st_orderkey"))
        .filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )




@query(
    "olap_q8_market_share",
    oracle="""
    WITH flows AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_c4,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN rev_c4
                         ELSE 0 END) AS BIGINT) AS nation_rev_c4,
           CAST(sum(rev_c4) AS BIGINT) AS total_rev_c4,
           CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN rev_c4
                         ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_c4) AS DOUBLE) AS mkt_share
    FROM flows GROUP BY o_year
    """,
)
def olap_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_9's share of
    supplier revenue into ASIA-region customers, by order year. The
    conditional-sum-over-sum idiom computes the share in one agg pass
    (no self-join); numerator and denominator are exact c4 integers, so
    the final double division is a single bit-reproducible op. All five
    dims broadcast; the one shuffle is lineitem-orders on orderkey."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nat = F.when(F.col("supp_nation") == "NATION_9", F.col("rev_c4")).otherwise(
        F.lit(0)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_c4().alias("rev_c4"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(nat).alias("nation_rev_c4"),
            F.sum("rev_c4").alias("total_rev_c4"),
            (
                F.sum(nat).cast("double") / F.sum("rev_c4").cast("double")
            ).alias("mkt_share"),
        )
    )




@query(
    "olap_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost, s.s_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ), ranked AS (
      SELECT p.p_partkey, p.p_name, e.l_suppkey AS s_suppkey, e.s_name,
             e.unit_cost,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY e.unit_cost ASC, e.l_suppkey ASC) AS rn
      FROM eligible e JOIN part p ON p.p_partkey = e.l_partkey
      WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, unit_cost
    FROM ranked WHERE rn = 1
    """,
)
def olap_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier) on the reduced schema: with
    no partsupp, unit cost is min(l_extendedprice/l_quantity) observed
    per (part, supplier). The correlated MIN subquery decorrelates into
    a per-part window rank; region/nation/supplier/part dims all
    broadcast, so the only shuffles are the cost aggregation and the
    final per-part window. min() over doubles is order-independent —
    bit-stable under any partitioning."""
    li = load(spark, sf, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    sdim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    p = load(spark, sf, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("s_suppkey").asc()
    )
    return (
        cost.join(F.broadcast(sdim), cost.l_suppkey == sdim.s_suppkey)
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cost")
    )




@query(
    "olap_q11_important_parts",
    oracle="""
    WITH nsupp AS (
      SELECT s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_7')
    ), pq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS part_qty
      FROM lineitem JOIN nsupp ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    ), tot AS (SELECT CAST(SUM(part_qty) AS BIGINT) AS total_qty FROM pq)
    SELECT l_partkey, part_qty FROM pq CROSS JOIN tot
    WHERE part_qty * 1000 > total_qty
    """,
)
def olap_q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock) on the reduced schema: parts
    whose shipped-quantity share from two nations' suppliers exceeds
    0.1% of that group's total. The HAVING-vs-global-scalar compare is
    a broadcast of ONE row (the grand total re-aggregated from the
    per-part partials — no second scan), and the share test is integer
    cross-multiplication: exact, no float thresholds."""
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    nsupp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    li = load(spark, sf, "lineitem")
    pq = (
        li.join(F.broadcast(nsupp), li.l_suppkey == nsupp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("part_qty"))
    )
    tot = pq.agg(F.sum("part_qty").alias("total_qty"))
    return (
        pq.join(F.broadcast(tot))
        .filter(F.col("part_qty") * 1000 > F.col("total_qty"))
        .select("l_partkey", "part_qty")
    )




@query(
    "olap_nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS region, n.n_name AS nation,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT region, nation, cents,
           CAST(cents AS DOUBLE)
             / CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE)
             AS region_share
    FROM rev
    """,
)
def olap_nation_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue —
    one aggregation (integer cents, exact), one window sum over the
    tiny rollup (|nations| rows — the window runs post-aggregation,
    never over the fact), one exact double division."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey").alias("region"),
        F.col("n_name").alias("nation"),
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("region", "nation")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        "cents",
        (
            F.col("cents").cast("double")
            / F.sum("cents").over(w).cast("double")
        ).alias("region_share"),
    )




@query(
    "olap_rolling_3mo_revenue",
    oracle="""
    WITH m AS (
      SELECT n.n_name AS nation,
             date_trunc('month', o.o_orderdate) AS month,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, date_trunc('month', o.o_orderdate)
    )
    SELECT nation, strftime(month, '%Y-%m') AS month, cents,
           CAST(SUM(cents) OVER (PARTITION BY nation ORDER BY month
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cents_3mo
    FROM m
    """,
)
def olap_rolling_3mo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly revenue per nation with a 3-month moving total — the
    rollup-then-window shape: the window runs over the |nations|×
    |months| aggregate, never the fact; integer cents keep the moving
    sum exact. (ROWS not RANGE: months are contiguous in this data;
    ts_rolling_7d shows the calendar-aware RANGE variant.)"""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", F.date_trunc("month", "o_orderdate").alias("month")
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("nation", "month")
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("month")
        .rowsBetween(-2, Window.currentRow)
    )
    return m.select(
        "nation",
        F.date_format("month", "yyyy-MM").alias("month"),
        "cents",
        F.sum("cents").over(w).alias("cents_3mo"),
    )




@query(
    "olap_pareto_frontier",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_totalprice, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS bkt
      FROM orders
    ),
    b AS (SELECT bkt, max(o_orderdate) AS bd FROM o GROUP BY bkt),
    hi AS (
      SELECT bkt,
             max(bd) OVER (ORDER BY bkt DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS rm_hi
      FROM b
    ),
    w AS (
      SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, hi.rm_hi,
             max(o.o_orderdate) OVER (
               PARTITION BY o.bkt ORDER BY o.cents DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm_in
      FROM o JOIN hi USING (bkt)
    )
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM w
    WHERE greatest(COALESCE(rm_hi, TIMESTAMP '1000-01-01'),
                   COALESCE(rm_in, TIMESTAMP '1000-01-01')) <= o_orderdate
    """,
)
def olap_pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline / Pareto frontier of orders on (total price ↑, order
    date ↑): an order survives iff no other order strictly beats it on
    BOTH dims. The naive skyline is an O(n²) self-join; this is the
    two-level bucket decomposition that stays distributed:

    - per-$1000-bucket max date (map-combinable groupBy, |buckets|
      rows — dim-sized);
    - strictly-higher-BUCKET running max over that tiny table (the
      only single-partition window, |buckets| rows);
    - strictly-higher-price-IN-bucket max via a per-bucket RANGE
      window on exact integer cents (distributed across buckets —
      TPC-H prices are ~uniform, no hot bucket);
    - dominated ⇔ either bound exceeds the row's own date.

    Window frames use RANGE … 1 PRECEDING on DESC cents, which both
    engines read as "strictly greater value" (verified semantics);
    prices compare as exact cents, so the frontier set is
    engine-identical."""
    o = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    o = o.withColumn("bkt", F.expr("cents DIV 100000"))
    b = o.groupBy("bkt").agg(F.max("o_orderdate").alias("bd"))
    wb = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    hi = b.select("bkt", F.max("bd").over(wb).alias("rm_hi"))
    wi = (
        Window.partitionBy("bkt")
        .orderBy(F.col("cents").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sentinel = F.lit("1000-01-01").cast("timestamp")
    w = o.join(F.broadcast(hi), on="bkt").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.greatest(
            F.coalesce(F.col("rm_hi"), sentinel),
            F.coalesce(F.max("o_orderdate").over(wi), sentinel),
        ).alias("_rm"),
    )
    return w.filter(F.col("_rm") <= F.col("o_orderdate")).drop("_rm")




@query(
    "olap_basket_lift",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             FROM li),
    sup AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_sup
      FROM li GROUP BY l_partkey
    ),
    co AS (
      SELECT a.l_partkey AS p_a, b.l_partkey AS p_b,
             CAST(count(*) AS BIGINT) AS n_co
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    scored AS (
      SELECT co.p_a, co.p_b, co.n_co, sa.n_sup AS n_a, sb.n_sup AS n_b,
             CAST(co.n_co AS DOUBLE) * CAST(nord.n_orders AS DOUBLE)
               / (CAST(sa.n_sup AS DOUBLE) * CAST(sb.n_sup AS DOUBLE))
               AS lift
      FROM co
      JOIN sup sa ON sa.l_partkey = co.p_a
      JOIN sup sb ON sb.l_partkey = co.p_b
      CROSS JOIN nord
    )
    SELECT p_a, p_b, n_co, n_a, n_b, lift, rank FROM (
      SELECT *, CAST(row_number() OVER
               (ORDER BY n_co DESC, p_a, p_b) AS BIGINT) AS rank
      FROM scored)
    WHERE rank <= 20
    """,
)
def olap_basket_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-purchase mining with LIFT — the co-occurrence
    statistic the raw co-occur edge set (graph family's
    _cooccur_edges) doesn't expose: for the 20 most co-ordered part
    pairs, lift = P(a,b) / (P(a)·P(b)) as the single mirrored float
    expression over exact integer supports. Pair generation is the
    per-order self-join (fan-out bounded by lines-per-order ≤ 7, so
    ≤ 21 pairs per order — linear in the fact, never quadratic in
    parts); supports broadcast back onto the pair aggregate."""
    li = (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nord = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_sup"))
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p_b")
    )
    co = (
        a.join(b, on="ok")
        .filter(F.col("p_a") < F.col("p_b"))
        .groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    scored = (
        co.join(
            F.broadcast(
                sup.select(
                    F.col("l_partkey").alias("p_a"),
                    F.col("n_sup").alias("n_a"),
                )
            ),
            on="p_a",
        )
        .join(
            F.broadcast(
                sup.select(
                    F.col("l_partkey").alias("p_b"),
                    F.col("n_sup").alias("n_b"),
                )
            ),
            on="p_b",
        )
        .crossJoin(F.broadcast(nord))
        .select(
            "p_a",
            "p_b",
            "n_co",
            "n_a",
            "n_b",
            (
                F.col("n_co").cast("double")
                * F.col("n_orders").cast("double")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            ).alias("lift"),
        )
    )
    w = Window.orderBy(
        F.col("n_co").desc(), F.col("p_a").asc(), F.col("p_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("p_a", "p_b", "n_co", "n_a", "n_b", "lift", "rank")
    )




@query(
    "olap_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT coalesce(touch, 'direct') AS touch_type,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(cents) AS BIGINT) AS attributed_cents
    FROM seq WHERE event_type = 'purchase'
    GROUP BY coalesce(touch, 'direct')
    """,
)
def olap_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """LAST-TOUCH revenue attribution — credit each purchase to the
    most recent preceding non-purchase event in the user's stream
    (the default model of every marketing-analytics stack). One
    window pass per user (ordered by ts with event_id tiebreak — a
    total order, so the 'last touch' is well-defined on both
    engines), then a hash aggregate on the touch channel. Integer
    cents; purchases with no prior touch credit 'direct'. At 100 TB
    this is the sessionization shape: partition-by-user windows
    shuffle once on user_id, never globally."""
    e = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    seq = e.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        touch.alias("touch"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("direct")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("cents").alias("attributed_cents"),
        )
    )




@query(
    "olap_abc_classification",
    oracle="""
    WITH p AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
             sum(rev) OVER () AS tot
      FROM p
    ),
    cls AS (
      SELECT l_partkey, rev,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS abc
      FROM c
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS revenue_cents,
           CAST(sum(rev) AS DOUBLE)
             / (SELECT CAST(sum(rev) AS DOUBLE) FROM p) AS revenue_share
    FROM cls GROUP BY abc
    """,
)
def olap_abc_classification(spark: SparkSession, sf: str) -> DataFrame:
    """ABC / PARETO INVENTORY CLASSIFICATION — the 80/15/5 revenue
    segmentation every supply-chain dashboard opens with: parts
    ranked by revenue, class A while cumulative share ≤ 80%, B to
    95%, C after. The thresholds are INTEGER cross-multiplications
    (cum·5 ≤ tot·4) so class boundaries can't float-drift. The
    ranked window runs on the PART-LEVEL aggregate (dim-sized — the
    fact contributes one groupBy); at 100 TB the part dim would
    range-shard like stats_quantile_normalize, documented trade."""
    li = load(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    p = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev"))
    wc = Window.orderBy(F.col("rev").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = p.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(wc).alias("cum"),
        F.sum("rev").over(wt).alias("tot"),
    )
    cls = c.select(
        "rev",
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("abc"),
        "tot",
    )
    return cls.groupBy("abc", "tot").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").alias("revenue_cents"),
    ).select(
        "abc",
        "n_parts",
        "revenue_cents",
        (
            F.col("revenue_cents").cast("double")
            / F.col("tot").cast("double")
        ).alias("revenue_share"),
    )




@query(
    "olap_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CAST(e.ts AS DATE) AS day,
             CASE WHEN CAST(e.ts AS DATE) = f.first_day
                  THEN e.user_id END AS new_user,
             e.user_id
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT date_diff('day', DATE '2024-01-01', day) AS day,
           CAST(count(DISTINCT new_user) AS BIGINT) AS new_users,
           CAST(count(DISTINCT user_id)
                - count(DISTINCT new_user) AS BIGINT) AS returning_users
    FROM tagged GROUP BY day
    """,
)
def olap_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """NEW vs RETURNING daily active users — the first split of every
    product-analytics dashboard: a user is 'new' on the calendar day
    of their first-ever event and 'returning' on any later active
    day. One groupBy(user) for first-touch dates (broadcast-able —
    user dim), one join back, one distinct-count aggregate per day.
    No window over the fact; the first-touch table is the only
    state, which is exactly the incremental shape (yesterday's
    first-touch table + today's partition) a daily job wants."""
    e = load(spark, sf, "events")
    day = F.col("ts").cast("date")
    firsts = e.groupBy("user_id").agg(F.min(day).alias("first_day"))
    tagged = e.join(firsts, on="user_id").select(
        F.datediff(day, F.lit("2024-01-01").cast("date")).alias("day"),
        F.when(day == F.col("first_day"), F.col("user_id")).alias(
            "new_user"
        ),
        "user_id",
    )
    return tagged.groupBy("day").agg(
        F.countDistinct("new_user").alias("new_users"),
        (
            F.countDistinct("user_id") - F.countDistinct("new_user")
        ).alias("returning_users"),
    )




@query(
    "olap_lorenz_deciles",
    oracle="""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
             count(*) OVER () AS n,
             sum(cents) OVER (ORDER BY cents, o_orderkey) AS cum,
             sum(cents) OVER () AS tot
      FROM c
    )
    SELECT CAST((rn * 10 - 1) // n + 1 AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(cum) AS BIGINT) AS cum_cents,
           CAST(max(cum) AS DOUBLE) / max(tot) AS cum_share
    FROM ranked GROUP BY (rn * 10 - 1) // n + 1
    """,
)
def olap_lorenz_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """LORENZ CURVE at decile resolution — the concentration chart
    behind stats_gini_by_nation's single number: orders sorted by
    value, cumulative revenue share at each population decile
    ('the bottom 50% of orders carry 18% of revenue'). Decile
    assignment is the INTEGER expression (rn·10−1) DIV n + 1 —
    deterministic, no percent_rank floats at bucket edges. The rank
    AND the revenue prefix sum both run sharded (r12; previously a
    documented would-shard): orders shard on cents DIV 2²⁰ — shard
    order == value order by construction, no sampling — local windows
    rank and prefix-sum within each shard, and the bounded shard
    table (counts + sums) lifts both to global values, exactly the
    stats_quantile_normalize device extended with a sum offset. Fact
    passes once; no corpus-sized single-partition window."""
    o = load(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = o.select(cents.alias("cents"), "o_orderkey").withColumn(
        "_shard", (F.col("cents") / F.lit(1 << 20)).cast("long")
    )
    sh = d.groupBy("_shard").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("cents").alias("_s")
    )
    woff = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall_sh = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = sh.select(
        "_shard",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_roff"),
        F.coalesce(F.sum("_s").over(woff), F.lit(0)).alias("_soff"),
        F.sum("_c").over(wall_sh).alias("n"),
        F.sum("_s").over(wall_sh).alias("tot"),
    )
    win_in = Window.partitionBy("_shard").orderBy("cents", "o_orderkey")
    wcum_in = win_in.rowsBetween(Window.unboundedPreceding, 0)
    ranked = d.join(F.broadcast(off), "_shard").select(
        "cents",
        (F.col("_roff") + F.row_number().over(win_in)).alias("rn"),
        "n",
        (F.col("_soff") + F.sum("cents").over(wcum_in)).alias("cum"),
        "tot",
    )
    decile = (
        F.floor((F.col("rn") * 10 - 1) / F.col("n")) + 1
    ).cast("long")
    return ranked.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("cum").alias("cum_cents"),
        (
            F.max("cum").cast("double") / F.max("tot").cast("double")
        ).alias("cum_share"),
    )




@query(
    "olap_seasonality_index",
    oracle="""
    WITH m AS (
      SELECT CAST(month(l_shipdate) AS BIGINT) AS mon,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY month(l_shipdate)
    ),
    t AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM m)
    SELECT m.mon, m.rev AS revenue_cents,
           CAST(m.rev AS DOUBLE) * 12 / t.tot AS seasonality_index
    FROM m CROSS JOIN t
    """,
)
def olap_seasonality_index(spark: SparkSession, sf: str) -> DataFrame:
    """MONTHLY SEASONALITY INDEX — each month's revenue against the
    uniform 1/12 share (index 1.1 = 'this month runs 10% hot'), the
    retail planner's first seasonal decomposition. Integer cents,
    one groupBy(month) over the filtered fact, one-row broadcast
    total, index = rev·12/tot in ONE mirrored float expression. The
    shipdate bounds push down to the parquet scan."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.groupBy(
        F.month("l_shipdate").cast("long").alias("mon")
    ).agg(F.sum(cents).alias("rev"))
    t = m.agg(F.sum("rev").alias("tot"))
    return m.crossJoin(F.broadcast(t)).select(
        "mon",
        F.col("rev").alias("revenue_cents"),
        (
            F.col("rev").cast("double") * 12 / F.col("tot").cast("double")
        ).alias("seasonality_index"),
    )




@query(
    "olap_reactivated_users",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
      FROM events
    ),
    gaps AS (
      SELECT user_id, day,
             day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
               AS gap
      FROM active
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(sum(CASE WHEN gap > 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS reactivated_users
    FROM gaps GROUP BY day
    """,
)
def olap_reactivated_users(spark: SparkSession, sf: str) -> DataFrame:
    """REACTIVATED USERS per day — the third panel of the growth
    dashboard after new/returning (olap_new_vs_returning): a user
    reactivates on an active day that follows a gap of more than 7
    inactive days (the resurrection metric churn models calibrate
    on). One distinct-active-days projection, one lag window per
    user, one aggregate — shuffles once on user_id then once on
    day."""
    e = load(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    active = e.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = active.select(
        "day", (F.col("day") - F.lag("day").over(w)).alias("gap")
    )
    return gaps.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum(F.when(F.col("gap") > 7, 1).otherwise(0))
        .cast("long")
        .alias("reactivated_users"),
    )




@query(
    "olap_survival_kaplan_meier",
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(epoch_us(ts - TIMESTAMP '2024-01-01') // 1000000) AS t0,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts - TIMESTAMP '2024-01-01') // 1000000
                 END) AS tp
      FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT CASE WHEN tp IS NOT NULL
                       AND (tp - t0) // 3600 <= 72
                  THEN (tp - t0) // 3600 ELSE 72 END AS t,
             CASE WHEN tp IS NOT NULL
                       AND (tp - t0) // 3600 <= 72
                  THEN 1 ELSE 0 END AS ev
      FROM u
    ),
    per_t AS (
      SELECT t, CAST(sum(ev) AS BIGINT) AS converted,
             CAST(sum(1 - ev) AS BIGINT) AS censored
      FROM subj GROUP BY t
    ),
    risk AS (
      SELECT t, converted, censored,
             sum(converted + censored) OVER (
               ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS n_at_risk
      FROM per_t
    )
    SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, converted, censored,
           round(exp(sum(
             CASE WHEN converted < n_at_risk
                  THEN ln(1.0 - CAST(converted AS DOUBLE) / n_at_risk)
                  ELSE CAST('-infinity' AS DOUBLE) END
           ) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 12) AS survival
    FROM risk
    """,
)
def olap_survival_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """KAPLAN-MEIER time-to-conversion curve: hours from a user's
    first event to their first PURCHASE, right-censored at the 72-hour
    observation horizon (the administrative-censoring design growth
    teams use for fixed-window conversion). S(t) = Pi_{ti<=t}
    (1 - di/ni); di (conversions at hour ti) and ni (at-risk, a
    reverse cumulative window) stay EXACT integers - hour buckets are
    BIGINT floor-divisions of whole seconds since the corpus epoch
    (tz-free interval arithmetic, never engine date_diff boundary
    semantics). Only the final product touches floats, as exp of an
    ORDERED cumulative sum of ln terms (identical sequential order on
    both engines, round 12); d = n at the tail maps to exact 0. One
    groupBy per user + one per hour + two windows - the fact shuffles
    once."""
    e = load(spark, sf, "events")
    mu = (
        F.col("ts") - F.lit("2024-01-01").cast("timestamp_ntz")
    ).cast("long")  # whole seconds since the corpus epoch, tz-free
    u = e.groupBy("user_id").agg(
        F.min(mu).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", mu)
        ).alias("tp"),
    )
    hours = F.expr("(tp - t0) DIV 3600")
    conv = F.col("tp").isNotNull() & (hours <= 72)
    subj = u.select(
        F.when(conv, hours).otherwise(F.lit(72)).alias("t"),
        F.when(conv, 1).otherwise(0).alias("ev"),
    )
    per_t = subj.groupBy("t").agg(
        F.sum("ev").cast("long").alias("converted"),
        F.sum(1 - F.col("ev")).cast("long").alias("censored"),
    )
    w_rev = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = per_t.withColumn(
        "n_at_risk",
        F.sum(F.col("converted") + F.col("censored")).over(w_rev),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ln_term = F.when(
        F.col("converted") < F.col("n_at_risk"),
        F.log(
            F.lit(1.0)
            - F.col("converted").cast("double") / F.col("n_at_risk")
        ),
    ).otherwise(F.lit(float("-inf")))
    return risk.select(
        "t",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        "converted",
        "censored",
        F.round(F.exp(F.sum(ln_term).over(w_cum)), 12).alias("survival"),
    )




@query(
    "olap_wow_growth_decomposition",
    oracle="""
    WITH weekly AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
               AS week,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    lag1 AS (
      SELECT event_type, week, cents,
             lag(cents) OVER (
               PARTITION BY event_type ORDER BY week) AS prev_cents
      FROM weekly
    ),
    lagged AS (
      SELECT *, sum(prev_cents) OVER (PARTITION BY week) AS prev_total
      FROM lag1
    )
    SELECT event_type, week, cents,
           CAST(prev_cents AS BIGINT) AS prev_cents,
           round((cents - prev_cents) * 100.0
                 / nullif(prev_cents, 0), 6) AS wow_pct,
           round((cents - prev_cents) * 100.0
                 / nullif(prev_total, 0), 6) AS contribution_pct
    FROM lagged WHERE prev_cents IS NOT NULL
    """,
)
def olap_wow_growth_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """WEEK-OVER-WEEK growth with CONTRIBUTION decomposition: each
    event type's WoW percentage plus its contribution to the total
    week's growth (Δtype / prev_week_total — the additive
    decomposition growth reviews use to attribute a topline move to
    segments; contributions sum to the topline WoW). Week 4 is the
    partial 2-day tail of the 30-day window, reported as-is. Integer
    cents throughout; two stacked windows (lag per type, then a
    week-partition total over the lags) — one day-grain aggregate of
    the fact, no joins."""
    e = load(spark, sf, "events")
    week = (
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        / 7
    ).cast("int")
    cents = F.round(F.col("value") * 100).cast("long")
    weekly = e.select(
        "event_type", week.alias("week"), cents.alias("c")
    ).groupBy("event_type", "week").agg(F.sum("c").alias("cents"))
    wl = Window.partitionBy("event_type").orderBy("week")
    ww = Window.partitionBy("week")
    lagged = weekly.select(
        "event_type",
        "week",
        "cents",
        F.lag("cents").over(wl).alias("prev_cents"),
    ).withColumn("prev_total", F.sum("prev_cents").over(ww))
    d = F.col("cents") - F.col("prev_cents")
    return lagged.filter(F.col("prev_cents").isNotNull()).select(
        "event_type",
        "week",
        "cents",
        "prev_cents",
        F.round(
            d * 100.0 / F.nullif(F.col("prev_cents"), F.lit(0)), 6
        ).alias("wow_pct"),
        F.round(
            d * 100.0 / F.nullif(F.col("prev_total"), F.lit(0)), 6
        ).alias("contribution_pct"),
    )




@query(
    "olap_median_order_gap",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
      FROM orders
    ),
    gaps AS (
      SELECT o_custkey,
             CAST(date_diff('day', prev_d, d) AS BIGINT) AS gap
      FROM seq WHERE prev_d IS NOT NULL
    ),
    arr AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
             list_sort(list(gap)) AS a
      FROM gaps GROUP BY o_custkey
    )
    SELECT o_custkey, n_gaps,
           CAST(a[CAST((n_gaps + 1) // 2 AS INT)]
                + a[CAST(n_gaps // 2 + 1 AS INT)] AS BIGINT)
             AS med2_gap_days,
           CAST(a[1] AS BIGINT) AS min_gap,
           CAST(a[CAST(n_gaps AS INT)] AS BIGINT) AS max_gap
    FROM arr
    """,
)
def olap_median_order_gap(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT MEDIAN INTER-ORDER GAP per customer — the re-purchase
    cadence metric behind churn models. Gaps come from one lag
    window per customer (date order, orderkey tiebreak); the median
    is reported as med2 = lower-middle + upper-middle of the sorted
    gap array, an EXACT BIGINT that sidesteps engine-specific
    interpolation (med2/2 is the usual median). Per-customer arrays
    are order-count-bounded (tiny), so collect_list here is a
    grouped small-array device, not a corpus collect; the whole op
    is one window + one groupBy."""
    o = load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    wseq = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.withColumn("prev_d", F.lag("d").over(wseq))
        .filter(F.col("prev_d").isNotNull())
        .select(
            "o_custkey",
            F.datediff("d", "prev_d").cast("long").alias("gap"),
        )
    )
    arr = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.array_sort(F.collect_list("gap")).alias("a"),
    )
    lo = F.element_at("a", ((F.col("n_gaps") + 1) / 2).cast("int"))
    hi = F.element_at("a", (F.col("n_gaps") / 2 + 1).cast("int"))
    return arr.select(
        "o_custkey",
        "n_gaps",
        (lo + hi).cast("long").alias("med2_gap_days"),
        F.element_at("a", 1).cast("long").alias("min_gap"),
        F.element_at("a", F.col("n_gaps").cast("int"))
        .cast("long")
        .alias("max_gap"),
    )




@query(
    "olap_brand_weekend_lift",
    oracle="""
    WITH li AS (
      SELECT p.p_brand,
             CASE WHEN dayofweek(CAST(l.l_shipdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS wknd,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
      SELECT p_brand,
             CAST(sum(CASE WHEN wknd = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wknd,
             CAST(sum(CASE WHEN wknd = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wkdy,
             CAST(sum(CASE WHEN wknd = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS cents_wknd,
             CAST(sum(CASE WHEN wknd = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS cents_wkdy
      FROM li GROUP BY p_brand
    )
    SELECT p_brand, n_wknd, n_wkdy, cents_wknd, cents_wkdy,
           round((CAST(cents_wknd AS DOUBLE) / 2)
                 / (CAST(cents_wkdy AS DOUBLE) / 5), 12)
             AS daily_rate_lift
    FROM g
    WHERE n_wknd > 0 AND n_wkdy > 0
    """,
)
def olap_brand_weekend_lift(spark: SparkSession, sf: str) -> DataFrame:
    """WEEKEND-vs-WEEKDAY revenue lift per brand: daily-rate ratio
    (weekend cents / 2 days) over (weekday cents / 5 days) — the
    day-mix normalization that raw weekend shares get wrong. Brand
    dim broadcasts into the fact scan; everything is exact integer
    cents until the single lift division, round 12. Day-of-week
    convention pinned on BOTH engines (Spark dayofweek: 1=Sun..7;
    DuckDB: 0=Sun..6) — the classic cross-engine off-by-one."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    dow = F.dayofweek(F.col("l_shipdate").cast("date"))  # 1=Sun..7=Sat
    wknd = F.when(dow.isin(1, 7), 1).otherwise(0)
    g = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", wknd.alias("wknd"), "cents")
        .groupBy("p_brand")
        .agg(
            F.sum("wknd").cast("long").alias("n_wknd"),
            F.sum(1 - F.col("wknd")).cast("long").alias("n_wkdy"),
            F.sum(F.when(F.col("wknd") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("cents_wknd"),
            F.sum(F.when(F.col("wknd") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("cents_wkdy"),
        )
    )
    return g.filter((F.col("n_wknd") > 0) & (F.col("n_wkdy") > 0)).select(
        "p_brand",
        "n_wknd",
        "n_wkdy",
        "cents_wknd",
        "cents_wkdy",
        F.round(
            (F.col("cents_wknd").cast("double") / 2)
            / (F.col("cents_wkdy").cast("double") / 5),
            12,
        ).alias("daily_rate_lift"),
    )




@query(
    "olap_ship_delay_by_priority",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT)
               AS delay
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    byval AS (
      SELECT o_orderpriority, delay, CAST(count(*) AS BIGINT) AS cnt
      FROM d GROUP BY o_orderpriority, delay
    ),
    ranked AS (
      SELECT o_orderpriority, delay, cnt,
             coalesce(sum(cnt) OVER (
               PARTITION BY o_orderpriority ORDER BY delay
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cless,
             sum(cnt) OVER (PARTITION BY o_orderpriority) AS n
      FROM byval
    )
    SELECT o_orderpriority,
           CAST(min(n) AS BIGINT) AS n_lines,
           CAST(min(delay) AS BIGINT) AS min_delay,
           CAST(max(delay) AS BIGINT) AS max_delay,
           CAST(min(CASE WHEN cless < (n + 1) // 2
                          AND cless + cnt >= (n + 1) // 2
                         THEN delay END)
                + min(CASE WHEN cless < n // 2 + 1
                            AND cless + cnt >= n // 2 + 1
                           THEN delay END) AS BIGINT) AS med2_delay,
           CAST(min(CASE WHEN cless < (n * 9 + 9) // 10
                          AND cless + cnt >= (n * 9 + 9) // 10
                         THEN delay END) AS BIGINT) AS p90_delay
    FROM ranked GROUP BY o_orderpriority
    """,
)
def olap_ship_delay_by_priority(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER-TO-SHIP DELAY profile per order priority — the SLA
    question ("does URGENT actually ship faster?") over the
    BIG-BIG join shape: lineitem ⋈ orders on orderkey (both fact-
    sized — the shuffle-join economics the TPC-H suite prices), then
    an exact value-distribution profile per priority using the
    count-table rank device: med2 (lower+upper middle, no
    interpolation) and the ceil-rank p90 come from cumulative counts
    over the (priority, delay) count table — never a per-row global
    sort. All integers end-to-end."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("delay"),
    )
    byval = d.groupBy("o_orderpriority", "delay").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wr = (
        Window.partitionBy("o_orderpriority")
        .orderBy("delay")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("o_orderpriority")
    ranked = byval.select(
        "o_orderpriority",
        "delay",
        "cnt",
        F.coalesce(F.sum("cnt").over(wr), F.lit(0)).alias("cless"),
        F.sum("cnt").over(wall).alias("n"),
    )
    lo_r = ((F.col("n") + 1) / 2).cast("long")
    hi_r = (F.col("n") / 2 + 1).cast("long")
    p90_r = ((F.col("n") * 9 + 9) / 10).cast("long")
    pick = lambda r: F.min(  # noqa: E731
        F.when(
            (F.col("cless") < r) & (F.col("cless") + F.col("cnt") >= r),
            F.col("delay"),
        )
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.min("n").cast("long").alias("n_lines"),
        F.min("delay").cast("long").alias("min_delay"),
        F.max("delay").cast("long").alias("max_delay"),
        (pick(lo_r) + pick(hi_r)).cast("long").alias("med2_delay"),
        pick(p90_r).cast("long").alias("p90_delay"),
    )




@query(
    "olap_customer_hhi",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice) AS BIGINT)) AS BIGINT)
               AS dollars
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    g AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(dollars) AS BIGINT) AS total_dollars,
             CAST(sum(dollars * dollars) AS BIGINT) AS sum_sq
      FROM rev GROUP BY c_nationkey
    )
    SELECT c_nationkey, n_customers, total_dollars,
           round(CAST(sum_sq AS DOUBLE)
                 / (CAST(total_dollars AS DOUBLE)
                    * CAST(total_dollars AS DOUBLE)), 12) AS hhi,
           round((CAST(sum_sq AS DOUBLE)
                  / (CAST(total_dollars AS DOUBLE)
                     * CAST(total_dollars AS DOUBLE))
                  - 1.0 / n_customers)
                 / (1 - 1.0 / n_customers), 12) AS hhi_normalized
    FROM g WHERE n_customers > 1
    """,
)
def olap_customer_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """HERFINDAHL–HIRSCHMAN concentration of order revenue across
    customers, per nation: HHI = Σ shareᵢ² = Σdᵢ²/(Σdᵢ)² — the
    antitrust-style "is this market a few whales?" number that
    complements the Gini/Lorenz family (HHI weights the head, Gini
    the whole curve). Whole-dollar revenue keeps Σd² inside int64
    at any realistic scale (cents² would overflow); both HHI and
    its 1/n-floor-normalized variant are mirrored doubles over
    exact integers, round 12. Customer dim broadcasts; two stacked
    map-combinable aggregates."""
    o = load(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.round("o_totalprice").cast("long")).alias("dollars")
        )
    )
    g = rev.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("dollars").alias("total_dollars"),
        F.sum(F.col("dollars") * F.col("dollars")).alias("sum_sq"),
    )
    hhi = F.col("sum_sq").cast("double") / (
        F.col("total_dollars").cast("double")
        * F.col("total_dollars").cast("double")
    )
    return g.filter(F.col("n_customers") > 1).select(
        "c_nationkey",
        "n_customers",
        F.col("total_dollars").cast("long").alias("total_dollars"),
        F.round(hhi, 12).alias("hhi"),
        F.round(
            (hhi - 1.0 / F.col("n_customers"))
            / (1 - 1.0 / F.col("n_customers")),
            12,
        ).alias("hhi_normalized"),
    )




@query(
    "olap_return_rate_by_brand",
    oracle="""
    WITH li AS (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(ret) AS BIGINT) AS n_returns
      FROM li GROUP BY p_brand
    ),
    w AS (
      SELECT p_brand, n_lines, n_returns,
             CAST(n_returns AS DOUBLE) / n_lines AS p,
             1.96 * 1.96 AS z2
      FROM g
    )
    SELECT p_brand, n_lines, n_returns,
           round(p, 12) AS return_rate,
           round((p + z2 / (2 * n_lines)
                  - 1.96 * sqrt(p * (1 - p) / n_lines
                                + z2 / (4.0 * n_lines * n_lines)))
                 / (1 + z2 / n_lines), 12) AS wilson_low,
           round((p + z2 / (2 * n_lines)
                  + 1.96 * sqrt(p * (1 - p) / n_lines
                                + z2 / (4.0 * n_lines * n_lines)))
                 / (1 + z2 / n_lines), 12) AS wilson_high
    FROM w
    """,
)
def olap_return_rate_by_brand(spark: SparkSession, sf: str) -> DataFrame:
    """RETURN RATE per brand with the Wilson 95% interval — the
    supplier-quality scorecard that never ranks a 3-line brand above
    a 3000-line one on a lucky streak (the Wilson lower bound is the
    honest sort key; a raw rate is not). Counts are exact; the
    rate and interval are the mirrored Wilson expression over them,
    round 12. Brand dim broadcasts into the fact scan; one
    map-combinable aggregate."""
    li = load(spark, sf, "lineitem").select("l_partkey", "l_returnflag")
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    g = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returns"),
        )
    )
    pr = F.col("n_returns").cast("double") / F.col("n_lines")
    z2 = 1.96 * 1.96
    n = F.col("n_lines")
    half = 1.96 * F.sqrt(
        pr * (1 - pr) / n + z2 / (4.0 * n * n)
    )
    return g.select(
        "p_brand",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_returns").cast("long").alias("n_returns"),
        F.round(pr, 12).alias("return_rate"),
        F.round((pr + z2 / (2 * n) - half) / (1 + z2 / n), 12).alias(
            "wilson_low"
        ),
        F.round((pr + z2 / (2 * n) + half) / (1 + z2 / n), 12).alias(
            "wilson_high"
        ),
    )




@query(
    "olap_order_linecount_profile",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(count(*)) OVER (ORDER BY n_lines
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_orders,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (), 12) AS share
    FROM per GROUP BY n_lines
    """,
)
def olap_order_linecount_profile(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER-SIZE histogram: the distribution of line counts per
    order with cumulative counts and shares — the fan-out profile
    that sizes every orderkey-keyed shuffle (a J5-style fan-out
    join's cost is exactly this histogram's tail). One groupBy on
    the fact + one histogram aggregate; the cumulative window runs
    over the ≤7-row histogram (TPC-H orders carry 1-7 lines)."""
    li = load(spark, sf, "lineitem").select("l_orderkey")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    hist = per.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))
    wcum = Window.orderBy("n_lines").rowsBetween(
        Window.unboundedPreceding, 0
    )  # histogram-sized window (≤7 rows)
    wall = Window.partitionBy()
    return hist.select(
        F.col("n_lines").cast("long").alias("n_lines"),
        "n_orders",
        F.sum("n_orders").over(wcum).cast("long").alias("cum_orders"),
        F.round(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(wall),
            12,
        ).alias("share"),
    )




@query(
    "olap_cohort_ltv_curve",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    purch AS (
      SELECT f.cohort,
             CAST(datediff('week', f.cohort, date_trunc('week', e.ts))
               AS BIGINT) AS week_n,
             CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e JOIN first f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ),
    size_ AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM first GROUP BY cohort
    ),
    weekly AS (
      SELECT cohort, week_n,
             CAST(sum(cents) AS BIGINT) AS week_cents
      FROM purch GROUP BY cohort, week_n
    )
    SELECT w.cohort, w.week_n, s.cohort_users, w.week_cents,
           CAST(sum(w.week_cents) OVER (
             PARTITION BY w.cohort ORDER BY w.week_n
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_cents,
           round(CAST(sum(w.week_cents) OVER (
                   PARTITION BY w.cohort ORDER BY w.week_n
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / (100.0 * s.cohort_users), 12)
             AS ltv_per_user
    FROM weekly w JOIN size_ s USING (cohort)
    """,
)
def olap_cohort_ltv_curve(spark: SparkSession, sf: str) -> DataFrame:
    """COHORT LTV CURVE — cumulative purchase revenue per first-seen-
    week cohort, by weeks-since-acquisition, normalized per cohort
    user: the payback-period chart next to cohort_retention's
    activity matrix (retention says users came back; LTV says what
    that was worth). Integer cents throughout; the cumulative window
    is per-cohort over ≤ a-handful-of-weeks rows; cohort sizes
    broadcast. Same two-touch shuffle shape as cohort_retention."""
    e = load(spark, sf, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    first = first.localCheckpoint(eager=False)  # consumed twice
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(first, on="user_id")
        .select(
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort")
                )
                / 7
            )
            .cast("long")
            .alias("week_n"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    size_ = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    weekly = purch.groupBy("cohort", "week_n").agg(
        F.sum("cents").alias("week_cents")
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("week_n")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        weekly.join(F.broadcast(size_), on="cohort")
        .select(
            "cohort",
            "week_n",
            "cohort_users",
            F.col("week_cents").cast("long").alias("week_cents"),
            F.sum("week_cents").over(wcum).cast("long").alias("cum_cents"),
            F.round(
                F.sum("week_cents").over(wcum).cast("double")
                / (100.0 * F.col("cohort_users")),
                12,
            ).alias("ltv_per_user"),
        )
    )




@query(
    "olap_price_qty_elasticity",
    oracle="""
    WITH per AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    ),
    pts AS (
      SELECT ln(CAST(cents AS DOUBLE) / qty) AS lx,
             ln(CAST(qty AS DOUBLE) / n) AS ly
      FROM per WHERE qty > 0 AND cents > 0
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(lx))), (a, v) -> a + v) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(ly))), (a, v) -> a + v) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(lx * ly))), (a, v) -> a + v) AS sxy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(lx * lx))), (a, v) -> a + v) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 12)
             AS elasticity,
           round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * (sx / n), 12) AS intercept
    FROM m
    """,
)
def olap_price_qty_elasticity(spark: SparkSession, sf: str) -> DataFrame:
    """LOG-LOG PRICE ELASTICITY across parts: OLS of ln(avg quantity
    per line) on ln(avg unit price), one point per part — the "does
    demand fall when price rises?" cross-sectional read (the slope
    IS the elasticity in a log-log model). Per-part sums are exact
    BIGINTs; each ln argument is ONE division of exact integers;
    the four OLS moments fold smallest-first (the Hurst/ts_ols
    discipline) and the slope/intercept are mirrored doubles,
    round 12. One fact groupBy + a one-row reduce."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    per = li.groupBy("l_partkey").agg(
        F.sum("cents").alias("cents"),
        F.sum("qty").alias("qty"),
        F.count(F.lit(1)).alias("n"),
    )
    pts = per.filter((F.col("qty") > 0) & (F.col("cents") > 0)).select(
        F.log(F.col("cents").cast("double") / F.col("qty")).alias("lx"),
        F.log(F.col("qty").cast("double") / F.col("n")).alias("ly"),
    )

    def fold(c):
        return F.aggregate(
            F.array_sort(F.collect_list(c)), F.lit(0.0), lambda a, v: a + v
        )

    m = pts.select(
        "lx", "ly", (F.col("lx") * F.col("ly")).alias("lxy"),
        (F.col("lx") * F.col("lx")).alias("lxx"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        fold("lx").alias("sx"),
        fold("ly").alias("sy"),
        fold("lxy").alias("sxy"),
        fold("lxx").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("long").alias("n_parts"),
        F.round(slope, 12).alias("elasticity"),
        F.round(
            F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")),
            12,
        ).alias("intercept"),
    )




@query(
    "olap_time_to_first_purchase",
    oracle="""
    WITH per AS (
      SELECT user_id,
             CAST(min(CAST(ts AS DATE)) AS DATE) AS first_seen,
             CAST(min(CASE WHEN event_type = 'purchase'
                           THEN CAST(ts AS DATE) END) AS DATE)
               AS first_purchase
      FROM events GROUP BY user_id
    ),
    gaps AS (
      SELECT user_id,
             CAST(date_diff('day', first_seen, first_purchase) AS BIGINT)
               AS days_to_purchase
      FROM per WHERE first_purchase IS NOT NULL
    ),
    byval AS (
      SELECT days_to_purchase, CAST(count(*) AS BIGINT) AS cnt
      FROM gaps GROUP BY days_to_purchase
    ),
    ranked AS (
      SELECT days_to_purchase, cnt,
             coalesce(sum(cnt) OVER (ORDER BY days_to_purchase
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cless,
             sum(cnt) OVER () AS n
      FROM byval
    )
    SELECT CAST(min(n) AS BIGINT) AS n_converting_users,
           CAST((SELECT count(*) FROM per) AS BIGINT) AS n_users,
           CAST(min(days_to_purchase) AS BIGINT) AS min_days,
           CAST(max(days_to_purchase) AS BIGINT) AS max_days,
           CAST(min(CASE WHEN cless < (n + 1) // 2
                          AND cless + cnt >= (n + 1) // 2
                         THEN days_to_purchase END)
                + min(CASE WHEN cless < n // 2 + 1
                            AND cless + cnt >= n // 2 + 1
                           THEN days_to_purchase END) AS BIGINT)
             AS med2_days
    FROM ranked
    """,
)
def olap_time_to_first_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """TIME-TO-FIRST-PURCHASE: days from a user's first event of any
    kind to their first purchase — the activation-latency metric
    between the funnel (did they convert?) and the LTV curve (what
    was it worth?). One user-level min-aggregate (two conditional
    MINs — no window, no join), then the exact med2 via the
    count-table rank device over the tiny gap histogram. All
    integer days."""
    e = load(spark, sf, "events")
    per = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_seen"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.col("ts").cast("date"),
            )
        ).alias("first_purchase"),
    )
    per = per.localCheckpoint(eager=False)  # consumed twice
    gaps = per.filter(F.col("first_purchase").isNotNull()).select(
        F.datediff("first_purchase", "first_seen")
        .cast("long")
        .alias("days_to_purchase")
    )
    byval = gaps.groupBy("days_to_purchase").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wr = Window.orderBy("days_to_purchase").rowsBetween(
        Window.unboundedPreceding, -1
    )  # gap-histogram-sized window (≤ ~30 rows)
    wall = Window.partitionBy()
    ranked = byval.select(
        "days_to_purchase",
        "cnt",
        F.coalesce(F.sum("cnt").over(wr), F.lit(0)).alias("cless"),
        F.sum("cnt").over(wall).alias("n"),
    )
    lo = ((F.col("n") + 1) / 2).cast("long")
    hi = (F.col("n") / 2 + 1).cast("long")
    pick = lambda r: F.min(  # noqa: E731
        F.when(
            (F.col("cless") < r) & (F.col("cless") + F.col("cnt") >= r),
            F.col("days_to_purchase"),
        )
    )
    n_users = per.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        ranked.agg(
            F.min("n").cast("long").alias("n_converting_users"),
            F.min("days_to_purchase").cast("long").alias("min_days"),
            F.max("days_to_purchase").cast("long").alias("max_days"),
            (pick(lo) + pick(hi)).cast("long").alias("med2_days"),
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "n_converting_users",
            F.col("n_users").cast("long").alias("n_users"),
            "min_days",
            "max_days",
            "med2_days",
        )
    )




@query(
    "olap_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS cust,
             date_diff('day', max(o_orderdate), DATE '1998-08-02')
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT *,
             CAST(ntile(5) OVER (ORDER BY recency_days, cust) AS INT)
               AS r_quintile,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, cust) AS INT)
               AS f_quintile,
             CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, cust)
               AS INT) AS m_quintile
      FROM rfm
    )
    SELECT r_quintile, f_quintile, m_quintile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(min(cust) AS BIGINT) AS sample_cust
    FROM scored GROUP BY 1, 2, 3
    """,
)
def olap_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    """RFM SEGMENTATION — the classic customer-value cube: per
    customer, Recency (days from last order to the corpus horizon),
    Frequency (order count), Monetary (lifetime cents, exact BIGINT),
    each cut into quintiles with a full (metric, custkey) tiebreak so
    ntile is deterministic on both engines, then the 5×5×5 segment
    census. At scale the per-customer rollup is one map-combinable
    groupBy; the three ntiles are rank windows over the (much smaller)
    customer aggregate, and the final census is category-bounded
    (≤125 rows)."""
    o = load(spark, sf, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.datediff(
            F.lit("1998-08-02").cast("date"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    scored = rfm.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy("recency_days", "cust"))
        .cast("int")
        .alias("r_quintile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), "cust"))
        .cast("int")
        .alias("f_quintile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary_cents").desc(), "cust"))
        .cast("int")
        .alias("m_quintile"),
    )
    return scored.groupBy("r_quintile", "f_quintile", "m_quintile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
        F.min("cust").cast("long").alias("sample_cust"),
    )




@query(
    "olap_retention_triangle",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey AS cust,
             date_trunc('month', min(o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    cohorts AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
      FROM firsts
      WHERE cohort >= DATE '1995-01-01' AND cohort < DATE '1996-01-01'
      GROUP BY cohort
    ),
    activity AS (
      SELECT DISTINCT f.cohort, f.cust,
             date_diff('month', f.cohort,
                       date_trunc('month', o.o_orderdate)) AS age_months
      FROM firsts f JOIN orders o ON o.o_custkey = f.cust
      WHERE f.cohort >= DATE '1995-01-01'
        AND f.cohort < DATE '1996-01-01'
        AND date_diff('month', f.cohort,
                      date_trunc('month', o.o_orderdate))
            BETWEEN 0 AND 12
    )
    SELECT strftime(a.cohort, '%Y-%m') AS cohort_month,
           CAST(a.age_months AS INT) AS age_months,
           CAST(count(*) AS BIGINT) AS n_active,
           c.n_cohort,
           CAST(count(*) * 1000 // c.n_cohort AS BIGINT)
             AS retention_milli
    FROM activity a JOIN cohorts c ON a.cohort = c.cohort
    GROUP BY a.cohort, a.age_months, c.n_cohort
    """,
)
def olap_retention_triangle(spark: SparkSession, sf: str) -> DataFrame:
    """COHORT RETENTION TRIANGLE for the 1995 acquisition cohorts
    (round 13: retargeted from 1994, which predates the fixture's
    orders span 1995-01-01.. — the triangle was EMPTY at every SF):
    customers grouped by first-order month, then for month-ages 0..12
    the share of each cohort that ordered again (distinct customers,
    exact milli-rate via integer DIV — no float ratios to drift).
    The first-order collapse and the distinct (cohort, cust, age)
    activity set are both shuffle-on-customer aggregations; ages are
    capped so the output is cohort-bounded (≤ 13×12 rows)."""
    o = load(spark, sf, "orders")
    o = o.localCheckpoint(eager=False)  # scanned twice (firsts + joins)
    firsts = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.trunc(F.min("o_orderdate"), "month").alias("cohort")
    ).filter(
        (F.col("cohort") >= F.lit("1995-01-01").cast("date"))
        & (F.col("cohort") < F.lit("1996-01-01").cast("date"))
    )
    firsts = firsts.localCheckpoint(eager=False)  # consumed twice
    cohorts = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    age = F.months_between(
        F.trunc(F.col("o_orderdate"), "month"), F.col("cohort")
    ).cast("int")
    activity = (
        firsts.join(o, firsts.cust == o.o_custkey)
        .select("cohort", "cust", age.alias("age_months"))
        .filter((F.col("age_months") >= 0) & (F.col("age_months") <= 12))
        .distinct()
    )
    return (
        activity.groupBy("cohort", "age_months")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(cohorts), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            "age_months",
            "n_active",
            "n_cohort",
            F.expr("n_active * 1000 div n_cohort")
            .cast("long")
            .alias("retention_milli"),
        )
    )




@query(
    "olap_session_conversion_by_depth",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    ),
    per AS (
      SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM s GROUP BY user_id, sess
    ),
    bucketed AS (
      SELECT CASE WHEN n_events = 1 THEN '1'
                  WHEN n_events = 2 THEN '2'
                  WHEN n_events <= 5 THEN '3-5'
                  ELSE '6+' END AS depth_bucket,
             converted
      FROM per
    )
    SELECT depth_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converting,
           CAST(sum(converted) * 1000 // count(*) AS BIGINT)
             AS conversion_milli
    FROM bucketed GROUP BY depth_bucket
    """,
)
def olap_session_conversion_by_depth(
    spark: SparkSession, sf: str
) -> DataFrame:
    """SESSION-DEPTH CONVERSION curve: sessionize each user's events
    with the native 30-minute session window (the same state-store
    operator the streaming path uses), flag sessions containing a
    purchase, and report conversion per depth bucket (1 / 2 / 3-5 /
    6+ events) — the do-longer-sessions-convert question. Conversion
    is an exact integer milli-rate (DIV), the session rollup is the
    proven gaps-and-islands shape, and the bucket census is
    category-bounded."""
    e = load(spark, sf, "events")
    per = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    bucketed = per.select(
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") == 2, "2")
        .when(F.col("n_events") <= 5, "3-5")
        .otherwise("6+")
        .alias("depth_bucket"),
        "converted",
    )
    return bucketed.groupBy("depth_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converting"),
        F.expr("sum(converted) * 1000 div count(*)")
        .cast("long")
        .alias("conversion_milli"),
    )




@query(
    "olap_open_order_aging",
    oracle="""
    WITH open_ AS (
      SELECT o_orderkey, o_totalprice,
             date_diff('day', o_orderdate, DATE '1998-08-02') AS age_days
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days < 365 THEN '0-1y'
                WHEN age_days < 730 THEN '1-2y'
                WHEN age_days < 1460 THEN '2-4y'
                ELSE '4y+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS open_cents,
           CAST(min(age_days) AS BIGINT) AS min_age_days,
           CAST(max(age_days) AS BIGINT) AS max_age_days
    FROM open_ GROUP BY 1
    """,
)
def olap_open_order_aging(spark: SparkSession, sf: str) -> DataFrame:
    """OPEN-ORDER AGING report — the accounts-receivable staple: every
    still-open order bucketed by age at the corpus horizon, with exact
    open value in cents. One filtered map-combinable groupBy over a
    fixed 4-bucket domain; the filter and the two scanned columns push
    down to the parquet scan."""
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    age = F.datediff(
        F.lit("1998-08-02").cast("date"), F.col("o_orderdate")
    )
    open_ = o.select(
        age.alias("age_days"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bucket = (
        F.when(F.col("age_days") < 365, "0-1y")
        .when(F.col("age_days") < 730, "1-2y")
        .when(F.col("age_days") < 1460, "2-4y")
        .otherwise("4y+")
    )
    return open_.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("open_cents"),
        F.min("age_days").cast("long").alias("min_age_days"),
        F.max("age_days").cast("long").alias("max_age_days"),
    )




@query(
    "olap_price_volume_bridge",
    oracle="""
    WITH yr AS (
      SELECT p.p_brand AS brand,
             CAST(extract(year FROM l.l_shipdate) AS INT) AS y,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= DATE '1995-01-01'
        AND l.l_shipdate < DATE '1997-01-01'
      GROUP BY p.p_brand, 2
    ),
    pivot_ AS (
      SELECT brand,
             CAST(max(CASE WHEN y = 1995 THEN qty END) AS BIGINT) AS q0,
             CAST(max(CASE WHEN y = 1995 THEN rev_cents END) AS BIGINT)
               AS r0,
             CAST(max(CASE WHEN y = 1996 THEN qty END) AS BIGINT) AS q1,
             CAST(max(CASE WHEN y = 1996 THEN rev_cents END) AS BIGINT)
               AS r1
      FROM yr GROUP BY brand
      HAVING max(CASE WHEN y = 1995 THEN qty END) IS NOT NULL
         AND max(CASE WHEN y = 1996 THEN qty END) IS NOT NULL
    )
    SELECT brand, q0, q1, r0, r1,
           CAST(r1 - r0 AS BIGINT) AS delta_cents,
           round((q1 - q0) * (CAST(r0 AS DOUBLE) / q0), 6)
             AS volume_effect_cents,
           round(q1 * (CAST(r1 AS DOUBLE) / q1 - CAST(r0 AS DOUBLE) / q0),
                 6) AS price_effect_cents
    FROM pivot_
    """,
)
def olap_price_volume_bridge(spark: SparkSession, sf: str) -> DataFrame:
    """PRICE-VOLUME BRIDGE — decompose each brand's 1995→1996 revenue
    change into a volume effect (Δq at the old average price) and a
    price effect (new volume × Δ average price); the two effects sum
    to Δrevenue exactly by construction (laspeyres-volume /
    current-weight-price split). Quantities and cents are exact
    BIGINTs; average prices are mirrored single divisions, effects
    rounded at 6 (cents scale). One fact-side groupBy with the part
    dim broadcast — the canonical star-join rollup shape. (Round 13:
    the bridge moved from 1994→1995 to 1995→1996 — the fixture's
    lineitem starts 1995-01-02, so the 1994 leg was empty and the
    HAVING filtered every brand out; all 25 brands now survive.)"""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    yr = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("int").alias("y"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
        )
    )
    piv = (
        yr.groupBy("brand")
        .agg(
            F.max(F.when(F.col("y") == 1995, F.col("qty"))).alias("q0"),
            F.max(
                F.when(F.col("y") == 1995, F.col("rev_cents"))
            ).alias("r0"),
            F.max(F.when(F.col("y") == 1996, F.col("qty"))).alias("q1"),
            F.max(
                F.when(F.col("y") == 1996, F.col("rev_cents"))
            ).alias("r1"),
        )
        .filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    p0 = F.col("r0").cast("double") / F.col("q0")
    p1 = F.col("r1").cast("double") / F.col("q1")
    return piv.select(
        "brand",
        F.col("q0").cast("long").alias("q0"),
        F.col("q1").cast("long").alias("q1"),
        F.col("r0").cast("long").alias("r0"),
        F.col("r1").cast("long").alias("r1"),
        (F.col("r1") - F.col("r0")).cast("long").alias("delta_cents"),
        F.round((F.col("q1") - F.col("q0")) * p0, 6).alias(
            "volume_effect_cents"
        ),
        F.round(F.col("q1") * (p1 - p0), 6).alias("price_effect_cents"),
    )




@query(
    "olap_xyz_classification",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey AS part,
             date_trunc('month', l_shipdate) AS mth,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ),
    per AS (
      SELECT part,
             CAST(sum(qty) AS BIGINT) AS s,
             CAST(sum(qty * qty) AS BIGINT) AS s2
      FROM monthly GROUP BY part
    ),
    cls AS (
      SELECT part,
             CASE WHEN 4 * (12 * s2 - s * s) <= s * s THEN 'X'
                  WHEN (12 * s2 - s * s) <= s * s THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM per
    )
    SELECT xyz, CAST(count(*) AS BIGINT) AS n_parts
    FROM cls GROUP BY xyz
    """,
)
def olap_xyz_classification(spark: SparkSession, sf: str) -> DataFrame:
    """XYZ DEMAND-VARIABILITY classification — the companion axis to
    olap_abc_classification's value ranking: parts whose 1996 monthly
    demand is steady (X: CV ≤ 0.5), variable (Y: CV ≤ 1), or erratic/
    intermittent (Z: CV > 1). Months with no demand count as ZERO
    demand in the CV (the textbook XYZ treatment — intermittency IS
    variability), which also means the per-part sums need only the
    observed months: over n=12 months, var·144 = 12·S2 − S² with
    S/S2 summed over shipped months (zero months add nothing). The
    CV threshold test is carried ENTIRELY in integers — CV² ≤ c² ⟺
    (12·s2 − s²) ≤ c²·s², i.e. 4·disp ≤ s² for X, disp ≤ s² for Y —
    so no sqrt or float compare exists to drift. (Round 13: the
    window moved 1994→1996 — the fixture's lineitem starts 1995-01-02,
    so the 1994 version scanned zero rows — and the any-missing-month
    →Z shortcut was replaced by the zero-inclusive CV, which on this
    fixture's monthly density is the difference between every part
    degenerating to Z and the X/Y branches actually firing.) One
    fact groupBy to months, one to parts, category-bounded output."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.trunc("l_shipdate", "month").alias("mth"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    per = monthly.groupBy("part").agg(
        F.sum("qty").cast("long").alias("s"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("s2"),
    )
    disp = 12 * F.col("s2") - F.col("s") * F.col("s")
    cls = per.select(
        F.when(4 * disp <= F.col("s") * F.col("s"), "X")
        .when(disp <= F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
        .alias("xyz")
    )
    return cls.groupBy("xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )




@query(
    "olap_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
      FROM events
      WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
    ),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    fan AS (
      SELECT user_id, day + o.off AS target_day
      FROM ud, unnest(range(0, 7)) AS o(off)
      WHERE day + o.off <= 29
    ),
    wau AS (
      SELECT target_day AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM fan GROUP BY target_day
    )
    SELECT CAST(d.day AS INT) AS day, d.dau, w.wau,
           CAST(d.dau * 1000 // w.wau AS BIGINT) AS stickiness_milli
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def olap_dau_wau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """DAU/WAU STICKINESS — the engagement ratio product teams track
    daily (≈1000‰ = users come every day; ≈143‰ = once a week):
    exact daily actives over the exact 7-day rolling actives from
    ts_rolling_distinct_users' fan-out device, reported as an
    integer milli-ratio. Both distincts shuffle user-days (not raw
    events); the ratio is pure integer DIV."""
    e = load(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    ud = (
        e.select("user_id", day.alias("day"))
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .distinct()
    )
    ud = ud.localCheckpoint(eager=False)  # dau + fan
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    wau = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + 6)
            ).alias("target_day"),
        )
        .filter(F.col("target_day") <= 29)
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(wau, "day").select(
        F.col("day").cast("int").alias("day"),
        "dau",
        "wau",
        F.expr("dau * 1000 div wau").cast("long").alias(
            "stickiness_milli"
        ),
    )




@query(
    "olap_part_adoption_curve",
    oracle="""
    WITH firsts AS (
      SELECT l_partkey, date_trunc('month', min(l_shipdate)) AS m0
      FROM lineitem GROUP BY l_partkey
    ),
    monthly AS (
      SELECT m0, CAST(count(*) AS BIGINT) AS n_new FROM firsts GROUP BY m0
    ),
    catalog_n AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part)
    SELECT strftime(m0, '%Y-%m') AS month,
           n_new,
           CAST(sum(n_new) OVER (ORDER BY m0 ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum_adopted,
           CAST(sum(n_new) OVER (ORDER BY m0 ROWS UNBOUNDED PRECEDING)
                * 1000 // (SELECT n_parts FROM catalog_n) AS BIGINT)
             AS coverage_milli
    FROM monthly
    """,
)
def olap_part_adoption_curve(spark: SparkSession, sf: str) -> DataFrame:
    """PART ADOPTION curve: per month, how many catalog parts shipped
    for the FIRST time, cumulatively, and what share of the full part
    catalog has ever sold (integer milli-share) — the assortment-
    activation funnel merchandising reads against the catalog-growth
    budget. First-sale collapse is one map-combinable MIN per part;
    the cumulative window runs over the bounded month domain."""
    li = load(spark, sf, "lineitem")
    firsts = li.groupBy("l_partkey").agg(
        F.trunc(F.min("l_shipdate"), "month").alias("m0")
    )
    monthly = firsts.groupBy("m0").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    n_parts = load(spark, sf, "part").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    wcum = Window.orderBy("m0").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        monthly.select(
            F.date_format("m0", "yyyy-MM").alias("month"),
            "n_new",
            F.sum("n_new").over(wcum).cast("long").alias("cum_adopted"),
        )
        .crossJoin(F.broadcast(n_parts))
        .select(
            "month",
            "n_new",
            "cum_adopted",
            F.expr("cum_adopted * 1000 div n_parts")
            .cast("long")
            .alias("coverage_milli"),
        )
    )




@query(
    "olap_customer_order_regularity",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS cust,
             date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap
      FROM orders
    ),
    per AS (
      SELECT cust, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(gap * gap) AS BIGINT) AS s2
      FROM seq WHERE gap IS NOT NULL
      GROUP BY cust HAVING count(*) >= 3 AND sum(gap) > 0
    ),
    cls AS (
      SELECT cust,
             CASE WHEN 4 * (n_gaps * s2 - s * s) <= s * s THEN 'steady'
                  WHEN n_gaps * s2 - s * s <= s * s THEN 'variable'
                  ELSE 'erratic' END AS regularity
      FROM per
    )
    SELECT regularity, CAST(count(*) AS BIGINT) AS n_customers
    FROM cls GROUP BY regularity
    """,
)
def olap_customer_order_regularity(
    spark: SparkSession, sf: str
) -> DataFrame:
    """CUSTOMER ORDER-CADENCE regularity — the customer-side twin of
    olap_xyz_classification: inter-order gap CV per customer (≥3
    gaps), classed steady (CV ≤ 0.5) / variable (≤ 1) / erratic,
    with the CV thresholds rearranged into pure integer comparisons
    (n·Σg²−S² vs multiples of S²) so no sqrt or float compare
    exists. Steady customers are the replenishment base subscription
    offers target; erratic ones price churn models. One per-key lag
    window + two map-combinable groupBys."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = o.select(
        F.col("o_custkey").alias("cust"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per = (
        seq.groupBy("cust")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("s"),
            F.sum(F.col("gap") * F.col("gap")).cast("long").alias("s2"),
        )
        .filter((F.col("n_gaps") >= 3) & (F.col("s") > 0))
    )
    disp = F.col("n_gaps") * F.col("s2") - F.col("s") * F.col("s")
    cls = per.select(
        F.when(4 * disp <= F.col("s") * F.col("s"), "steady")
        .when(disp <= F.col("s") * F.col("s"), "variable")
        .otherwise("erratic")
        .alias("regularity")
    )
    return cls.groupBy("regularity").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )




@query(
    "olap_mix_residual_heatmap",
    oracle="""
    WITH cells AS (
      SELECT l.l_returnflag AS returnflag, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS observed
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    margins AS (
      SELECT returnflag, priority, observed,
             CAST(sum(observed) OVER (PARTITION BY returnflag) AS BIGINT)
               AS row_n,
             CAST(sum(observed) OVER (PARTITION BY priority) AS BIGINT)
               AS col_n,
             CAST(sum(observed) OVER () AS BIGINT) AS total_n
      FROM cells
    )
    SELECT returnflag, priority, observed,
           round(CAST(row_n AS DOUBLE) * col_n / total_n, 6)
             AS expected,
           round((observed - CAST(row_n AS DOUBLE) * col_n / total_n)
                 / sqrt(CAST(row_n AS DOUBLE) * col_n / total_n), 9)
             AS pearson_residual
    FROM margins
    """,
)
def olap_mix_residual_heatmap(spark: SparkSession, sf: str) -> DataFrame:
    """MIX RESIDUAL HEATMAP — the returnflag × priority contingency
    table with Pearson standardized residuals (obs−exp)/√exp: the
    cell-level WHERE behind an omnibus χ²/Cramér's V (which cells
    drive the association, |residual| > 2 ≈ significant). Margins
    come from three windows over the category-bounded cell table —
    the fact join shuffles once on orderkey, everything after is
    7×5-bounded. Expected counts and residuals are mirrored
    single-expression doubles, round 6/9."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_returnflag")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    margins = cells.select(
        "*",
        F.sum("observed")
        .over(Window.partitionBy("returnflag"))
        .cast("long")
        .alias("row_n"),
        F.sum("observed")
        .over(Window.partitionBy("priority"))
        .cast("long")
        .alias("col_n"),
        F.sum("observed")
        .over(Window.partitionBy())
        .cast("long")
        .alias("total_n"),
    )
    exp = F.col("row_n").cast("double") * F.col("col_n") / F.col("total_n")
    return margins.select(
        "returnflag",
        "priority",
        "observed",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("observed") - exp) / F.sqrt(exp), 9).alias(
            "pearson_residual"
        ),
    )




@query(
    "olap_abc_xyz_matrix",
    oracle="""
    WITH p AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    abc AS (
      SELECT l_partkey,
             CASE WHEN sum(rev) OVER (ORDER BY rev DESC, l_partkey) * 5
                       <= sum(rev) OVER () * 4 THEN 'A'
                  WHEN sum(rev) OVER (ORDER BY rev DESC, l_partkey) * 20
                       <= sum(rev) OVER () * 19 THEN 'B'
                  ELSE 'C' END AS abc
      FROM p
    ),
    monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS mth,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN 4 * (12 * sum(qty * qty) - sum(qty) * sum(qty))
                       <= sum(qty) * sum(qty) THEN 'X'
                  WHEN 12 * sum(qty * qty) - sum(qty) * sum(qty)
                       <= sum(qty) * sum(qty) THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM monthly GROUP BY l_partkey
    )
    SELECT a.abc, coalesce(x.xyz, 'Z') AS xyz,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM abc a LEFT JOIN xyz x ON a.l_partkey = x.l_partkey
    GROUP BY a.abc, coalesce(x.xyz, 'Z')
    """,
)
def olap_abc_xyz_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """ABC × XYZ PLANNING MATRIX — the 9-cell grid inventory policy
    actually reads (AX = automate replenishment; CZ = kill or
    make-to-order): value classes from olap_abc_classification's
    integer cross-multiplied Pareto cut joined against
    olap_xyz_classification's integer-CV variability classes (parts
    with no 1996 demand default to Z — never-moving value; months
    with no demand count as zero demand in the CV, matching the
    round-13 retarget of olap_xyz_classification — the 1994 window
    was empty on this fixture, degenerating the matrix to 3 all-Z
    rows). Both classifiers keep their pure-integer thresholds; the
    join is part-dim-sized; output is 9-bounded."""
    li = load(spark, sf, "lineitem")
    li = li.localCheckpoint(eager=False)  # feeds both classifiers
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    p = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev"))
    wc = Window.orderBy(
        F.col("rev").desc(), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    abc = p.select(
        "l_partkey",
        F.when(
            F.sum("rev").over(wc) * 5 <= F.sum("rev").over(wt) * 4, "A"
        )
        .when(
            F.sum("rev").over(wc) * 20 <= F.sum("rev").over(wt) * 19,
            "B",
        )
        .otherwise("C")
        .alias("abc"),
    )
    monthly = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("l_partkey", F.trunc("l_shipdate", "month").alias("mth"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    per = monthly.groupBy("l_partkey").agg(
        F.sum("qty").alias("s"),
        F.sum(F.col("qty") * F.col("qty")).alias("s2"),
    )
    disp = 12 * F.col("s2") - F.col("s") * F.col("s")
    xyz = per.select(
        "l_partkey",
        F.when(4 * disp <= F.col("s") * F.col("s"), "X")
        .when(disp <= F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "l_partkey", "left")
        .select("abc", F.coalesce("xyz", F.lit("Z")).alias("xyz"))
        .groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )




@query(
    "olap_supplier_diversification",
    oracle="""
    WITH per AS (
      SELECT l_partkey,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CASE WHEN n_suppliers = 1 THEN 'single'
                WHEN n_suppliers = 2 THEN 'dual'
                ELSE 'multi' END AS sourcing,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
           CAST(max(CASE WHEN n_suppliers = 1 THEN rev_cents END)
             AS BIGINT) AS max_single_part_cents
    FROM per GROUP BY 1
    """,
)
def olap_supplier_diversification(
    spark: SparkSession, sf: str
) -> DataFrame:
    """SUPPLIER DIVERSIFICATION risk census: parts bucketed by how
    many distinct suppliers actually shipped them (single-sourced =
    the supply-chain single point of failure; the revenue riding it
    is the exposure number procurement escalates). One distinct-count
    groupBy on the fact + a 3-bucket census with the worst
    single-sourced part's revenue called out. Exact cents
    throughout."""
    li = load(spark, sf, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
    bucket = (
        F.when(F.col("n_suppliers") == 1, "single")
        .when(F.col("n_suppliers") == 2, "dual")
        .otherwise("multi")
    )
    return per.groupBy(bucket.alias("sourcing")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev_cents").cast("long").alias("revenue_cents"),
        F.max(
            F.when(F.col("n_suppliers") == 1, F.col("rev_cents"))
        )
        .cast("long")
        .alias("max_single_part_cents"),
    )




@query(
    "olap_price_decile_migration",
    oracle="""
    WITH yearly AS (
      SELECT l_partkey,
             CAST(extract(year FROM l_shipdate) AS INT) AS y,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ),
    both_ AS (
      SELECT a.l_partkey, a.rev AS r_from, b.rev AS r_to
      FROM (SELECT * FROM yearly WHERE y = 1995) a
      JOIN (SELECT * FROM yearly WHERE y = 1996) b
        ON a.l_partkey = b.l_partkey
    ),
    ranked AS (
      SELECT l_partkey,
             CAST(ntile(10) OVER (ORDER BY r_from DESC, l_partkey)
               AS INT) AS d_from,
             CAST(ntile(10) OVER (ORDER BY r_to DESC, l_partkey)
               AS INT) AS d_to
      FROM both_
    )
    SELECT d_from, d_to, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(d_to - d_from AS INT) AS shift
    FROM ranked GROUP BY d_from, d_to
    """,
)
def olap_price_decile_migration(
    spark: SparkSession, sf: str
) -> DataFrame:
    """REVENUE-DECILE MIGRATION matrix: where did each part's 1995
    revenue decile move in 1996? The mobility picture behind the
    static ABC cut — a heavy diagonal means stable assortment
    economics, off-diagonal mass names the risers/decliners a buyer
    re-ranks (the markov-transition device applied to ranked value).
    Deterministic deciles via full (rev desc, partkey) tiebreaks on
    parts active in BOTH years; the census is 10×10-bounded.
    (Round 13: retargeted from 1994→1995 — the fixture's lineitem
    starts 1995-01-02, so the 1994 leg was empty and the join
    produced zero rows at every SF — and the deciles renamed
    d_from/d_to to match.)"""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    yearly = li.groupBy(
        "l_partkey", F.year("l_shipdate").cast("int").alias("y")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev")
    )
    a = yearly.filter(F.col("y") == 1995).select(
        "l_partkey", F.col("rev").alias("r_from")
    )
    b = yearly.filter(F.col("y") == 1996).select(
        "l_partkey", F.col("rev").alias("r_to")
    )
    both_ = a.join(b, "l_partkey")
    ranked = both_.select(
        F.ntile(10)
        .over(Window.orderBy(F.col("r_from").desc(), F.col("l_partkey")))
        .cast("int")
        .alias("d_from"),
        F.ntile(10)
        .over(Window.orderBy(F.col("r_to").desc(), F.col("l_partkey")))
        .cast("int")
        .alias("d_to"),
    )
    return ranked.groupBy("d_from", "d_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    ).select(
        "d_from",
        "d_to",
        "n_parts",
        (F.col("d_to") - F.col("d_from")).cast("int").alias("shift"),
    )




@query(
    "olap_aov_quarterly",
    oracle="""
    WITH q AS (
      SELECT CAST(extract(year FROM o_orderdate) AS INT) AS yr,
             CAST((extract(month FROM o_orderdate) + 2) // 3 AS INT)
               AS qtr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1997-01-01'
    ),
    per AS (
      SELECT yr, qtr, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS rev_cents
      FROM q GROUP BY yr, qtr
    )
    SELECT yr, qtr, n_orders, rev_cents,
           CAST(rev_cents // n_orders AS BIGINT) AS aov_cents,
           CAST(coalesce(
             (rev_cents // n_orders) * 1000
               // lag(rev_cents // n_orders)
                  OVER (ORDER BY yr, qtr) - 1000, 0) AS BIGINT)
             AS qoq_delta_milli
    FROM per
    """,
)
def olap_aov_quarterly(spark: SparkSession, sf: str) -> DataFrame:
    """QUARTERLY AVERAGE ORDER VALUE with quarter-over-quarter delta —
    the first line of every revenue review: exact integer AOV (cents
    DIV orders) and the QoQ change in integer milli-units off one lag
    window over the 8-quarter series (first quarter anchors at 0).
    One map-combinable groupBy; everything after is bounded. (Round
    13: window moved 1994-96 → 1995-97 — orders start 1995-01-01, so
    the old window's first four quarters were empty and the "8-quarter
    series" was really 4.)"""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    per = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
    aov = F.expr("rev_cents div n_orders")
    w = Window.orderBy("yr", "qtr")
    return per.select(
        "yr",
        "qtr",
        "n_orders",
        "rev_cents",
        aov.cast("long").alias("aov_cents"),
        F.coalesce(
            F.expr(
                "(rev_cents div n_orders) * 1000"
                " div lag(rev_cents div n_orders)"
                " over (order by yr, qtr) - 1000"
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("qoq_delta_milli"),
    )




@query(
    "olap_bcg_matrix",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             CAST(sum(CASE WHEN l.l_shipdate >= DATE '1996-01-01'
                            AND l.l_shipdate < DATE '1997-01-01'
                           THEN CAST(round(l.l_extendedprice * 100)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS r_y1,
             CAST(sum(CASE WHEN l.l_shipdate >= DATE '1997-01-01'
                            AND l.l_shipdate < DATE '1998-01-01'
                           THEN CAST(round(l.l_extendedprice * 100)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS r_y2
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= DATE '1996-01-01'
        AND l.l_shipdate < DATE '1998-01-01'
      GROUP BY 1
      HAVING sum(CASE WHEN l.l_shipdate >= DATE '1996-01-01'
                       AND l.l_shipdate < DATE '1997-01-01'
                      THEN 1 ELSE 0 END) > 0
    ),
    g AS (
      SELECT brand, r_y1, r_y2,
             (r_y2 - r_y1) * 1000 // r_y1 AS growth_milli
      FROM rev
    ),
    meds AS (
      SELECT
        (SELECT min(r_y2) FROM (
           SELECT r_y2, row_number() OVER (ORDER BY r_y2, brand) AS rk,
                  count(*) OVER () AS m FROM g)
         WHERE 2 * rk >= m + 1) AS med_share,
        (SELECT min(growth_milli) FROM (
           SELECT growth_milli,
                  row_number() OVER (ORDER BY growth_milli, brand) AS rk,
                  count(*) OVER () AS m FROM g)
         WHERE 2 * rk >= m + 1) AS med_growth
    ),
    tot AS (SELECT CAST(sum(r_y2) AS BIGINT) AS t95 FROM g)
    SELECT g.brand, g.r_y1 AS rev_y1_cents, g.r_y2 AS rev_y2_cents,
           round(CAST(g.r_y2 AS DOUBLE) / t.t95, 9) AS share_y2,
           CAST(g.growth_milli AS BIGINT) AS growth_milli,
           CASE WHEN g.r_y2 > m.med_share AND g.growth_milli > m.med_growth
                THEN 'star'
                WHEN g.r_y2 > m.med_share THEN 'cash_cow'
                WHEN g.growth_milli > m.med_growth THEN 'question_mark'
                ELSE 'dog' END AS quadrant
    FROM g, meds m, tot t
    """,
)
def olap_bcg_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """BCG GROWTH–SHARE MATRIX over part brands: 1997 revenue share vs
    1996→1997 growth (the testdata shipdate span is 1995–2001), each brand classified star / cash-cow /
    question-mark / dog against the EXACT MEDIAN brand on both axes
    (share compares as raw integer r_y2 cents — same denominator, so
    the median-share cut is an integer compare; growth is exact
    integer milli via floor-div, mirrored `//` ≡ F.floor). The
    portfolio chart every assortment review starts from. One fact
    groupBy over ~25 brands + rank windows on the brand-bounded
    table; share_y2 is the single display double, round 9."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    in_y1 = F.col("l_shipdate") < F.lit("1997-01-01").cast("date")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.when(in_y1, cents).otherwise(0)).alias("r_y1"),
            F.sum(F.when(~in_y1, cents).otherwise(0)).alias("r_y2"),
            F.sum(F.when(in_y1, 1).otherwise(0)).alias("n_y1"),
        )
        .filter(F.col("n_y1") > 0)
        .drop("n_y1")
    )
    g = rev.select(
        "brand",
        "r_y1",
        "r_y2",
        # DuckDB integer `//` truncates toward zero on negatives (NOT
        # floor) — Spark `div` has the same semantics; F.floor would be
        # off by one milli on every shrinking brand
        F.expr("(r_y2 - r_y1) * 1000 div r_y1")
        .cast("long")
        .alias("growth_milli"),
    )
    g = g.localCheckpoint(eager=False)  # consumed by medians + output

    def med(col: str):
        w = Window.orderBy(col, "brand")
        ranked = g.select(
            col,
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
        )
        return ranked.filter(2 * F.col("rk") >= F.col("m") + 1).agg(
            F.min(col).alias(f"med_{col}")
        )

    meds = med("r_y2").crossJoin(F.broadcast(med("growth_milli")))
    tot = g.agg(F.sum("r_y2").alias("t95"))
    out = g.crossJoin(F.broadcast(meds)).crossJoin(F.broadcast(tot))
    quadrant = (
        F.when(
            (F.col("r_y2") > F.col("med_r_y2"))
            & (F.col("growth_milli") > F.col("med_growth_milli")),
            "star",
        )
        .when(F.col("r_y2") > F.col("med_r_y2"), "cash_cow")
        .when(
            F.col("growth_milli") > F.col("med_growth_milli"),
            "question_mark",
        )
        .otherwise("dog")
    )
    return out.select(
        "brand",
        F.col("r_y1").alias("rev_y1_cents"),
        F.col("r_y2").alias("rev_y2_cents"),
        F.round(F.col("r_y2").cast("double") / F.col("t95"), 9).alias(
            "share_y2"
        ),
        "growth_milli",
        quadrant.alias("quadrant"),
    )




@query(
    "olap_order_value_log_histogram",
    oracle="""
    WITH d AS (
      SELECT greatest(CAST(round(o_totalprice) AS BIGINT), 1) AS dollars
      FROM orders
    ),
    b AS (
      SELECT length(bin(dollars)) AS bucket, dollars FROM d
    )
    SELECT CAST(bucket AS BIGINT) AS log2_bucket,
           CAST(power(2, bucket - 1) AS BIGINT) AS bucket_low_dollars,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(dollars) AS BIGINT) AS sum_dollars,
           CAST(min(dollars) AS BIGINT) AS min_dollars,
           CAST(max(dollars) AS BIGINT) AS max_dollars
    FROM b GROUP BY bucket
    """,
)
def olap_order_value_log_histogram(
    spark: SparkSession, sf: str
) -> DataFrame:
    """LOG₂ ORDER-VALUE HISTOGRAM — the heavy-tail profile chart
    (doubling buckets) behind pricing-tier and fraud-threshold
    reviews. The bucket is the BINARY DIGIT COUNT of the dollar
    value (length of the minimal base-2 rendering — Spark `conv` ≡
    DuckDB `bin`, verified identical), so bucket edges are EXACT at
    powers of two with no floor(log2(x)) boundary ULP risk — the
    integer device the float log would get wrong exactly at the
    edges. One map-combinable groupBy over a ~20-bucket domain."""
    o = load(spark, sf, "orders")
    dollars = F.greatest(
        F.round(F.col("o_totalprice")).cast("long"), F.lit(1).cast("long")
    )
    b = o.select(
        dollars.alias("dollars"),
        F.length(F.conv(dollars.cast("string"), 10, 2)).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("dollars").alias("sum_dollars"),
        F.min("dollars").alias("min_dollars"),
        F.max("dollars").alias("max_dollars"),
    ).select(
        F.col("bucket").cast("long").alias("log2_bucket"),
        F.pow(F.lit(2), F.col("bucket") - 1).cast("long").alias(
            "bucket_low_dollars"
        ),
        "n_orders",
        "sum_dollars",
        "min_dollars",
        "max_dollars",
    )




@query(
    "olap_order_backlog_timeline",
    oracle="""
    WITH placed AS (
      SELECT date_trunc('month', o_orderdate) AS mth,
             CAST(count(*) AS BIGINT) AS n_placed
      FROM orders GROUP BY 1
    ),
    shipped AS (
      SELECT date_trunc('month', last_ship) AS mth,
             CAST(count(*) AS BIGINT) AS n_completed
      FROM (
        SELECT o.o_orderkey, max(l.l_shipdate) AS last_ship
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY o.o_orderkey
      ) GROUP BY 1
    ),
    months AS (
      SELECT mth FROM placed UNION SELECT mth FROM shipped
    ),
    tl AS (
      SELECT m.mth,
             coalesce(p.n_placed, 0) AS n_placed,
             coalesce(s.n_completed, 0) AS n_completed
      FROM months m
      LEFT JOIN placed p ON p.mth = m.mth
      LEFT JOIN shipped s ON s.mth = m.mth
    )
    SELECT strftime(mth, '%Y-%m') AS month, n_placed, n_completed,
           CAST(sum(n_placed) OVER (ORDER BY mth)
                - sum(n_completed) OVER (ORDER BY mth) AS BIGINT)
             AS open_backlog
    FROM tl
    """,
)
def olap_order_backlog_timeline(
    spark: SparkSession, sf: str
) -> DataFrame:
    """ORDER BACKLOG BURNDOWN — monthly orders placed vs orders
    COMPLETED (status F, completion month = the month of the order's
    last line shipment) and the running open backlog, the operations
    chart behind every fulfillment-capacity review. Completion needs
    one orderkey-grain max over the fact; the timeline is a
    month-bounded full-outer month spine with two cumulative windows
    — all exact integers end to end. Orders never finished (status O/P)
    accumulate in the backlog by construction."""
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    placed = o.groupBy(
        F.trunc("o_orderdate", "month").alias("mth")
    ).agg(F.count(F.lit(1)).alias("n_placed"))
    last_ship = (
        o.filter(F.col("o_orderstatus") == "F")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    shipped = last_ship.groupBy(
        F.trunc("last_ship", "month").alias("mth")
    ).agg(F.count(F.lit(1)).alias("n_completed"))
    months = placed.select("mth").union(shipped.select("mth")).distinct()
    tl = (
        months.join(placed, "mth", "left")
        .join(shipped, "mth", "left")
        .select(
            "mth",
            F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
            F.coalesce("n_completed", F.lit(0)).alias("n_completed"),
        )
    )
    wc = Window.orderBy("mth").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tl.select(
        F.date_format("mth", "yyyy-MM").alias("month"),
        F.col("n_placed").cast("long").alias("n_placed"),
        F.col("n_completed").cast("long").alias("n_completed"),
        (F.sum("n_placed").over(wc) - F.sum("n_completed").over(wc))
        .cast("long")
        .alias("open_backlog"),
    )




@query(
    "olap_rfm_migration",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS cust,
             CASE WHEN o_orderdate < DATE '1997-01-01' THEN 1996
                  ELSE 1997 END AS yr,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS m,
             max(o_orderdate) AS last_dt
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1998-01-01'
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT cust, yr,
             ntile(4) OVER (PARTITION BY yr
               ORDER BY last_dt DESC, cust) AS r_q,
             ntile(4) OVER (PARTITION BY yr
               ORDER BY m DESC, cust) AS m_q
      FROM per
    ),
    seg AS (
      SELECT cust, yr,
             'R' || CAST(r_q AS VARCHAR) || 'M' || CAST(m_q AS VARCHAR)
               AS seg
      FROM scored
    )
    SELECT a.seg AS seg_1996, b.seg AS seg_1997,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM seg a JOIN seg b ON a.cust = b.cust
    WHERE a.yr = 1996 AND b.yr = 1997
    GROUP BY a.seg, b.seg
    """,
)
def olap_rfm_migration(spark: SparkSession, sf: str) -> DataFrame:
    """RFM SEGMENT MIGRATION 1996 → 1997 — which recency×monetary
    quartile each repeat customer moved to (the retention team's
    'who decayed out of R1M1' matrix; olap_rfm_segmentation gives the
    static cut, THIS gives the dynamics, the markov-transition device
    on customer value segments). Deterministic quartiles via full
    (metric desc, custkey) tiebreaks, per-year windows over the
    customer-grain rollup (the decile-migration scale shape: the
    global sort rides customers, not orders — range-shard past ~10⁸
    customers). Output is 16×16-bounded."""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    per = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.when(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("date"), 1996
        )
        .otherwise(1997)
        .alias("yr"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("m"),
        F.max("o_orderdate").alias("last_dt"),
    )
    wr = Window.partitionBy("yr").orderBy(
        F.col("last_dt").desc(), F.col("cust")
    )
    wm = Window.partitionBy("yr").orderBy(F.col("m").desc(), F.col("cust"))
    seg = per.select(
        "cust",
        "yr",
        F.concat(
            F.lit("R"),
            F.ntile(4).over(wr).cast("string"),
            F.lit("M"),
            F.ntile(4).over(wm).cast("string"),
        ).alias("seg"),
    )
    a = seg.filter(F.col("yr") == 1996).select(
        "cust", F.col("seg").alias("seg_1996")
    )
    b = seg.filter(F.col("yr") == 1997).select(
        "cust", F.col("seg").alias("seg_1997")
    )
    return (
        a.join(b, "cust")
        .groupBy("seg_1996", "seg_1997")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )




@query(
    "olap_brand_weekly_corr_pairs",
    oracle="""
    WITH weekly AS (
      SELECT p.p_brand AS brand,
             datediff('day', DATE '1997-01-01',
                      CAST(l.l_shipdate AS DATE)) // 7 AS wk,
             CAST(sum(CAST(round(l.l_extendedprice) AS BIGINT))
               AS BIGINT) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= DATE '1997-01-01'
        AND l.l_shipdate < DATE '1998-01-01'
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT b.brand, CAST(s.i AS BIGINT) AS wk
      FROM (SELECT DISTINCT brand FROM weekly) b,
           unnest(range(0, 52)) AS s(i)
    ),
    dense AS (
      SELECT s.brand, s.wk, coalesce(w.rev, 0) AS rev
      FROM spine s LEFT JOIN weekly w
        ON w.brand = s.brand AND w.wk = s.wk
      WHERE s.wk < 52
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.rev) AS BIGINT) AS sx,
             CAST(sum(b.rev) AS BIGINT) AS sy,
             CAST(sum(a.rev * b.rev) AS BIGINT) AS sxy,
             CAST(sum(a.rev * a.rev) AS BIGINT) AS sxx,
             CAST(sum(b.rev * b.rev) AS BIGINT) AS syy
      FROM dense a JOIN dense b
        ON a.wk = b.wk AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           round((sxy - CAST(sx AS DOUBLE) * sy / n)
                 / sqrt((sxx - CAST(sx AS DOUBLE) * sx / n)
                        * (syy - CAST(sy AS DOUBLE) * sy / n)), 9)
             AS weekly_corr
    FROM pairs
    QUALIFY row_number() OVER (
      ORDER BY (sxy - CAST(sx AS DOUBLE) * sy / n)
               / sqrt((sxx - CAST(sx AS DOUBLE) * sx / n)
                      * (syy - CAST(sy AS DOUBLE) * sy / n)),
               brand_a, brand_b) <= 20
    """,
)
def olap_brand_weekly_corr_pairs(
    spark: SparkSession, sf: str
) -> DataFrame:
    """BRAND CANNIBALIZATION SCREEN — the 20 most NEGATIVELY
    correlated brand pairs on dense 1997 weekly revenue (zero-filled
    weeks included: absence is signal). Persistent negative weekly
    correlation between two brands is the classic substitution
    fingerprint a category manager investigates. All Pearson moments
    are EXACT BIGINT dollars over the week-grain pair join (brand² ×
    52 rows — brand-bounded, never fact-scale); the correlation is a
    mirrored single expression, round 9, with full tiebreaks on the
    bottom-20 cut."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    wk = F.expr(
        "datediff(cast(l_shipdate as date), date'1997-01-01') div 7"
    )
    weekly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), wk.alias("wk"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice")).cast("long")).alias(
                "rev"
            )
        )
    )
    weekly = weekly.localCheckpoint(eager=False)  # consumed twice
    spine = (
        weekly.select("brand")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(52).select(F.col("id").alias("wk"))
            )
        )
    )
    dense = spine.join(weekly, ["brand", "wk"], "left").select(
        "brand", "wk", F.coalesce("rev", F.lit(0)).alias("rev")
    )
    a = dense.select(
        F.col("brand").alias("brand_a"), "wk", F.col("rev").alias("ra")
    )
    b = dense.select(
        F.col("brand").alias("brand_b"), "wk", F.col("rev").alias("rb")
    )
    pairs = (
        a.join(b, "wk")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ra").alias("sx"),
            F.sum("rb").alias("sy"),
            F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
            F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
            F.sum(F.col("rb") * F.col("rb")).alias("syy"),
        )
    )
    corr = (
        F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    ) / F.sqrt(
        (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
        * (
            F.col("syy")
            - F.col("sy").cast("double") * F.col("sy") / F.col("n")
        )
    )
    w = Window.orderBy(corr.asc(), F.col("brand_a"), F.col("brand_b"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "brand_a", "brand_b", F.round(corr, 9).alias("weekly_corr")
        )
    )




@query(
    "olap_nation_assortment_jaccard",
    oracle="""
    WITH bought AS (
      SELECT DISTINCT c.c_nationkey AS nation, l.l_partkey AS part
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_shipdate >= DATE '1997-01-01'
        AND l.l_shipdate < DATE '1998-01-01'
    ),
    sizes AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS sz
      FROM bought GROUP BY nation
    ),
    inter AS (
      SELECT a.nation AS nation_a, b.nation AS nation_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM bought a JOIN bought b
        ON a.part = b.part AND a.nation < b.nation
      GROUP BY 1, 2
    )
    SELECT i.nation_a, i.nation_b, sa.sz AS n_parts_a, sb.sz AS n_parts_b,
           i.inter AS n_common,
           round(CAST(i.inter AS DOUBLE)
                 / (sa.sz + sb.sz - i.inter), 9) AS assortment_jaccard
    FROM inter i
    JOIN sizes sa ON sa.nation = i.nation_a
    JOIN sizes sb ON sb.nation = i.nation_b
    """,
)
def olap_nation_assortment_jaccard(
    spark: SparkSession, sf: str
) -> DataFrame:
    """NATION ASSORTMENT OVERLAP — Jaccard similarity of the part sets
    each customer nation bought in 1997: the market-similarity matrix
    behind 'can we reuse this nation's pricing/forecast model there'.
    The pair generation is an EQUI-JOIN on part (the inverted-index
    shape — pair work is Σ per-part nation-count², never nations ×
    facts); sets are distinct-deduped first; Jaccard is one mirrored
    division off exact BIGINT set sizes, round 9. Output is
    nation²-bounded."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    ).select("l_orderkey", "l_partkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    bought = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    bought = bought.localCheckpoint(eager=False)  # consumed twice
    sizes = bought.groupBy("nation").agg(F.count(F.lit(1)).alias("sz"))
    a = bought.select(F.col("nation").alias("nation_a"), "part")
    b = bought.select(F.col("nation").alias("nation_b"), "part")
    inter = (
        a.join(b, "part")
        .filter(F.col("nation_a") < F.col("nation_b"))
        .groupBy("nation_a", "nation_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("nation").alias("nation_a"), F.col("sz").alias("n_parts_a")
    )
    sb = sizes.select(
        F.col("nation").alias("nation_b"), F.col("sz").alias("n_parts_b")
    )
    return (
        inter.join(F.broadcast(sa), "nation_a")
        .join(F.broadcast(sb), "nation_b")
        .select(
            "nation_a",
            "nation_b",
            "n_parts_a",
            "n_parts_b",
            F.col("inter").cast("long").alias("n_common"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_parts_a") + F.col("n_parts_b") - F.col("inter")),
                9,
            ).alias("assortment_jaccard"),
        )
    )




@query(
    "olap_weekday_hour_heatmap",
    oracle="""
    WITH cells AS (
      SELECT dayofweek(ts) + 1 AS dow, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(dow AS BIGINT) AS dow, hr, n_events, cents,
           round(CAST(n_events AS DOUBLE)
                 / sum(n_events) OVER (PARTITION BY dow), 9)
             AS dow_share,
           CAST(row_number() OVER (PARTITION BY dow
             ORDER BY n_events DESC, hr) AS BIGINT) = 1 AS is_peak_hour
    FROM cells
    """,
)
def olap_weekday_hour_heatmap(spark: SparkSession, sf: str) -> DataFrame:
    """WEEKDAY × HOUR TRAFFIC HEATMAP with per-weekday shares and the
    peak-hour flag — the capacity-planning panel every on-call
    dashboard opens with (the value-bucket histogram2d's temporal
    twin). One map-combinable groupBy over a 7×24-bounded domain, a
    dim-sized share window, and a deterministic peak pick with full
    tiebreaks; counts and cents exact BIGINTs. The dow+1 shift aligns
    Spark's Sunday=1 with DuckDB's Sunday=0 (the chi2_type_dow
    convention)."""
    e = load(spark, sf, "events")
    cells = e.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    wd = Window.partitionBy("dow")
    wp = Window.partitionBy("dow").orderBy(
        F.col("n_events").desc(), F.col("hr")
    )
    return cells.select(
        "dow",
        "hr",
        "n_events",
        "cents",
        F.round(
            F.col("n_events").cast("double") / F.sum("n_events").over(wd),
            9,
        ).alias("dow_share"),
        (F.row_number().over(wp) == 1).alias("is_peak_hour"),
    )




@query(
    "olap_price_endings_profile",
    oracle="""
    WITH e AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending
      FROM orders
    ),
    cnt AS (
      SELECT ending, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY ending
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS k FROM cnt)
    SELECT c.ending, c.n,
           round(CAST(c.n AS DOUBLE) / t.t, 9) AS share,
           round((c.n - CAST(t.t AS DOUBLE) / t.k)
                 * (c.n - CAST(t.t AS DOUBLE) / t.k)
                 / (CAST(t.t AS DOUBLE) / t.k), 9) AS chi2_term,
           CAST(row_number() OVER (ORDER BY c.n DESC, c.ending)
             AS BIGINT) AS popularity_rank
    FROM cnt c, tot t
    """,
)
def olap_price_endings_profile(
    spark: SparkSession, sf: str
) -> DataFrame:
    """PRICE-ENDING PROFILE — the cents-digit histogram of order
    totals with per-ending χ² terms against uniform and a popularity
    rank: psychological-pricing (.99) and rounding-artifact detection
    (synthetic/generated money values are uniform; human-set prices
    never are — sum the terms against χ²₉₉ to test). One
    map-combinable groupBy over a 100-value domain; everything
    integer until the mirrored display doubles."""
    o = load(spark, sf, "orders")
    ending = (
        F.round(F.col("o_totalprice") * 100).cast("long") % 100
    ).alias("ending")
    cnt = o.select(ending).groupBy("ending").agg(
        F.count(F.lit(1)).alias("n")
    )
    cnt = cnt.localCheckpoint(eager=False)  # consumed twice
    tot = cnt.agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("k")
    )
    j = cnt.crossJoin(F.broadcast(tot))
    exp = F.col("t").cast("double") / F.col("k")
    wr = Window.orderBy(F.col("n").desc(), F.col("ending"))
    return j.select(
        "ending",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.col("t"), 9).alias("share"),
        F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 9).alias(
            "chi2_term"
        ),
        F.row_number().over(wr).cast("long").alias("popularity_rank"),
    )




@query(
    "olap_discount_response_curve",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(round(l_extendedprice) AS BIGINT) AS price
      FROM lineitem
    ),
    per AS (
      SELECT discount_pct,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(qty) AS BIGINT) AS total_qty,
             CAST(sum(price) AS BIGINT) AS revenue_dollars
      FROM b GROUP BY discount_pct
    )
    SELECT discount_pct, n_lines, total_qty, revenue_dollars,
           round(CAST(total_qty AS DOUBLE) / n_lines, 9) AS mean_qty,
           CASE WHEN lag(CAST(total_qty AS DOUBLE) / n_lines)
                       OVER (ORDER BY discount_pct) IS NULL THEN NULL
                ELSE CAST(total_qty AS DOUBLE) / n_lines
                     < lag(CAST(total_qty AS DOUBLE) / n_lines)
                       OVER (ORDER BY discount_pct)
           END AS monotonicity_violation
    FROM per
    """,
)
def olap_discount_response_curve(
    spark: SparkSession, sf: str
) -> DataFrame:
    """DISCOUNT RESPONSE CURVE — mean line quantity at each discount
    level with per-step monotonicity flags: deeper discounts should
    move MORE units, and a violation step is either a pricing-data
    bug or a segment mix-shift worth a look (the stair-step
    diagnostic behind the elasticity op's single coefficient). One
    map-combinable groupBy over the 11-level discount domain; means
    are single mirrored divisions; the flag compares the same two
    doubles both engines computed, via one lag window."""
    li = load(spark, sf, "lineitem")
    b = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias(
            "discount_pct"
        ),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice")).cast("long").alias("price"),
    )
    per = b.groupBy("discount_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty").alias("total_qty"),
        F.sum("price").alias("revenue_dollars"),
    )
    mean_qty = F.col("total_qty").cast("double") / F.col("n_lines")
    wl = Window.orderBy("discount_pct")
    prev_mean = F.lag(mean_qty).over(wl)
    return per.select(
        "discount_pct",
        "n_lines",
        "total_qty",
        "revenue_dollars",
        F.round(mean_qty, 9).alias("mean_qty"),
        F.when(prev_mean.isNull(), F.lit(None).cast("boolean"))
        .otherwise(mean_qty < prev_mean)
        .alias("monotonicity_violation"),
    )




@query(
    "olap_user_accumulation_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT first_day, CAST(count(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY first_day
    ),
    ev_day AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    )
    SELECT strftime(e.d, '%Y-%m-%d') AS day, e.n_events,
           CAST(coalesce(p.n_new, 0) AS BIGINT) AS n_new_users,
           CAST(sum(coalesce(p.n_new, 0)) OVER (ORDER BY e.d) AS BIGINT)
             AS cumulative_users,
           CAST(sum(e.n_events) OVER (ORDER BY e.d) AS BIGINT)
             AS cumulative_events
    FROM ev_day e LEFT JOIN per_day p ON p.first_day = e.d
    """,
)
def olap_user_accumulation_curve(
    spark: SparkSession, sf: str
) -> DataFrame:
    """USER ACCUMULATION CURVE — cumulative distinct users vs
    cumulative events by day (the species-accumulation / 'is our
    audience still growing or are we resampling the same users'
    chart, and the denominator sanity for every DAU metric). The
    exact cumulative-distinct needs NO running set: distinct-by-day-d
    = count of users whose FIRST day ≤ d, so one user-grain min, one
    day rollup, and a day-bounded cumulative window — the same
    decomposition trick as the rolling-distinct fan-out, here for the
    unbounded-window case."""
    e = load(spark, sf, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    per_day = firsts.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    ev_day = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    j = ev_day.join(
        per_day, ev_day.d == per_day.first_day, "left"
    ).select(
        "d",
        "n_events",
        F.coalesce("n_new", F.lit(0)).alias("n_new_users"),
    )
    wc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_new_users").cast("long").alias("n_new_users"),
        F.sum("n_new_users").over(wc).cast("long").alias(
            "cumulative_users"
        ),
        F.sum("n_events").over(wc).cast("long").alias(
            "cumulative_events"
        ),
    )




@query(
    "olap_price_index_laspeyres_paasche",
    oracle="""
    WITH per AS (
      SELECT l_partkey AS part,
             CASE WHEN l_shipdate < DATE '1997-01-01' THEN 0 ELSE 1 END
               AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS rev_cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1998-01-01'
      GROUP BY 1, 2
    ),
    both_ AS (
      SELECT a.part,
             a.rev_cents AS r0, a.qty AS q0,
             b.rev_cents AS r1, b.qty AS q1
      FROM per a JOIN per b ON a.part = b.part
      WHERE a.yr = 0 AND b.yr = 1 AND a.qty > 0 AND b.qty > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(r0) AS BIGINT) AS sum_p0q0,
             CAST(sum(r1) AS BIGINT) AS sum_p1q1,
             list_reduce(list_sort(list(
               round(CAST(r1 AS DOUBLE) * q0 / q1, 6))),
               (x, y) -> x + y) AS sum_p1q0,
             list_reduce(list_sort(list(
               round(CAST(r0 AS DOUBLE) * q1 / q0, 6))),
               (x, y) -> x + y) AS sum_p0q1
      FROM both_
    )
    SELECT n_parts, sum_p0q0 AS base_rev_cents, sum_p1q1 AS cur_rev_cents,
           round(sum_p1q0 / sum_p0q0, 9) AS laspeyres_index,
           round(CAST(sum_p1q1 AS DOUBLE) / sum_p0q1, 9) AS paasche_index,
           round(sqrt((sum_p1q0 / sum_p0q0)
                      * (CAST(sum_p1q1 AS DOUBLE) / sum_p0q1)), 9)
             AS fisher_index
    FROM s
    """,
)
def olap_price_index_laspeyres_paasche(
    spark: SparkSession, sf: str
) -> DataFrame:
    """LASPEYRES / PAASCHE / FISHER PRICE INDICES 1996 → 1997 over the
    parts traded in both years — 'did prices move, holding the basket
    fixed' (Laspeyres: base-year quantities; Paasche: current-year;
    Fisher: their geometric mean) — the inflation decomposition
    behind every revenue-bridge review. Per-part unit prices are kept
    as exact rational rev/qty pairs; the cross terms p₁q₀ = r₁·q₀/q₁
    are single mirrored doubles pre-rounded at 6 and folded SORTED;
    the indices are mirrored expression ladders, round 9. One fact
    groupBy + a part-grain self-join."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    per = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.when(
            F.col("l_shipdate") < F.lit("1997-01-01").cast("date"), 0
        )
        .otherwise(1)
        .alias("yr"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "rev_cents"
        ),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )
    a = per.filter((F.col("yr") == 0) & (F.col("qty") > 0)).select(
        "part", F.col("rev_cents").alias("r0"), F.col("qty").alias("q0")
    )
    b = per.filter((F.col("yr") == 1) & (F.col("qty") > 0)).select(
        "part", F.col("rev_cents").alias("r1"), F.col("qty").alias("q1")
    )
    both_ = a.join(b, "part")
    p1q0 = F.round(
        F.col("r1").cast("double") * F.col("q0") / F.col("q1"), 6
    )
    p0q1 = F.round(
        F.col("r0").cast("double") * F.col("q1") / F.col("q0"), 6
    )

    def fold(col: str):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    s = both_.select(
        "r0", "r1", p1q0.alias("t10"), p0q1.alias("t01")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("r0").cast("long").alias("sum_p0q0"),
        F.sum("r1").cast("long").alias("sum_p1q1"),
        fold("t10").alias("sum_p1q0"),
        fold("t01").alias("sum_p0q1"),
    )
    lasp = F.col("sum_p1q0") / F.col("sum_p0q0")
    paas = F.col("sum_p1q1").cast("double") / F.col("sum_p0q1")
    return s.select(
        "n_parts",
        F.col("sum_p0q0").alias("base_rev_cents"),
        F.col("sum_p1q1").alias("cur_rev_cents"),
        F.round(lasp, 9).alias("laspeyres_index"),
        F.round(paas, 9).alias("paasche_index"),
        F.round(F.sqrt(lasp * paas), 9).alias("fisher_index"),
    )




@query(
    "olap_herfindahl_nation_revenue",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(pc.cents) AS BIGINT) AS cents
      FROM per_cust pc
      JOIN customer c ON pc.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT region, CAST(sum(cents) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS k
      FROM rev GROUP BY region
    ),
    terms AS (
      SELECT rev.region, k,
             round((CAST(cents AS DOUBLE) / t)
                   * (CAST(cents AS DOUBLE) / t), 12) AS s2
      FROM rev JOIN tot USING (region)
    )
    SELECT region,
           max(k) AS n_nations,
           round(list_reduce(list_sort(list(s2)), (a, b) -> a + b), 9)
             AS hhi,
           round(1.0 / list_reduce(list_sort(list(s2)), (a, b) -> a + b),
                 9) AS effective_nations
    FROM terms GROUP BY region
    """,
)
def olap_herfindahl_nation_revenue(
    spark: SparkSession, sf: str
) -> DataFrame:
    """HERFINDAHL–HIRSCHMAN INDEX of revenue concentration across
    nations within each region — the one-number 'is this market five
    players or one player wearing five flags' readout that sits next
    to the Gini/Lorenz pair in every concentration review, plus its
    1/HHI effective-nation count. Revenue folds customer-grain first
    (orders groupBy custkey — map-combinable, then a custkey-aligned
    join instead of dragging raw orders through the dim chain);
    nation/region broadcast; the squared shares pre-round at 12 and
    fold SORTED per region, round 9."""
    o = load(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load(spark, sf, "region").select("r_regionkey", "r_name")
    rev = (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("cents").alias("cents"))
    )
    tot = rev.groupBy("region").agg(
        F.sum("cents").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    share = F.col("cents").cast("double") / F.col("t")
    terms = rev.join(F.broadcast(tot), "region").select(
        "region", "k", F.round(share * share, 12).alias("s2")
    )
    fold = F.aggregate(
        F.array_sort(F.collect_list("s2")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return terms.groupBy("region").agg(
        F.max("k").alias("n_nations"),
        F.round(fold, 9).alias("hhi"),
        F.round(F.lit(1.0) / fold, 9).alias("effective_nations"),
    )


__all__ = sorted(n for n in dir() if not n.startswith("__"))
