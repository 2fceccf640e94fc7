"""Catalog family: statistical tests, effect sizes, calibration and inference audits.

Mechanically split from the monolithic plans/catalog.py (round
12); query definition order within the family is the original
file order, and all shared helpers come from ``_qshared``.
"""

from __future__ import annotations

from ._qshared import *  # noqa: F401,F403




@query(
    "stats_moments",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents
      FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, n, sum_cents, sumsq_cents,
           CAST(sum_cents AS DOUBLE) / n AS mean_cents,
           CAST(sumsq_cents AS DOUBLE) / n
             - (CAST(sum_cents AS DOUBLE) / n) * (CAST(sum_cents AS DOUBLE) / n)
             AS var_cents
    FROM m
    """,
)
def stats_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution moments with EXACT integer accumulation (Σx, Σx² in
    cents) and identically-derived float mean/variance — the
    cross-engine-safe way to do numeric profiling (native avg/stddev
    accumulate floats in engine-specific orders)."""
    e = load(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    m = e.select("event_type", cents.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sum_cents"),
        F.sum(F.col("c") * F.col("c")).alias("sumsq_cents"),
    )
    mean = F.col("sum_cents").cast("double") / F.col("n")
    return m.select(
        "event_type", "n", "sum_cents", "sumsq_cents",
        mean.alias("mean_cents"),
        (F.col("sumsq_cents").cast("double") / F.col("n") - mean * mean).alias(
            "var_cents"
        ),
    )




@query(
    "stats_key_skew",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS total, CAST(max(n) AS BIGINT) AS max_n,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM f
    )
    SELECT n_keys, total, max_n,
           CAST(max_n AS DOUBLE) * n_keys / total AS skew_factor
    FROM t
    """,
)
def stats_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-planning diagnostic: hottest-key share vs uniform
    (skew_factor = max·keys/total; 1.0 = perfectly uniform). The number
    that decides between a plain shuffle, AQE skew-join, and manual
    salting (agg_salted_twophase) before a 100 TB job runs."""
    e = load(spark, sf, "events")
    f = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t = f.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total"),
        F.max("n").alias("max_n"),
    )
    return t.select(
        "n_keys", "total", "max_n",
        (F.col("max_n").cast("double") * F.col("n_keys") / F.col("total")).alias(
            "skew_factor"
        ),
    )




@query(
    "stats_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 5.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(value) AS DOUBLE) AS bin_min,
           CAST(max(value) AS DOUBLE) AS bin_max
    FROM events
    GROUP BY event_type, floor(value / 5.0)
    """,
)
def stats_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram per event type (the distribution profile
    behind data-quality dashboards and drift checks): bin assignment is
    a pure projection, so the whole histogram is ONE map-side-combinable
    aggregate — output is |types| × |bins| rows regardless of input
    size. min/max per bin are order-independent, so floats stay exact."""
    e = load(spark, sf, "events")
    return (
        e.withColumn("bin", F.floor(F.col("value") / 5.0).cast("long"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("bin_min"),
            F.max("value").alias("bin_max"),
        )
    )




@query(
    "stats_entropy_per_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), t AS (
      SELECT user_id, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY user_id
    ), p AS (
      SELECT c.user_id, c.event_type,
             CAST(c.n AS DOUBLE) / t.tot AS prob
      FROM c JOIN t USING (user_id)
    )
    SELECT user_id,
           round(-list_reduce(list_sort(list(prob * ln(prob))), (x, y) -> x + y),
                 12) AS entropy_nats
    FROM p GROUP BY user_id
    """,
)
def stats_entropy_per_user(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    label-diversity metric a curation pipeline uses to spot degenerate
    sources. Float discipline: the sum folds smallest-first (array_sort
    + sequential aggregate ≡
    list_sort + list_reduce). ln() itself is the one op the platforms
    round differently (java.lang.Math.log vs libm, each ≤1 ulp), so the
    result rounds to 12 decimals on both sides — the same rationale as
    drift.psi_contrib."""
    e = load(spark, sf, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = c.join(t, on="user_id").select(
        "user_id",
        (F.col("n").cast("double") / F.col("tot")).alias("prob"),
    )
    term = F.col("prob") * F.log(F.col("prob"))
    return (
        p.select("user_id", term.alias("_t"))
        .groupBy("user_id")
        .agg(
            F.round(
                -F.aggregate(
                    F.array_sort(F.collect_list("_t")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                12,
            ).alias("entropy_nats")
        )
    )




@query(
    "stats_chi2_type_dow",
    oracle="""
    WITH o AS (
      SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY event_type, dayofweek(ts)
    ), m AS (
      SELECT o.*,
             CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
             CAST(sum(obs) OVER (PARTITION BY dow) AS BIGINT) AS col_tot,
             CAST(sum(obs) OVER () AS BIGINT) AS grand
      FROM o
    ), terms AS (
      SELECT event_type, dow,
             (CAST(obs AS DOUBLE)
              - CAST(row_tot AS DOUBLE) * col_tot / grand)
             * (CAST(obs AS DOUBLE)
                - CAST(row_tot AS DOUBLE) * col_tot / grand)
             / (CAST(row_tot AS DOUBLE) * col_tot / grand) AS term
      FROM m
    )
    SELECT list_reduce(list_sort(list(term)), (x, y) -> x + y) AS chi2,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM terms
    """,
)
def stats_chi2_type_dow(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence statistic for event_type × day-of-week —
    the seasonality/independence check over a contingency table that
    never leaves the cluster: exact integer margins via three window
    sums over the |types|×7 cell table, one float term per cell
    (identical expression tree both engines), smallest-first fold.
    Day numbering differs (Spark Sunday=1, DuckDB Sunday=0 — the
    oracle shifts by +1); the statistic is relabeling-invariant but the
    labels align for anyone extending the output."""
    e = load(spark, sf, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wg = Window.partitionBy()
    m = o.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(wr).alias("row_tot"),
        F.sum("obs").over(wc).alias("col_tot"),
        F.sum("obs").over(wg).alias("grand"),
    )
    exp = (
        F.col("row_tot").cast("double") * F.col("col_tot") / F.col("grand")
    )
    term = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    return (
        m.select(term.alias("_t"))
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("_t")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("chi2"),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )




@query(
    "stats_covar_corr",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxy,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx,
             CAST(sum(CAST(hour(ts) AS BIGINT)
                      * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)
             AS covar_pop,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             AS corr
    FROM m
    """,
)
def stats_covar_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Population covariance and Pearson correlation of (value cents,
    hour-of-day) per event type — computed from EXACT integer moments
    (n, Σx, Σy, Σxy, Σx², Σy²) so the only float ops are the final
    divisions/sqrts on identical integers. The built-in covar_pop/corr
    use streaming merge formulas whose float accumulation order is
    partition-dependent — fine numerically, but not bit-reproducible
    across engines; the moment decomposition is, and it is exactly the
    map-side-combinable shape a 100 TB aggregation wants (six longs per
    group). Overflow bound: |cents| ≤ 10^5, n ≤ 10^12 rows/group fits
    int64 for Σx²."""
    e = load(spark, sf, "events")
    x = F.round(F.col("value") * 100).cast("long")
    y = F.hour("ts").cast("long")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return m.select(
        "event_type",
        "n",
        (num / (F.col("n").cast("double") * F.col("n"))).alias("covar_pop"),
        (
            num
            / (
                F.sqrt(
                    (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                        "double"
                    )
                )
            )
        ).alias("corr"),
    )




@query(
    "stats_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
    SELECT digit, n,
           CAST(n AS DOUBLE) / tot AS observed_share,
           round(log10(1.0 + 1.0 / digit), 12) AS benford_expected
    FROM c, t
    """,
)
def stats_benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / unit-mixing smell test for an ingested fact
    column. The digit comes from the integer-cents string (double→int
    cents is the engine-identical device used by mv_incremental), so
    binning is exact; the expected share log10(1+1/d) is the only
    float and rounds at 12 decimals. One 9-group map-combinable
    aggregate + a scalar total — free at any scale."""
    o = load(spark, sf, "orders")
    c = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("tot"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("observed_share"),
        F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 12).alias(
            "benford_expected"
        ),
    )




@query(
    "stats_gini_by_nation",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT c.c_custkey, c.c_nationkey, COALESCE(rev.cents, 0) AS cents
      FROM customer c LEFT JOIN rev ON rev.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT c_nationkey, cents,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY cents, c_custkey) AS BIGINT) AS i
      FROM cust
    ),
    m AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(i * cents) AS BIGINT) AS siw
      FROM ranked GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           CAST(2 * siw AS DOUBLE) / (n * s)
             - CAST(n + 1 AS DOUBLE) / n AS gini
    FROM m WHERE s > 0
    """,
)
def stats_gini_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of customer revenue per nation — the
    concentration audit a pipeline runs to spot sources where a few
    keys carry all the volume (the skew early-warning for the salted
    paths). Exact discipline: revenue in integer cents, the rank-sum
    Σi·xᵢ in exact integers (tie order is irrelevant to the sum —
    permuting equal values across ranks changes nothing), and the
    final Gini exactly two float ops evaluated identically on both
    engines. Rank rides a window PARTITIONED by nation — distributed
    across groups, never a global sort."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    cust = c.join(rev, c["c_custkey"] == rev["o_custkey"], "left").select(
        "c_custkey",
        "c_nationkey",
        F.coalesce("cents", F.lit(0)).alias("cents"),
    )
    wi = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    ranked = cust.select(
        "c_nationkey",
        "cents",
        F.row_number().over(wi).cast("long").alias("i"),
    )
    m = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("i") * F.col("cents")).alias("siw"),
    )
    return m.filter(F.col("s") > 0).select(
        "c_nationkey",
        "n",
        (
            (2 * F.col("siw")).cast("double") / (F.col("n") * F.col("s"))
            - (F.col("n") + 1).cast("double") / F.col("n")
        ).alias("gini"),
    )




@query(
    "stats_ab_test_proportions",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                                  1, 8)) AS BIGINT) % 2 AS variant,
             CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END)
                       > sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM assign GROUP BY variant
    ),
    w AS (
      SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 0 THEN conv END) AS c0,
             max(CASE WHEN variant = 1 THEN n END) AS n1,
             max(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM arms
    )
    SELECT n0, c0, n1, c1,
           CAST(c0 AS DOUBLE) / n0 AS p0,
           CAST(c1 AS DOUBLE) / n1 AS p1,
           CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                ELSE round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 12) END AS z_score
    FROM w
    """,
)
def stats_ab_test_proportions(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test on a deterministic 50/50 user split (md5
    device as the bucketing hash an experiment platform would use) —
    the A/B readout every event pipeline serves. Per-user conversion
    collapses first (one map-combinable groupBy — users, not events,
    enter the test), arms pivot to one row, and the z statistic is a
    handful of float ops on exact integers, rounded at 12 (sqrt ULP).
    The null split should land |z| ≈ 0-2 — an excursion flags a broken
    bucketing hash."""
    e = load(spark, sf, "events")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    n_purch = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    )
    n_view = F.sum(
        F.when(F.col("event_type") == "view", 1).otherwise(0)
    )
    assign = e.groupBy("user_id").agg(
        F.when(n_purch > n_view, 1).otherwise(0).cast("long").alias(
            "converted"
        ),
    ).withColumn("variant", u32 % 2)
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p0 - p1) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    degenerate = (
        (F.col("c0") + F.col("c1") == 0)
        | (F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1"))
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        p0.alias("p0"), p1.alias("p1"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z, 12))
        .alias("z_score"),
    )




@query(
    "stats_exact_median_twopass",
    oracle="""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
    FROM v
    """,
)
def stats_exact_median_twopass(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT global median (lower median, k = (n−1)//2 zero-indexed)
    of the fact's price column WITHOUT a global sort — the selection
    device that survives 100 TB:

    - pass 1: integer-cents histogram on $100 buckets (map-combinable
      groupBy, dim-sized) collected to the driver (|buckets| rows,
      bounded by the price domain / bucket width, NOT by n). n, k, and
      the target bucket all derive from that one table — no separate
      count() scan;
    - pass 2: re-scan ONLY that bucket's rows (pushdown-friendly
      range filter) and take the (k − preceding)-th smallest with
      orderBy+limit — a sort over one bucket's population, never the
      table.

    NOTE: like every driver-selection query (see _select_kth), this
    executes Spark jobs at DataFrame-construction time — `explain`
    on it runs the selection passes before printing a plan.

    The oracle does the naive quantile; hash parity proves the
    decomposition selects the identical element."""
    li = load(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    hist = sorted(
        (r["bkt"], r["cnt"])
        for r in li.withColumn("bkt", F.expr("cents DIV 10000"))
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n_total = sum(c for _, c in hist)
    if n_total == 0:
        return spark.range(1).select(
            F.lit(0).cast("long").alias("n"),
            F.lit(None).cast("long").alias("median_cents"),
        )
    k = (n_total - 1) // 2  # zero-indexed lower median
    before = 0
    for bkt, cnt in hist:
        if before + cnt > k:
            break
        before += cnt
    in_bucket = li.filter(F.expr("cents DIV 10000") == bkt)
    median = (
        in_bucket.orderBy("cents")
        .limit(int(k - before) + 1)
        .agg(F.max("cents").alias("median_cents"))
    )
    return median.select(
        F.lit(n_total).cast("long").alias("n"), "median_cents"
    )




@query(
    "stats_mad_robust",
    oracle="""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    m AS (SELECT CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med FROM v)
    SELECT CAST(count(*) AS BIGINT) AS n,
           (SELECT med FROM m) AS median_cents,
           CAST(quantile_disc(abs(cents - (SELECT med FROM m)), 0.5)
                AS BIGINT) AS mad_cents
    FROM v
    """,
)
def stats_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    """Median absolute deviation — the outlier-immune dispersion a
    quality gate trusts where stddev saturates on one bad row: two
    applications of the two-pass selection device (_select_kth), each
    a histogram groupBy + a one-bucket re-scan, all integer cents.
    No global sort at either step; driver traffic is two scalars."""
    li = load(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    med = _select_kth(li, "cents", 10000)
    if med is None:  # empty input: match the oracle's (0, NULL, NULL)
        return spark.range(1).select(
            F.lit(0).cast("long").alias("n"),
            F.lit(None).cast("long").alias("median_cents"),
            F.lit(None).cast("long").alias("mad_cents"),
        )
    dev = li.select(
        F.abs(F.col("cents") - F.lit(med)).alias("cents")
    )
    mad = _select_kth(dev, "cents", 10000)
    return li.agg(F.count(F.lit(1)).alias("n")).select(
        "n",
        F.lit(med).cast("long").alias("median_cents"),
        F.lit(mad).cast("long").alias("mad_cents"),
    )




@query(
    "stats_welch_ttest",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
                 CAST(sum(cents) AS BIGINT) AS s_a,
                 CAST(sum(cents * cents) AS BIGINT) AS q_a
          FROM v WHERE event_type = 'click'),
    b AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
                 CAST(sum(cents) AS BIGINT) AS s_b,
                 CAST(sum(cents * cents) AS BIGINT) AS q_b
          FROM v WHERE event_type = 'purchase'),
    m AS (
      SELECT n_a, n_b,
             CAST(s_a AS DOUBLE) / n_a AS mean_a,
             CAST(s_b AS DOUBLE) / n_b AS mean_b,
             (CAST(q_a AS DOUBLE)
               - CAST(n_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)
                 * (CAST(s_a AS DOUBLE) / n_a)) / (n_a - 1) AS var_a,
             (CAST(q_b AS DOUBLE)
               - CAST(n_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)
                 * (CAST(s_b AS DOUBLE) / n_b)) / (n_b - 1) AS var_b
      FROM a, b
    ),
    w AS (
      SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
             var_a / n_a + var_b / n_b AS se2
      FROM m
    )
    SELECT n_a, n_b,
           round(mean_a, 12) AS mean_a, round(mean_b, 12) AS mean_b,
           round((mean_a - mean_b) / sqrt(se2), 12) AS t_stat,
           round(se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                 + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 12)
             AS df_welch,
           abs((mean_a - mean_b) / sqrt(se2)) > 1.96 AS significant_05
    FROM w
    """,
)
def stats_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test for a DIFFERENCE OF MEANS —
    the metric-experiment companion to stats_ab_test_proportions
    (which tests rates): click vs purchase event values. Accumulation
    is exact integer cents (Σx, Σx² as BIGINT — native stddev would
    fold floats in engine order), then mean/variance/t/Welch-
    Satterthwaite df derive through float expressions mirrored
    token-for-token in the oracle, rounded at 12. One pass over the
    filtered fact (two partial aggs), a two-row reduce — nothing here
    grows with data size except the scan."""
    e = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")

    def side(t: str, sfx: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == t)
            .select(cents.alias("c"))
            .agg(
                F.count(F.lit(1)).alias(f"n_{sfx}"),
                F.sum("c").alias(f"s_{sfx}"),
                F.sum(F.col("c") * F.col("c")).alias(f"q_{sfx}"),
            )
        )

    m = side("click", "a").crossJoin(side("purchase", "b"))
    mean_a = F.col("s_a").cast("double") / F.col("n_a")
    mean_b = F.col("s_b").cast("double") / F.col("n_b")
    var_a = (
        F.col("q_a").cast("double")
        - F.col("n_a").cast("double") * mean_a * mean_a
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("q_b").cast("double")
        - F.col("n_b").cast("double") * mean_b * mean_b
    ) / (F.col("n_b") - 1)
    se2 = var_a / F.col("n_a") + var_b / F.col("n_b")
    t_raw = (mean_a - mean_b) / F.sqrt(se2)
    df_w = (
        se2
        * se2
        / (
            (var_a / F.col("n_a")) * (var_a / F.col("n_a"))
            / (F.col("n_a") - 1)
            + (var_b / F.col("n_b")) * (var_b / F.col("n_b"))
            / (F.col("n_b") - 1)
        )
    )
    return m.select(
        "n_a",
        "n_b",
        F.round(mean_a, 12).alias("mean_a"),
        F.round(mean_b, 12).alias("mean_b"),
        F.round(t_raw, 12).alias("t_stat"),
        F.round(df_w, 12).alias("df_welch"),
        (F.abs(t_raw) > 1.96).alias("significant_05"),
    )




@query(
    "stats_poisson_bootstrap_ci",
    oracle=f"""
    WITH v AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    rep AS (
      SELECT CAST(b.range AS INT) AS b, cents,
             CAST(('0x' || substr(md5('boot:' || CAST(b.range AS VARCHAR)
                   || ':' || CAST(event_id AS VARCHAR)), 1, 4)) AS BIGINT)
               AS u
      FROM v, range(0, 64) b
    ),
    w AS (SELECT b, cents, {_pois_case_sql("u")} AS w FROM rep),
    rm AS (
      SELECT b, CAST(sum(w * cents) AS BIGINT) AS swx,
             CAST(sum(w) AS BIGINT) AS sw
      FROM w GROUP BY b
    ),
    means AS (
      SELECT b, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS m FROM rm
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS s
      FROM v
    )
    SELECT n_rows,
           CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE) AS point_mean,
           (SELECT m FROM ranked WHERE rn = 2) AS ci_lo,
           (SELECT m FROM ranked WHERE rn = 63) AS ci_hi,
           CAST(64 AS BIGINT) AS n_replicas
    FROM base
    """,
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for a mean — the
    bootstrap that actually runs at 100 TB (Chamandy et al., Google
    2012): instead of resampling n rows with replacement (a shuffle
    per replica), every row draws an independent Poisson(1) weight
    per replica, so all 64 replicas ride ONE pass over the fact and
    one groupBy(replica). The weight device is an md5 16-bit draw cut
    by precomputed integer CDF thresholds — deterministic, so replica
    means are exact integer ratios and DuckDB replays the whole
    resampling plan. CI = replica means ranked 2 and 63 of 64
    (2.5%/97.5%, id tiebreak). Fanout is a flat 64× explode — bounded
    and embarrassingly parallel, no driver participation."""
    from ..util import spread

    e = load(spark, sf, "events").filter(
        F.col("event_type") == "purchase"
    )
    # spread BEFORE the ×64 explode: the events parquet arrives as one
    # split, which would serialize the 64·N md5 draws into a single
    # task (r14 — same fix as stats_permutation_test); integer-sum
    # aggregation is partitioning-independent.
    v = spread(
        e.select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    rep = v.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
    ).withColumn("b", F.col("b").cast("int"))
    u = (
        "cast(conv(substring(md5(concat('boot:', cast(b as string), ':', "
        "cast(event_id as string))), 1, 4), 16, 10) as bigint)"
    )
    w = rep.withColumn("w", F.expr(_pois_case_sql(f"({u})")))
    rm = w.groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).alias("swx"),
        F.sum("w").alias("sw"),
    )
    means = rm.select(
        "b", (F.col("swx").cast("double") / F.col("sw").cast("double")).alias("m")
    )
    ranked = means.select(
        "m",
        F.row_number()
        .over(Window.orderBy(F.col("m").asc(), F.col("b").asc()))
        .alias("rn"),
    )
    # ONE pass over the ranked replica means for both CI endpoints: the
    # separate rn==2 / rn==63 filters each re-ran the whole ×64
    # explode + md5 + groupBy subtree (two Generate branches in the r14
    # before-plan); a conditional aggregate folds them into one row.
    ci = ranked.agg(
        F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == 63, F.col("m"))).alias("ci_hi"),
    )
    base = v.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("s")
    )
    return (
        base.crossJoin(F.broadcast(ci))
        .select(
            "n_rows",
            (
                F.col("s").cast("double") / F.col("n_rows").cast("double")
            ).alias("point_mean"),
            "ci_lo",
            "ci_hi",
            F.lit(64).cast("long").alias("n_replicas"),
        )
    )




@query(
    "stats_mann_whitney_u",
    oracle="""
    WITH ab AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT value, count(*) AS cnt, sum(ia) AS cnt_a
      FROM ab GROUP BY value
    ),
    ranked AS (
      SELECT cnt, cnt_a,
             coalesce(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_less
      FROM byval
    ),
    agg AS (
      SELECT sum(cnt_a * (2 * cum_less + cnt + 1)) AS r2a,
             sum(cnt_a) AS na, sum(cnt - cnt_a) AS nb,
             sum(cnt * cnt * cnt - cnt) AS tie_t
      FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(r2a - na * (na + 1) AS BIGINT) AS u_a_x2,
           CAST(tie_t AS BIGINT) AS tie_term,
           round(
             (CAST(r2a - na * (na + 1) AS DOUBLE) / 2E0
               - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2E0)
             / sqrt(
                 CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12E0
                 * (CAST(na + nb + 1 AS DOUBLE)
                    - CAST(tie_t AS DOUBLE)
                      / (CAST(na + nb AS DOUBLE)
                         * CAST(na + nb - 1 AS DOUBLE)))),
             12) AS z_score
    FROM agg
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf: str) -> DataFrame:
    """MANN–WHITNEY U rank-sum test (tie-corrected, no continuity
    correction): does `value` differ in distribution between clicks
    and views? The nonparametric sibling of stats_welch_ttest — the
    A/B test you reach for when the metric is heavy-tailed. Average
    ranks are kept EXACT as doubled integers (2·rank = 2·cum_less +
    t + 1), so U×2, the tie term Σ(t³−t), and every aggregate are
    integer-exact; only the final z touches floats, with the tie-
    corrected variance and round(12) on both engines. One groupBy
    (distinct values) + one window cumsum — rank computation never
    shuffles the raw fact twice."""
    e = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    byval = (
        e.select(
            "value",
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("ia"),
        )
        .groupBy("value")
        .agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("ia").alias("cnt_a")
        )
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = byval.select(
        "cnt",
        "cnt_a",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_less"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("cnt_a") * (2 * F.col("cum_less") + F.col("cnt") + 1)
        ).alias("r2a"),
        F.sum("cnt_a").alias("na"),
        F.sum(F.col("cnt") - F.col("cnt_a")).alias("nb"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_t"),
    )
    na, nb = F.col("na"), F.col("nb")
    d = lambda c: c.cast("double")  # noqa: E731
    u2 = F.col("r2a") - na * (na + 1)
    var = (
        d(na) * d(nb) / F.lit(12.0)
        * (
            d(na + nb + 1)
            - d(F.col("tie_t")) / (d(na + nb) * d(na + nb - 1))
        )
    )
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        u2.cast("long").alias("u_a_x2"),
        F.col("tie_t").cast("long").alias("tie_term"),
        F.round(
            (d(u2) / F.lit(2.0) - d(na) * d(nb) / F.lit(2.0))
            / F.sqrt(var),
            12,
        ).alias("z_score"),
    )




@query(
    "stats_ols_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1997-01-01', CAST(l_shipdate AS DATE))
               AS x,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS y
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM daily
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE))
               * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             AS intercept_cents
    FROM s
    """,
)
def stats_ols_daily_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Closed-form OLS of daily revenue (integer cents) on the day
    index — the parametric trend twin of ts_theil_sen_trend. The
    normal-equation sums (Σx, Σy, Σxy, Σx²) stay EXACT BIGINTs, so the
    slope is an exact integer rational; slope and intercept touch
    floats only in the final mirrored expressions. Σy² (hence R²) is
    deliberately NOT computed: daily-cents squared overflows the
    int64 exact window at real scale, and a float fallback would be
    summation-order-dependent — the honest-float discipline says emit
    what both engines can agree on bit-for-bit. Fact contributes one
    groupBy(day); the quadratic-free sums ride a 365-row table."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = li.groupBy(
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1997-01-01").cast("date"),
        ).alias("x")
    ).agg(F.sum(cents).alias("y"))
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = n * F.col("sxx") - sx * sx
    d = lambda c: c.cast("double")  # noqa: E731
    slope = d(num) / d(den)
    return s.select(
        n.cast("long").alias("n_days"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        slope.alias("slope_cents_per_day"),
        (d(sy) / d(n) - slope * (d(sx) / d(n))).alias("intercept_cents"),
    )




@query(
    "stats_quantile_normalize",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS prank,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r_s,
             count(*) OVER (PARTITION BY source) AS n_s,
             count(*) OVER () AS n
      FROM documents
    )
    SELECT a.doc_id, a.source, a.n_chars,
           b.n_chars AS norm_chars
    FROM (SELECT doc_id, source, n_chars,
                 (r_s * n + n_s - 1) // n_s AS idx
          FROM d) a
    JOIN (SELECT prank, n_chars FROM d) b ON b.prank = a.idx
    """,
)
def stats_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """QUANTILE NORMALIZATION across sources (the batch-effect
    correction of bioinformatics, applied to doc-length distributions):
    each document's length maps to the POOLED value at the same rank
    fraction, so after the pass every source has an identical length
    distribution. The pooled rank is EXACT and computed WITHOUT a
    global sort: values range-shard on n_chars DIV 64 (shard order ==
    value order by construction), ranks ride per-shard windows, and a
    bounded shard-count offset table (the only unpartitioned window)
    lifts them to global ranks — the same scan-chunk decomposition as
    curation.token_budget_sample. Everything is integer; the oracle
    replays with a plain global row_number. Target index is
    ceil(r_s·N/n_s) via integer DIV on both engines (memory: Spark /
    is double division — F.floor/DIV mirrors DuckDB //)."""
    docs = load(spark, sf, "documents").select("doc_id", "source", "n_chars")
    shard = (F.col("n_chars") / 64).cast("long").alias("_shard")
    d = docs.select("doc_id", "source", "n_chars", shard)
    win_in = Window.partitionBy("_shard").orderBy("n_chars", "doc_id")
    cnt = d.groupBy("_shard").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = cnt.select(
        "_shard",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
    )
    ranked = (
        d.join(F.broadcast(off), on="_shard")
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.col("_off") + F.row_number().over(win_in)).alias("prank"),
        )
    )
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    n_s = Window.partitionBy("source")
    n_tot = ranked.agg(F.count(F.lit(1)).alias("n"))
    src_ranked = (
        ranked.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(ws).alias("r_s"),
            F.count(F.lit(1)).over(n_s).alias("n_s"),
        )
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.floor(
                (F.col("r_s") * F.col("n") + F.col("n_s") - 1)
                / F.col("n_s")
            ).alias("idx"),
        )
    )
    pooled = ranked.select("prank", F.col("n_chars").alias("norm_chars"))
    return src_ranked.join(
        pooled, src_ranked.idx == pooled.prank
    ).select("doc_id", "source", "n_chars", "norm_chars")




@query(
    "stats_spearman_corr",
    oracle="""
    WITH rows_ AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS q,
             CAST(round(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT) AS c
      FROM lineitem
    ),
    qv AS (
      SELECT q, count(*) AS cnt,
             coalesce(sum(count(*)) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum
      FROM rows_ GROUP BY q
    ),
    cv AS (
      SELECT c, count(*) AS cnt,
             coalesce(sum(count(*)) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum
      FROM rows_ GROUP BY c
    ),
    rr AS (
      SELECT 2 * qv.cum + qv.cnt + 1 AS x,
             2 * cv.cum + cv.cnt + 1 AS y
      FROM rows_ JOIN qv USING (q) JOIN cv USING (c)
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(x*y) AS BIGINT) AS sxy
      FROM rr
    )
    SELECT n,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             12) AS spearman_rho
    FROM s
    """,
)
def stats_spearman_corr(spark: SparkSession, sf: str) -> DataFrame:
    """SPEARMAN rank correlation of gross line price vs net revenue —
    the monotone-association sibling of stats_covar_corr, robust to
    the heavy price tail (the discount injects rank noise, so ρ < 1
    and the tie machinery is exercised on both variables).
    Tie-averaged ranks stay EXACT as doubled integers
    (2r = 2·cum_less + t + 1, the Mann-Whitney device) so every sum
    (Σx, Σx², Σxy over 2r ≤ 2n) is an exact BIGINT; the
    Pearson-on-ranks formula then runs in double on deterministic
    int64→double conversions (IEEE round-to-nearest, identical on
    both engines) and rounds to 12. The rank tables are
    DISTINCT-VALUE-sized, not corpus-sized — at 100 TB the cents
    tables would range-shard like stats_quantile_normalize; here
    both windows ride bounded value tables."""
    li = load(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("q"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("c"),
    )

    def ranks(col: str):
        byv = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return byv.select(
            col,
            (
                2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + 1
            ).alias(f"r_{col}"),
        )

    rr = (
        li.join(ranks("q"), on="q")
        .join(ranks("c"), on="c")
        .select(F.col("r_q").alias("x"), F.col("r_c").alias("y"))
    )
    s = rr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(num / den, 12).alias("spearman_rho"),
    )




@query(
    "stats_cramers_v",
    oracle="""
    WITH o AS (
      SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY event_type, dayofweek(ts)
    ), m AS (
      SELECT o.*,
             CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT)
               AS row_tot,
             CAST(sum(obs) OVER (PARTITION BY dow) AS BIGINT) AS col_tot,
             CAST(sum(obs) OVER () AS BIGINT) AS grand
      FROM o
    ), terms AS (
      SELECT (CAST(obs AS DOUBLE)
              - CAST(row_tot AS DOUBLE) * col_tot / grand)
             * (CAST(obs AS DOUBLE)
                - CAST(row_tot AS DOUBLE) * col_tot / grand)
             / (CAST(row_tot AS DOUBLE) * col_tot / grand) AS term,
             grand
      FROM m
    ), dims AS (
      SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS r,
             CAST(count(DISTINCT dayofweek(ts)) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM events
    )
    SELECT dims.r AS n_rows, dims.c AS n_cols, dims.n AS n_obs,
           sqrt(list_reduce(list_sort(list(term)), (x, y) -> x + y)
                / (dims.n * least(dims.r - 1, dims.c - 1)))
             AS cramers_v
    FROM terms CROSS JOIN dims
    GROUP BY dims.r, dims.c, dims.n
    """,
)
def stats_cramers_v(spark: SparkSession, sf: str) -> DataFrame:
    """CRAMÉR'S V — the [0,1] effect size the chi² statistic lacks
    (chi² grows with n, V answers 'how strong is the association?'):
    V = √(χ²/(n·min(r−1,c−1))) over the event_type × day-of-week
    contingency table. Reuses the chi² float discipline verbatim
    (integer margins via window sums on the cell table, one mirrored
    term per cell, smallest-first fold); the dims ride a one-row
    broadcast. Same single-shuffle shape as stats_chi2_type_dow."""
    e = load(spark, sf, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wg = Window.partitionBy()
    m = o.select(
        "obs",
        F.sum("obs").over(wr).alias("row_tot"),
        F.sum("obs").over(wc).alias("col_tot"),
        F.sum("obs").over(wg).alias("grand"),
    )
    exp = (
        F.col("row_tot").cast("double") * F.col("col_tot") / F.col("grand")
    )
    term = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    dims = e.agg(
        F.countDistinct("event_type").alias("r"),
        F.countDistinct(F.dayofweek("ts")).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    chi2 = m.select(term.alias("_t")).agg(
        F.aggregate(
            F.array_sort(F.collect_list("_t")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("chi2")
    )
    return chi2.crossJoin(F.broadcast(dims)).select(
        F.col("r").cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("n_cols"),
        F.col("n").cast("long").alias("n_obs"),
        F.sqrt(
            F.col("chi2")
            / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
        ).alias("cramers_v"),
    )




@query(
    "stats_kendall_tau_daily",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.n > a.n THEN 1 ELSE 0 END AS conc,
             CASE WHEN b.n < a.n THEN 1 ELSE 0 END AS disc
      FROM grid a JOIN grid b
        ON a.event_type = b.event_type AND a.day < b.day
    ),
    cd AS (
      SELECT event_type, CAST(sum(conc) AS BIGINT) AS c,
             CAST(sum(disc) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n0
      FROM pairs GROUP BY event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(sum(t * (t - 1) / 2) AS BIGINT) AS tn
      FROM (SELECT event_type, n, count(*) AS t
            FROM grid GROUP BY event_type, n)
      GROUP BY event_type
    )
    SELECT cd.event_type, c AS n_concordant, d AS n_discordant,
           tn AS tie_pairs,
           round(CAST(c - d AS DOUBLE)
                 / sqrt(CAST(n0 - tn AS DOUBLE) * CAST(n0 AS DOUBLE)),
                 12) AS kendall_tau_b
    FROM cd JOIN ties ON cd.event_type = ties.event_type
    """,
)
def stats_kendall_tau_daily(spark: SparkSession, sf: str) -> DataFrame:
    """KENDALL τ-b monotone-trend test per stream — the third rank
    statistic beside Spearman (pairwise concordance is what Mann-
    Kendall trend detection runs on). Day ties are impossible on the
    dense grid, so τ-b = (C−D)/√((n₀−t_n)·n₀) with the count tie
    term t_n = Σt(t−1)/2; every count is an exact BIGINT, one
    mirrored float expression + round 12 at the end. The quadratic
    pair join lives on the 30-row-per-stream DAILY table (435 pairs),
    never the fact — the Theil-Sen scale argument verbatim."""
    grid = _daily_grid(spark, sf)
    a = grid.select(
        "event_type", F.col("day").alias("da"), F.col("n").alias("na")
    )
    b = grid.select(
        "event_type", F.col("day").alias("db"), F.col("n").alias("nb")
    )
    pairs = a.join(b, on="event_type").filter(F.col("da") < F.col("db"))
    cd = pairs.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("nb") > F.col("na"), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when(F.col("nb") < F.col("na"), 1).otherwise(0)
        ).alias("d"),
        F.count(F.lit(1)).alias("n0"),
    )
    ties = (
        grid.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2)
            .cast("long")
            .alias("tn")
        )
    )
    j = cd.join(ties, on="event_type")
    return j.select(
        "event_type",
        F.col("c").cast("long").alias("n_concordant"),
        F.col("d").cast("long").alias("n_discordant"),
        F.col("tn").alias("tie_pairs"),
        F.round(
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("tn")).cast("double")
                * F.col("n0").cast("double")
            ),
            12,
        ).alias("kendall_tau_b"),
    )




@query(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sx,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sxx
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(sx) AS BIGINT) AS sx_all,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    terms AS (
      SELECT CAST(g.sx AS DOUBLE) * g.sx / g.n_g AS bterm,
             CAST(g.sxx AS DOUBLE)
               - CAST(g.sx AS DOUBLE) * g.sx / g.n_g AS wterm
      FROM g
    ),
    ss AS (
      SELECT
        list_reduce(list_sort(list(bterm)), (x, y) -> x + y) AS sum_b,
        list_reduce(list_sort(list(wterm)), (x, y) -> x + y) AS ssw
      FROM terms
    )
    SELECT tot.k AS n_groups, tot.n AS n_obs,
           round(ss.sum_b
                 - CAST(tot.sx_all AS DOUBLE) * tot.sx_all / tot.n,
                 6) AS ss_between,
           round(ss.ssw, 6) AS ss_within,
           round(
             ((ss.sum_b
               - CAST(tot.sx_all AS DOUBLE) * tot.sx_all / tot.n)
              / (tot.k - 1))
             / (ss.ssw / (tot.n - tot.k)), 12) AS f_stat
    FROM ss CROSS JOIN tot
    """,
)
def stats_anova_oneway(spark: SparkSession, sf: str) -> DataFrame:
    """ONE-WAY ANOVA F statistic for value-cents across event types —
    the k-group generalization that completes the classical-test
    family (Welch t, z, U, χ², KS live elsewhere in this catalog).
    Per-group Σx/Σx²/n are exact BIGINTs on integer cents; the
    between/within decomposition runs in double with the per-group
    terms folded smallest-first (each term has ONE division —
    mirrored), and SS outputs round to 6 (absolute cents² scale)
    with F to 12. One groupBy over the fact; everything after is
    k-sized."""
    e = load(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(cents).alias("sx"),
        F.sum(cents * cents).alias("sxx"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("sx").alias("sx_all"),
        F.count(F.lit(1)).alias("k"),
    )
    terms = g.select(
        (F.col("sx").cast("double") * F.col("sx") / F.col("n_g")).alias(
            "bterm"
        ),
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n_g")
        ).alias("wterm"),
    )
    fold = lambda c: F.aggregate(  # noqa: E731
        F.array_sort(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    ss = terms.agg(
        fold("bterm").alias("sum_b"), fold("wterm").alias("ssw")
    )
    j = ss.crossJoin(F.broadcast(tot))
    ssb = (
        F.col("sum_b")
        - F.col("sx_all").cast("double") * F.col("sx_all") / F.col("n")
    )
    return j.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_obs"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(F.col("ssw"), 6).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k"))),
            12,
        ).alias("f_stat"),
    )




@query(
    "stats_wilson_ci",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)
               AS BIGINT) AS k
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT event_type, n, k,
             CAST(196 AS DOUBLE) / 100 AS z,
             CAST(k AS DOUBLE) / n AS p
      FROM s
    )
    SELECT event_type, n, k,
           round(p, 12) AS p_hat,
           round((p + z*z/(2*n)
                  - z * sqrt((p*(1-p) + z*z/(4*n)) / n))
                 / (1 + z*z/n), 12) AS wilson_lo,
           round((p + z*z/(2*n)
                  + z * sqrt((p*(1-p) + z*z/(4*n)) / n))
                 / (1 + z*z/n), 12) AS wilson_hi
    FROM c
    """,
)
def stats_wilson_ci(spark: SparkSession, sf: str) -> DataFrame:
    """WILSON SCORE interval — the 95% confidence interval for a
    proportion (here: share of high-value events per stream), the CI
    that stays inside [0,1] and behaves at small n where the naive
    Wald interval collapses — the number a metrics page should print
    next to every rate. z = 1.96 enters as CAST(196)/100 on BOTH
    engines (the decimal-literal trap); counts are exact, the
    formula is one mirrored float expression per bound, round 12.
    One groupBy over the fact."""
    e = load(spark, sf, "events")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).alias("k"),
    )
    z = F.lit(196.0) / 100
    p = F.col("k").cast("double") / F.col("n")
    denom = 1 + z * z / F.col("n")
    center = p + z * z / (2 * F.col("n"))
    half = z * F.sqrt(
        (p * (1 - p) + z * z / (4 * F.col("n"))) / F.col("n")
    )
    return s.select(
        "event_type",
        "n",
        F.col("k").cast("long").alias("k"),
        F.round(p, 12).alias("p_hat"),
        F.round((center - half) / denom, 12).alias("wilson_lo"),
        F.round((center + half) / denom, 12).alias("wilson_hi"),
    )




@query(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
      GROUP BY 1
    ),
    diffs AS (
      SELECT d, n - lag(n) OVER (ORDER BY d) AS diff
      FROM daily
    ),
    signs AS (
      SELECT d, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS up
      FROM diffs WHERE diff IS NOT NULL AND diff <> 0
    ),
    runs AS (
      SELECT up,
             CASE WHEN lag(up) OVER (ORDER BY d) IS NULL
                       OR lag(up) OVER (ORDER BY d) <> up
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ),
    s AS (
      SELECT CAST(sum(new_run) AS BIGINT) AS r,
             CAST(sum(up) AS BIGINT) AS n1,
             CAST(count(*) - sum(up) AS BIGINT) AS n2
      FROM runs
    )
    SELECT r AS n_runs, n1 AS n_up, n2 AS n_down,
           round(
             (CAST(r AS DOUBLE)
              - (CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1))
             / sqrt(CAST(2 AS DOUBLE) * n1 * n2
                    * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2)
                    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                       * (n1 + n2 - 1))), 12) AS z_score
    FROM s
    """,
)
def stats_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """WALD–WOLFOWITZ RUNS TEST on the daily volume's up/down
    sequence — 'is the series random, trending, or oscillating?'
    (too few runs = momentum, too many = mean reversion). Zero
    diffs drop (the standard treatment — deterministic, mirrored);
    the run count is one lag-comparison window, n1/n2/R are exact
    integers, and the normal approximation is a single mirrored
    float expression rounded 12. Day-dim-sized end to end after one
    fact groupBy."""
    e = load(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        e.select(day.alias("d"))
        .filter((F.col("d") >= 0) & (F.col("d") <= 29))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wd = Window.orderBy("d")
    diffs = daily.select(
        "d", (F.col("n") - F.lag("n").over(wd)).alias("diff")
    ).filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
    signs = diffs.select(
        "d", F.when(F.col("diff") > 0, 1).otherwise(0).alias("up")
    )
    runs = signs.select(
        "up",
        F.when(
            F.lag("up").over(wd).isNull()
            | (F.lag("up").over(wd) != F.col("up")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    s = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("up").alias("n1"),
        (F.count(F.lit(1)) - F.sum("up")).alias("n2"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = F.lit(2.0) * d(n1) * d(n2) / d(n1 + n2) + 1
    var = (
        F.lit(2.0)
        * d(n1)
        * d(n2)
        * (F.lit(2.0) * d(n1) * d(n2) - d(n1) - d(n2))
        / (d(n1 + n2) * d(n1 + n2) * d(n1 + n2 - 1))
    )
    return s.select(
        r.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_up"),
        n2.cast("long").alias("n_down"),
        F.round((d(r) - mu) / F.sqrt(var), 12).alias("z_score"),
    )




@query(
    "stats_histogram2d_dow_value",
    oracle="""
    WITH b AS (
      SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(round(value * 100) AS BIGINT) // 5000 AS vbucket
      FROM events
    ),
    cells AS (
      SELECT dow, vbucket, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY dow, vbucket
    )
    SELECT dow, vbucket, n,
           CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY dow) AS row_share
    FROM cells
    """,
)
def stats_histogram2d_dow_value(spark: SparkSession, sf: str) -> DataFrame:
    """2-D HISTOGRAM (day-of-week × value bucket) — the heatmap
    primitive behind every 'when do the big orders land?' dashboard
    panel. Buckets are integer DIV on cents (memory: mirrored as
    DuckDB `//`); one hash aggregate builds the cells, a dim-sized
    window adds within-row shares. The dow+1 shift aligns Spark's
    Sunday=1 with DuckDB's Sunday=0 (the stats_chi2_type_dow
    convention)."""
    e = load(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    b = e.select(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(cents / 5000).cast("long").alias("vbucket"),
    )
    cells = b.groupBy("dow", "vbucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.partitionBy("dow")
    return cells.select(
        "dow",
        "vbucket",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wr)).alias(
            "row_share"
        ),
    )




@query(
    "stats_iqr_outlier_census",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    byval AS (
      SELECT event_type, cents, count(*) AS cnt,
             coalesce(sum(count(*)) OVER (PARTITION BY event_type
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_less,
             sum(count(*)) OVER (PARTITION BY event_type) AS n
      FROM c GROUP BY event_type, cents
    ),
    q AS (
      SELECT event_type,
             max(CASE WHEN cum_less < (n + 3) // 4
                       AND (n + 3) // 4 <= cum_less + cnt
                      THEN cents END) AS q1,
             max(CASE WHEN cum_less < (3 * n + 3) // 4
                       AND (3 * n + 3) // 4 <= cum_less + cnt
                      THEN cents END) AS q3,
             max(n) AS n
      FROM byval GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(max(q.n) AS BIGINT) AS n,
           CAST(max(q.q1) AS BIGINT) AS q1_cents,
           CAST(max(q.q3) AS BIGINT) AS q3_cents,
           CAST(sum(CASE WHEN 2 * c.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                           OR 2 * c.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM c JOIN q ON q.event_type = c.event_type
    GROUP BY c.event_type
    """,
)
def stats_iqr_outlier_census(spark: SparkSession, sf: str) -> DataFrame:
    """TUKEY-FENCE OUTLIER CENSUS per stream — the boxplot rule
    (outside Q1−1.5·IQR / Q3+1.5·IQR) counted exactly: quartiles are
    the values at ranks ⌈n/4⌉ and ⌈3n/4⌉ picked off the per-group
    DISTINCT-VALUE cumulative table (no percentile_approx, no
    interpolation — rank selection, the exact-median discipline),
    and the fences are INTEGER cross-multiplications (2c > 2q3 +
    3·IQR ⟺ c > q3 + 1.5·IQR) so no float ever decides membership.
    One value-table window + one fact pass with a broadcast-able
    5-row quartile join."""
    e = load(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    c = e.select("event_type", cents.alias("cents"))
    byval = c.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("event_type")
    ranked = byval.select(
        "event_type",
        "cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_less"),
        F.sum("cnt").over(wn).alias("n"),
    )
    r1 = F.floor((F.col("n") + 3) / 4)
    r3 = F.floor((3 * F.col("n") + 3) / 4)
    q = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                (F.col("cum_less") < r1)
                & (r1 <= F.col("cum_less") + F.col("cnt")),
                F.col("cents"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                (F.col("cum_less") < r3)
                & (r3 <= F.col("cum_less") + F.col("cnt")),
                F.col("cents"),
            )
        ).alias("q3"),
        F.max("n").alias("n"),
    )
    iqr3 = 3 * (F.col("q3") - F.col("q1"))
    out = (2 * F.col("cents") > 2 * F.col("q3") + iqr3) | (
        2 * F.col("cents") < 2 * F.col("q1") - iqr3
    )
    return (
        c.join(F.broadcast(q), on="event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("q1").cast("long").alias("q1_cents"),
            F.max("q3").cast("long").alias("q3_cents"),
            F.sum(F.when(out, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )




@query(
    "stats_kruskal_wallis",
    oracle="""
    WITH byval AS (
      SELECT value, event_type, count(*) AS cnt
      FROM events GROUP BY value, event_type
    ),
    tot AS (
      SELECT value, sum(cnt) AS t FROM byval GROUP BY value
    ),
    ranked AS (
      SELECT value, t,
             coalesce(sum(t) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_less
      FROM tot
    ),
    per_g AS (
      SELECT b.event_type,
             CAST(sum(b.cnt) AS BIGINT) AS n_g,
             CAST(sum(b.cnt * (2 * r.cum_less + r.t + 1)) AS BIGINT)
               AS rank_sum_x2
      FROM byval b JOIN ranked r ON b.value = r.value
      GROUP BY b.event_type
    ),
    gstats AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             list_reduce(
               list_sort(list(
                 CAST(rank_sum_x2 AS DOUBLE) * CAST(rank_sum_x2 AS DOUBLE)
                 / (4.0 * n_g)
               )),
               (x, y) -> x + y
             ) AS sum_r2_over_n,
             (SELECT CAST(sum(t * t * t - t) AS BIGINT) FROM tot) AS tie_t
      FROM per_g
    )
    SELECT p.event_type, p.n_g, p.rank_sum_x2,
           round(12.0 / (CAST(g.n AS DOUBLE) * (g.n + 1))
                 * g.sum_r2_over_n - 3.0 * (g.n + 1), 12) AS h_stat,
           round((12.0 / (CAST(g.n AS DOUBLE) * (g.n + 1))
                  * g.sum_r2_over_n - 3.0 * (g.n + 1))
                 / (1.0 - CAST(g.tie_t AS DOUBLE)
                          / (CAST(g.n AS DOUBLE) * g.n * g.n - g.n)),
                 12) AS h_tie_corrected
    FROM per_g p CROSS JOIN gstats g
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf: str) -> DataFrame:
    """KRUSKAL–WALLIS H test: does `value` differ in distribution
    across the 5 event types? The k-group extension of
    stats_mann_whitney_u, built on the same doubled-rank device
    (2·rank = 2·cum_less + t + 1 keeps average ranks integer-exact
    under ties). Per-group doubled rank sums R2_g and the tie term
    Σ(t³−t) are BIGINT; H = 12/(N(N+1))·ΣR_g²/n_g − 3(N+1) folds the
    5 per-group float terms smallest-first (array_sort + aggregate ↔
    list_sort + list_reduce), tie-corrected by 1 − Σ(t³−t)/(N³−N),
    round 12. One distinct-value groupBy + one window cumsum — the
    raw fact shuffles once."""
    e = load(spark, sf, "events")
    byval = e.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = byval.groupBy("value").agg(F.sum("cnt").alias("t"))
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = tot.select(
        "value",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("cum_less"),
    )
    per_g = (
        byval.join(ranked, on="value")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(
                F.col("cnt")
                * (2 * F.col("cum_less") + F.col("t") + 1)
            )
            .cast("long")
            .alias("rank_sum_x2"),
        )
    )
    tie = tot.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_t")
    )
    glob = per_g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.col("rank_sum_x2").cast("double")
                    * F.col("rank_sum_x2").cast("double")
                    / (F.lit(4.0) * F.col("n_g"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_r2_over_n"),
    ).crossJoin(F.broadcast(tie))
    n_d = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (n_d * (F.col("n") + 1)) * F.col("sum_r2_over_n")
        - F.lit(3.0) * (F.col("n") + 1)
    )
    corr = F.lit(1.0) - F.col("tie_t").cast("double") / (
        n_d * F.col("n") * F.col("n") - F.col("n")
    )
    return per_g.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "n_g",
        "rank_sum_x2",
        F.round(h, 12).alias("h_stat"),
        F.round(h / corr, 12).alias("h_tie_corrected"),
    )




@query(
    "stats_jarque_bera",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(u) AS s1, sum(u * u) AS s2,
             sum(u * u * u) AS s3, sum(u * u * u * u) AS s4
      FROM (SELECT event_type, CAST(round(value) AS BIGINT) AS u
            FROM events)
      GROUP BY event_type
    ),
    c AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM m
    )
    SELECT event_type, n,
           round((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
                 / pow(r2 - mu * mu, 1.5), 12) AS skewness,
           round((r4 - 4 * mu * r3 + 6 * mu * mu * r2
                  - 3 * mu * mu * mu * mu)
                 / pow(r2 - mu * mu, 2.0), 12) AS kurtosis,
           round(n / 6.0 * (
             pow((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
                 / pow(r2 - mu * mu, 1.5), 2.0)
             + pow((r4 - 4 * mu * r3 + 6 * mu * mu * r2
                    - 3 * mu * mu * mu * mu)
                   / pow(r2 - mu * mu, 2.0) - 3, 2.0) / 4), 12) AS jb_stat
    FROM c
    """,
)
def stats_jarque_bera(spark: SparkSession, sf: str) -> DataFrame:
    """JARQUE-BERA normality test per event type: JB = n/6·(g₁² +
    (g₂−3)²/4) from sample skewness g₁ and kurtosis g₂. The four
    power sums Σu..Σu⁴ accumulate EXACTLY in BIGINT over integer
    units u = round(value) (u ≤ ~600 keeps Σu⁴ under 2⁶³ through
    ~sf10 — the moments ladder discipline of stats_moments); the
    central-moment formulas are then identical double expressions on
    both engines, round 12. One map-combinable groupBy, no second
    pass — the two-pass 'subtract the mean first' variant is only
    needed when the raw magnitudes dwarf the spread, which cents-
    scale metrics don't."""
    e = load(spark, sf, "events")
    u = F.round(F.col("value")).cast("long")
    m = e.select("event_type", u.alias("u")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("s1"),
        F.sum(F.col("u") * F.col("u")).alias("s2"),
        F.sum(F.col("u") * F.col("u") * F.col("u")).alias("s3"),
        F.sum(F.col("u") * F.col("u") * F.col("u") * F.col("u")).alias(
            "s4"
        ),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    skew = (r3 - 3 * mu * r2 + 2 * mu * mu * mu) / F.pow(
        r2 - mu * mu, F.lit(1.5)
    )
    kurt = (
        r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    ) / F.pow(r2 - mu * mu, F.lit(2.0))
    jb = n / F.lit(6.0) * (
        F.pow(skew, F.lit(2.0))
        + F.pow(kurt - 3, F.lit(2.0)) / F.lit(4)
    )
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(skew, 12).alias("skewness"),
        F.round(kurt, 12).alias("kurtosis"),
        F.round(jb, 12).alias("jb_stat"),
    )




@query(
    "stats_permutation_test",
    oracle="""
    WITH base AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'view')
    ),
    obs AS (
      SELECT sum(ia) AS na, sum(1 - ia) AS nb,
             sum(CASE WHEN ia = 1 THEN c END) AS sa,
             sum(CASE WHEN ia = 0 THEN c END) AS sb
      FROM base
    ),
    reps AS (
      SELECT k.range AS k,
             sum(CASE WHEN substr(md5(b.event_id || ':' || k.range),
                             1, 1) IN ('0','1','2','3','4','5','6','7')
                      THEN 1 ELSE 0 END) AS nra,
             sum(CASE WHEN substr(md5(b.event_id || ':' || k.range),
                             1, 1) IN ('0','1','2','3','4','5','6','7')
                      THEN b.c END) AS sra,
             count(*) AS n, sum(b.c) AS st
      FROM base b CROSS JOIN range(1, 65) k
      GROUP BY k.range
    ),
    scored AS (
      SELECT r.k,
             CAST(r.nra AS BIGINT) AS n_a_k,
             round(CAST(r.sra AS DOUBLE) / r.nra
                   - CAST(r.st - r.sra AS DOUBLE) / (r.n - r.nra),
                   6) AS diff_k,
             CAST(CASE WHEN abs(CAST(r.sra AS DOUBLE) / r.nra
                                - CAST(r.st - r.sra AS DOUBLE)
                                  / (r.n - r.nra))
                            >= abs(CAST(o.sa AS DOUBLE) / o.na
                                   - CAST(o.sb AS DOUBLE) / o.nb)
                       THEN 1 ELSE 0 END AS BIGINT) AS extreme,
             round(CAST(o.sa AS DOUBLE) / o.na
                   - CAST(o.sb AS DOUBLE) / o.nb, 6) AS obs_diff
      FROM reps r CROSS JOIN obs o
    )
    SELECT k, n_a_k, diff_k, extreme, obs_diff,
           round((1.0 + (SELECT sum(extreme) FROM scored)) / 65.0, 12)
             AS p_value
    FROM scored
    """,
)
def stats_permutation_test(spark: SparkSession, sf: str) -> DataFrame:
    """RANDOMIZATION TEST for the click-vs-view mean-cents difference:
    64 deterministic label reassignments (row → group A iff
    md5(event_id:k) starts 0-7, the repo's keystream device), p =
    (1 + #extreme)/(K+1). Every replica mean comes from EXACT BIGINT
    cent sums; the extreme comparison is between identically-derived
    doubles, so the flag is engine-stable. Scale shape: the K
    replicas are ONE explode + map-combinable groupBy(k) — 64 partial
    cells per input split, no per-replica pass over the fact, the
    same economics as curation_dp_noisy_counts. Output is the full
    64-row replica table (diff, extreme flag) plus the shared
    observed diff and p-value."""
    from ..util import spread

    e = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    # spread BEFORE the ×64 explode: the events parquet arrives as one
    # split, which would serialize the 64·N md5 draws into a single
    # task (r14 — measured single-task stage dominating the query);
    # integer-sum aggregation is partitioning-independent.
    base = spread(
        e.select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("c"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("ia"),
        )
    )
    obs = base.agg(
        F.sum("ia").alias("na"),
        F.sum(1 - F.col("ia")).alias("nb"),
        F.sum(F.when(F.col("ia") == 1, F.col("c"))).alias("sa"),
        F.sum(F.when(F.col("ia") == 0, F.col("c"))).alias("sb"),
    )
    rep = base.select(
        "event_id",
        "c",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("k"),
    )
    flag = F.substring(
        F.md5(F.concat_ws(":", F.col("event_id"), F.col("k"))), 1, 1
    ).isin(*"01234567")
    reps = rep.groupBy("k").agg(
        F.sum(F.when(flag, 1).otherwise(0)).alias("nra"),
        F.sum(F.when(flag, F.col("c"))).alias("sra"),
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("st"),
    )
    diff_k = F.col("sra").cast("double") / F.col("nra") - (
        F.col("st") - F.col("sra")
    ).cast("double") / (F.col("n") - F.col("nra"))
    obs_diff = F.col("sa").cast("double") / F.col("na") - F.col(
        "sb"
    ).cast("double") / F.col("nb")
    scored = reps.crossJoin(F.broadcast(obs)).select(
        "k",
        F.col("nra").cast("long").alias("n_a_k"),
        F.round(diff_k, 6).alias("diff_k"),
        (F.abs(diff_k) >= F.abs(obs_diff))
        .cast("long")
        .alias("extreme"),
        F.round(obs_diff, 6).alias("obs_diff"),
    )
    scored = scored.localCheckpoint(eager=False)  # consumed twice
    tot = scored.agg(
        F.round((1 + F.sum("extreme")) / F.lit(65.0), 12).alias(
            "p_value"
        )
    )
    return scored.crossJoin(F.broadcast(tot))




@query(
    "stats_levene_brownforsythe",
    oracle="""
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    cum AS (
      SELECT event_type, c, count(*) AS cnt,
             sum(count(*)) OVER (
               PARTITION BY event_type ORDER BY c
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(count(*)) OVER (PARTITION BY event_type) AS n
      FROM cents GROUP BY event_type, c
    ),
    med AS (
      SELECT event_type,
             min(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS med
      FROM cum GROUP BY event_type
    ),
    z AS (
      SELECT x.event_type, abs(x.c - m.med) AS z, m.med
      FROM cents x JOIN med m USING (event_type)
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(any_value(med) AS BIGINT) AS median_cents,
             sum(z) AS zs, sum(z * z) AS zs2
      FROM z GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(zs) AS DOUBLE) / sum(n_g) AS zbar
      FROM g
    ),
    parts AS (
      SELECT
        list_reduce(list_sort(list(
          n_g * (CAST(zs AS DOUBLE) / n_g - t.zbar)
              * (CAST(zs AS DOUBLE) / n_g - t.zbar))),
          (x, y) -> x + y) AS num,
        list_reduce(list_sort(list(
          CAST(zs2 AS DOUBLE)
          - CAST(zs AS DOUBLE) * zs / n_g)),
          (x, y) -> x + y) AS den,
        any_value(t.n) AS n, any_value(t.k) AS k
      FROM g CROSS JOIN tot t
    )
    SELECT g.event_type, g.n_g, g.median_cents,
           round(CAST(g.zs AS DOUBLE) / g.n_g, 6) AS mean_absdev_cents,
           round((p.num / (p.k - 1)) / (p.den / (p.n - p.k)), 12)
             AS f_stat
    FROM g CROSS JOIN parts p
    """,
)
def stats_levene_brownforsythe(spark: SparkSession, sf: str) -> DataFrame:
    """BROWN-FORSYTHE test for equal spread across event types (the
    robust Levene variant: ANOVA on z = |x − group MEDIAN|, the
    variance-homogeneity gate run before trusting a pooled ANOVA).
    Group medians are EXACT discrete order statistics off the
    per-group distinct-value cumulative table (the stats_iqr device,
    never percentile_approx); z, Σz, Σz² stay BIGINT cents; the 5
    per-group numerator/denominator terms fold smallest-first; F
    rounds at 12. Two fact passes (median, then deviations) with one
    broadcast median join — the unavoidable two-pass shape of
    median-centered statistics."""
    from ..util import spread

    e = load(spark, sf, "events")
    # spread BEFORE the pin: the events parquet arrives as one split, so
    # the pinned cents table — and with it the whole z/deviation pass,
    # whose groupBy partial aggregation is map-side — ran single-task
    # (r15; same single-split fix as stats_permutation_test)
    cents = spread(
        e.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    cents = cents.localCheckpoint(eager=False)  # consumed twice
    wcum = Window.partitionBy("event_type").orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("event_type")
    cum = cents.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        "event_type",
        "c",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = cum.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("c")
            )
        ).alias("med")
    )
    z = cents.join(F.broadcast(med), on="event_type").select(
        "event_type", F.abs(F.col("c") - F.col("med")).alias("z"), "med"
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.first("med").alias("median_cents"),
        F.sum("z").alias("zs"),
        F.sum(F.col("z") * F.col("z")).alias("zs2"),
    )
    g = g.localCheckpoint(eager=False)  # consumed thrice
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("zs").cast("double") / F.sum("n_g")).alias("zbar"),
    )
    zj = F.col("zs").cast("double") / F.col("n_g")
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.col("n_g") * (zj - F.col("zbar")) * (zj - F.col("zbar"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("num"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.col("zs2").cast("double")
                    - F.col("zs").cast("double") * F.col("zs") / F.col("n_g")
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("den"),
        F.first("n").alias("n"),
        F.first("k").alias("k"),
    )
    f_stat = (F.col("num") / (F.col("k") - 1)) / (
        F.col("den") / (F.col("n") - F.col("k"))
    )
    return g.crossJoin(F.broadcast(parts)).select(
        "event_type",
        F.col("n_g").cast("long").alias("n_g"),
        F.col("median_cents").cast("long").alias("median_cents"),
        F.round(F.col("zs").cast("double") / F.col("n_g"), 6).alias(
            "mean_absdev_cents"
        ),
        F.round(f_stat, 12).alias("f_stat"),
    )




@query(
    "stats_trimmed_mean",
    oracle="""
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    cum AS (
      SELECT event_type, c, count(*) AS cnt,
             sum(count(*)) OVER (
               PARTITION BY event_type ORDER BY c
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(count(*)) OVER (PARTITION BY event_type) AS n
      FROM cents GROUP BY event_type, c
    ),
    kept AS (
      SELECT event_type, n, n // 10 AS k,
             greatest(0, least(cum, n - n // 10)
                         - greatest(cum - cnt, n // 10)) AS keep_cnt,
             c
      FROM cum
    )
    SELECT event_type,
           CAST(any_value(n) AS BIGINT) AS n,
           CAST(any_value(k) AS BIGINT) AS k_trimmed,
           CAST(sum(keep_cnt * c) AS BIGINT) AS trimmed_sum_cents,
           round(CAST(sum(keep_cnt * c) AS DOUBLE)
                 / (any_value(n) - 2 * any_value(k)), 6)
             AS trimmed_mean_cents
    FROM kept GROUP BY event_type
    """,
)
def stats_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    """10% TRIMMED MEAN per event type — the robust location estimate
    between mean and median — computed EXACTLY from the per-group
    distinct-value cumulative table: each value's kept multiplicity
    is the integer interval overlap of its rank span [cum−cnt+1, cum]
    with [k+1, n−k] (k = ⌊n/10⌋), so the trimmed sum is one BIGINT
    aggregate — no sort of the raw fact, no percentile_approx, same
    one-window shape as stats_iqr_outlier_census. The mean divides
    two exact integers, round 6."""
    e = load(spark, sf, "events")
    cents = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    wcum = Window.partitionBy("event_type").orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("event_type")
    cum = cents.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        "event_type",
        "c",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    k = F.expr("n DIV 10")
    keep = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("n") - k)
        - F.greatest(F.col("cum") - F.col("cnt"), k),
    )
    kept = cum.select(
        "event_type", "n", k.alias("k"), keep.alias("keep_cnt"), "c"
    )
    return kept.groupBy("event_type").agg(
        F.first("n").cast("long").alias("n"),
        F.first("k").cast("long").alias("k_trimmed"),
        F.sum(F.col("keep_cnt") * F.col("c"))
        .cast("long")
        .alias("trimmed_sum_cents"),
        F.round(
            F.sum(F.col("keep_cnt") * F.col("c")).cast("double")
            / (F.first("n") - 2 * F.first("k")),
            6,
        ).alias("trimmed_mean_cents"),
    )




@query(
    "stats_ks_uniformity",
    oracle="""
    WITH sec AS (
      SELECT event_type,
             epoch_us(ts - CAST(CAST(ts AS DATE) AS TIMESTAMP))
               // 1000000 AS s
      FROM events
    ),
    cum AS (
      SELECT event_type, s, count(*) AS cnt,
             sum(count(*)) OVER (
               PARTITION BY event_type ORDER BY s
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(count(*)) OVER (PARTITION BY event_type) AS n
      FROM sec GROUP BY event_type, s
    )
    SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
           round(max(CAST(cum AS DOUBLE) / n
                     - CAST(s AS DOUBLE) / 86400), 12) AS d_plus,
           round(max(CAST(s AS DOUBLE) / 86400
                     - CAST(cum - cnt AS DOUBLE) / n), 12) AS d_minus,
           round(sqrt(CAST(any_value(n) AS DOUBLE))
                 * greatest(
                     max(CAST(cum AS DOUBLE) / n
                         - CAST(s AS DOUBLE) / 86400),
                     max(CAST(s AS DOUBLE) / 86400
                         - CAST(cum - cnt AS DOUBLE) / n)),
                 12) AS sqrt_n_d
    FROM cum GROUP BY event_type
    """,
)
def stats_ks_uniformity(spark: SparkSession, sf: str) -> DataFrame:
    """ONE-SAMPLE KOLMOGOROV-SMIRNOV test of time-of-day uniformity
    per event type: D⁺/D⁻ between the empirical CDF of second-of-day
    and the uniform CDF t/86400 — the diurnal-pattern detector (√n·D
    ≳ 1.63 rejects at α=0.01). Tie-correct via the distinct-value
    cumulative table: each distinct second contributes cum/n − t/T
    and t/T − (cum−cnt)/n, every operand an exact integer before ONE
    identical double expression, so the max is engine-stable. Seconds
    come from tz-free interval arithmetic (the KM device). One
    distinct-value groupBy + one window — the fact shuffles once."""
    e = load(spark, sf, "events")
    sec = F.expr(
        "CAST(ts - CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS LONG)"
    )
    cum = (
        e.select("event_type", sec.alias("s"))
        .groupBy("event_type", "s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("event_type").orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("event_type")
    t = cum.select(
        "event_type",
        "s",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    dp = F.col("cum").cast("double") / F.col("n") - F.col("s").cast(
        "double"
    ) / F.lit(86400)
    dm = F.col("s").cast("double") / F.lit(86400) - (
        F.col("cum") - F.col("cnt")
    ).cast("double") / F.col("n")
    return t.groupBy("event_type").agg(
        F.first("n").cast("long").alias("n"),
        F.round(F.max(dp), 12).alias("d_plus"),
        F.round(F.max(dm), 12).alias("d_minus"),
        F.round(
            F.sqrt(F.first("n").cast("double"))
            * F.greatest(F.max(dp), F.max(dm)),
            12,
        ).alias("sqrt_n_d"),
    )




@query(
    "stats_mde_power",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(c) AS s1, sum(c * c) AS s2
      FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(s1 AS DOUBLE) / n, 6) AS mean_cents,
           round(sqrt(CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)), 6) AS sigma_cents,
           round(CAST(2.8016 AS DOUBLE)
                 * sqrt(CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n))
                 * sqrt(CAST(2 AS DOUBLE) / (n // 2)), 6) AS mde_cents,
           round(CAST(2.8016 AS DOUBLE)
                 * sqrt(CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n))
                 * sqrt(CAST(2 AS DOUBLE) / (n // 2))
                 / (CAST(s1 AS DOUBLE) / n) * 100, 6) AS mde_rel_pct
    FROM m
    """,
)
def stats_mde_power(spark: SparkSession, sf: str) -> DataFrame:
    """MINIMUM DETECTABLE EFFECT calculator per event type — the
    experiment-sizing table product teams consult before launching an
    A/B test: mde = (z_{α/2} + z_β)·σ·√(2/m) at α=0.05, power=0.80
    (z constants pinned as literals: 1.96, 0.8416), arms m = n∕2 of
    the observed volume. σ comes from EXACT BIGINT cent sums through
    the stats_moments formula; absolute and relative MDE round at 6.
    One map-combinable groupBy — nothing else."""
    e = load(spark, sf, "events")
    c = F.round(F.col("value") * 100).cast("long")
    m = e.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    sigma = F.sqrt(F.col("s2").cast("double") / n - mean * mean)
    mde = (
        F.lit(2.8016)  # 1.96 + 0.8416 pinned as one literal
        * sigma
        * F.sqrt(F.lit(2.0) / F.expr("n DIV 2"))
    )
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(mean, 6).alias("mean_cents"),
        F.round(sigma, 6).alias("sigma_cents"),
        F.round(mde, 6).alias("mde_cents"),
        F.round(mde / mean * 100, 6).alias("mde_rel_pct"),
    )




# ===========================================================================
# Coverage round 8: effect sizes, outlier tests, vocabulary health
# ===========================================================================


@query(
    "stats_cohens_d",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'signup')
    ),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
                 CAST(sum(cents) AS BIGINT) AS s_a,
                 CAST(sum(cents * cents) AS BIGINT) AS q_a
          FROM v WHERE event_type = 'view'),
    b AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
                 CAST(sum(cents) AS BIGINT) AS s_b,
                 CAST(sum(cents * cents) AS BIGINT) AS q_b
          FROM v WHERE event_type = 'signup'),
    m AS (
      SELECT n_a, n_b,
             CAST(s_a AS DOUBLE) / n_a AS mean_a,
             CAST(s_b AS DOUBLE) / n_b AS mean_b,
             (CAST(q_a AS DOUBLE)
               - CAST(n_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)
                 * (CAST(s_a AS DOUBLE) / n_a)) AS ss_a,
             (CAST(q_b AS DOUBLE)
               - CAST(n_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)
                 * (CAST(s_b AS DOUBLE) / n_b)) AS ss_b
      FROM a, b
    ),
    d AS (
      SELECT n_a, n_b, mean_a, mean_b,
             (mean_a - mean_b)
               / sqrt((ss_a + ss_b) / (n_a + n_b - 2)) AS cohens_d
      FROM m
    )
    SELECT n_a, n_b,
           round(mean_a, 12) AS mean_a, round(mean_b, 12) AS mean_b,
           round(cohens_d, 12) AS cohens_d,
           round(cohens_d
                 * (1 - 3.0 / (4 * (n_a + n_b) - 9)), 12) AS hedges_g,
           abs(cohens_d) >= 0.2 AS at_least_small
    FROM d
    """,
)
def stats_cohens_d(spark: SparkSession, sf: str) -> DataFrame:
    """COHEN'S d pooled-SD effect size (with the Hedges' g small-
    sample correction) for view vs signup event values — the
    magnitude companion to stats_welch_ttest's significance (a
    p-value says "not noise"; d says "big enough to matter", the
    number an experiment review actually reads). Same float
    discipline: exact BIGINT Σx/Σx² partials per group, then the
    mean/pooled-variance/d/g chain in doubles mirrored token-for-
    token, round 12. Two map-combinable partial aggs + a 1×1 cross —
    only the scan scales."""
    e = load(spark, sf, "events").filter(
        F.col("event_type").isin("view", "signup")
    )
    cents = F.round(F.col("value") * 100).cast("long")

    def side(t: str, sfx: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == t)
            .select(cents.alias("c"))
            .agg(
                F.count(F.lit(1)).alias(f"n_{sfx}"),
                F.sum("c").alias(f"s_{sfx}"),
                F.sum(F.col("c") * F.col("c")).alias(f"q_{sfx}"),
            )
        )

    m = side("view", "a").crossJoin(side("signup", "b"))
    mean_a = F.col("s_a").cast("double") / F.col("n_a")
    mean_b = F.col("s_b").cast("double") / F.col("n_b")
    ss_a = (
        F.col("q_a").cast("double")
        - F.col("n_a").cast("double") * mean_a * mean_a
    )
    ss_b = (
        F.col("q_b").cast("double")
        - F.col("n_b").cast("double") * mean_b * mean_b
    )
    d = (mean_a - mean_b) / F.sqrt(
        (ss_a + ss_b) / (F.col("n_a") + F.col("n_b") - 2)
    )
    return m.select(
        "n_a",
        "n_b",
        F.round(mean_a, 12).alias("mean_a"),
        F.round(mean_b, 12).alias("mean_b"),
        F.round(d, 12).alias("cohens_d"),
        F.round(
            d * (1 - 3.0 / (4 * (F.col("n_a") + F.col("n_b")) - 9)), 12
        ).alias("hedges_g"),
        (F.abs(d) >= 0.2).alias("at_least_small"),
    )




@query(
    "stats_grubbs_max",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, v.event_id,
             abs(m.n * v.c - m.s) AS nd,
             m.n, m.s, m.q
      FROM v JOIN m USING (event_type)
    ),
    mx AS (
      SELECT event_type, n, s, q,
             CAST(max(nd) AS BIGINT) AS max_nd,
             CAST(min(CASE WHEN nd = mxnd THEN event_id END) AS BIGINT)
               AS argmax_event
      FROM (SELECT *, max(nd) OVER (PARTITION BY event_type) AS mxnd
            FROM dev)
      GROUP BY event_type, n, s, q
    )
    SELECT event_type, n,
           round(CAST(max_nd AS DOUBLE) / n
                 / sqrt((CAST(q AS DOUBLE)
                         - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / n)
                           * (CAST(s AS DOUBLE) / n)) / (n - 1)),
                 12) AS g_stat,
           argmax_event
    FROM mx
    """,
)
def stats_grubbs_max(spark: SparkSession, sf: str) -> DataFrame:
    """GRUBBS' maximum-deviation statistic per event type: G =
    max|x−x̄| / s, the classic single-outlier screen run before any
    mean-based metric is trusted. Exactness device: max|x−x̄| =
    max|n·x − Σx| / n, so the argmax and the numerator are EXACT
    BIGINT (ties broken by min event_id) — only the final divide by
    n·s happens in mirrored doubles, round 12. Two passes over the
    fact (moment agg, then deviation max via a type-keyed window on
    the second scan) — both map-combinable shapes."""
    e = load(spark, sf, "events")
    v = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    m = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    dev = v.join(F.broadcast(m), on="event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("n") * F.col("c") - F.col("s")).alias("nd"),
        "n",
        "s",
        "q",
    )
    mx = dev.groupBy("event_type", "n", "s", "q").agg(
        F.max("nd").alias("max_nd"),
        F.min_by(
            F.struct(F.col("event_id")), F.struct(-F.col("nd"), F.col("event_id"))
        ).getField("event_id").alias("argmax_event"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("n").cast("double") * mean * mean
        )
        / (F.col("n") - 1)
    )
    return mx.select(
        "event_type",
        "n",
        F.round(
            F.col("max_nd").cast("double") / F.col("n") / sd, 12
        ).alias("g_stat"),
        F.col("argmax_event").cast("long").alias("argmax_event"),
    )




@query(
    "stats_friedman_test",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    byval AS (
      SELECT day, n, CAST(count(*) AS BIGINT) AS cnt
      FROM grid GROUP BY day, n
    ),
    ranked AS (
      SELECT day, n, cnt,
             coalesce(sum(cnt) OVER (
               PARTITION BY day ORDER BY n
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cless
      FROM byval
    ),
    r2 AS (
      SELECT g.event_type, 2 * r.cless + r.cnt + 1 AS tr
      FROM grid g JOIN ranked r ON r.day = g.day AND r.n = g.n
    ),
    sums AS (
      SELECT event_type, CAST(sum(tr) AS BIGINT) AS r2_sum
      FROM r2 GROUP BY event_type
    ),
    meta AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(r2_sum * r2_sum) AS BIGINT) AS ss
      FROM sums
    )
    SELECT s.event_type, s.r2_sum, m.k,
           CAST(30 AS BIGINT) AS n_blocks,
           round(3.0 * m.ss / (30 * m.k * (m.k + 1))
                 - 3.0 * 30 * (m.k + 1), 12) AS chi2_f
    FROM sums s CROSS JOIN meta m
    """,
)
def stats_friedman_test(spark: SparkSession, sf: str) -> DataFrame:
    """FRIEDMAN rank test across event types blocked by day (30-day
    dense grid): do the types keep the same daily ordering, or does
    at least one systematically out-rank? The repeated-measures
    nonparametric ANOVA. Doubled-rank device (2r = 2·cum_less + t +
    1, the Mann-Whitney/Spearman discipline) keeps average ranks
    under ties EXACT integers; Σ(2R_j)² is BIGINT and the χ²_F
    statistic (uncorrected for ties) is one mirrored double
    expression, round 12. Per-block ranks come from a (day)-keyed
    window over the tiny grid — no global sort."""
    g = _daily_grid(spark, sf)
    byval = g.groupBy("day", "n").agg(F.count(F.lit(1)).alias("cnt"))
    wday = (
        Window.partitionBy("day")
        .orderBy("n")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = byval.withColumn(
        "cless", F.coalesce(F.sum("cnt").over(wday), F.lit(0))
    )
    r2 = g.join(ranked, on=["day", "n"]).select(
        "event_type",
        (2 * F.col("cless") + F.col("cnt") + 1).alias("tr"),
    )
    sums = r2.groupBy("event_type").agg(F.sum("tr").alias("r2_sum"))
    meta = sums.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("r2_sum") * F.col("r2_sum")).alias("ss"),
    )
    return sums.crossJoin(F.broadcast(meta)).select(
        "event_type",
        "r2_sum",
        "k",
        F.lit(30).cast("long").alias("n_blocks"),
        F.round(
            3.0 * F.col("ss") / (30 * F.col("k") * (F.col("k") + 1))
            - 3.0 * 30 * (F.col("k") + 1),
            12,
        ).alias("chi2_f"),
    )




@query(
    "stats_capture_recapture",
    oracle="""
    WITH marked AS (
      SELECT md5(text) AS h,
             max(CASE WHEN substr(md5('s1:' || CAST(doc_id AS VARCHAR)),
                                   1, 1) IN ('0','1','2','3','4','5','6','7')
                      THEN 1 ELSE 0 END) AS in1,
             max(CASE WHEN substr(md5('s2:' || CAST(doc_id AS VARCHAR)),
                                   1, 1) IN ('0','1','2','3','4','5','6','7')
                      THEN 1 ELSE 0 END) AS in2
      FROM documents GROUP BY md5(text)
    ),
    c AS (
      SELECT CAST(sum(in1) AS BIGINT) AS n1,
             CAST(sum(in2) AS BIGINT) AS n2,
             CAST(sum(in1 * in2) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS true_distinct
      FROM marked
    )
    SELECT n1, n2, m, true_distinct,
           round(CAST(n1 AS DOUBLE) * n2 / m, 12) AS lincoln_petersen,
           round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 12)
             AS chapman,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1)
                 / true_distinct - 1, 12) AS chapman_rel_err
    FROM c
    """,
)
def stats_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """CAPTURE–RECAPTURE (Lincoln–Petersen + Chapman) estimate of the
    corpus's DISTINCT-TEXT count from two ~50% md5-marked samples —
    the "how big is the dedup problem really?" estimator run when
    counting every duplicate is too expensive: catch n1 distinct
    texts in sample 1, n2 in sample 2, m in both → N̂ ≈ n1·n2/m.
    Identity = md5(text) (content, not id); sample membership =
    one hex digit of a salted id hash (≡ top bit, engine-portable).
    One content-hash groupBy + a one-row reduce; estimates are
    mirrored doubles over exact counts, with the relative error vs
    the true distinct count reported for the audit."""
    d = load(spark, sf, "documents")
    in1 = F.substring(
        F.md5(F.concat(F.lit("s1:"), F.col("doc_id").cast("string"))), 1, 1
    ).isin(*"01234567")
    in2 = F.substring(
        F.md5(F.concat(F.lit("s2:"), F.col("doc_id").cast("string"))), 1, 1
    ).isin(*"01234567")
    marked = d.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.max(in1.cast("int")).alias("in1"),
        F.max(in2.cast("int")).alias("in2"),
    )
    c = marked.agg(
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
        F.count(F.lit(1)).alias("true_distinct"),
    )
    lp = F.col("n1").cast("double") * F.col("n2") / F.col("m")
    ch = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        / (F.col("m") + 1)
        - 1
    )
    return c.select(
        "n1",
        "n2",
        "m",
        "true_distinct",
        F.round(lp, 12).alias("lincoln_petersen"),
        F.round(ch, 12).alias("chapman"),
        F.round(ch / F.col("true_distinct") - 1, 12).alias(
            "chapman_rel_err"
        ),
    )




@query(
    "stats_cohens_kappa",
    oracle="""
    WITH flags AS (
      SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(list_filter(
                    string_split_regex(trim(text), '\\s+'),
                    t -> t IN ('the','a','an','of','and','to','in','is',
                               'it','that'))) >= 3
                  THEN 1 ELSE 0 END AS rb
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ra * rb) AS BIGINT) AS n11,
             CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00,
             CAST(sum(ra) AS BIGINT) AS a1,
             CAST(sum(rb) AS BIGINT) AS b1
      FROM flags
    )
    SELECT n, n11, n00, a1, b1,
           CAST(n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1))
             AS BIGINT) AS kappa_num,
           CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS BIGINT)
             AS kappa_den,
           round(CAST(n * (n11 + n00)
                      - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
                 / (n * n - (a1 * b1 + (n - a1) * (n - b1))), 12)
             AS kappa
    FROM c
    """,
)
def stats_cohens_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """COHEN'S KAPPA agreement between two real quality raters — the
    length gate (n_chars ≥ 250) and the English-stopword gate (≥ 3
    function-word hits) — the "do my quality signals measure the
    same thing?" audit a filter-stack review runs before composing
    gates. Cross-multiplied exactness: κ = (N·agree − chance) /
    (N² − chance) where chance = a₁b₁ + a₀b₀, so BOTH numerator and
    denominator are exact BIGINTs; the float κ is one division,
    round 12. One scan, one map-combinable aggregate."""
    from ..functions.text import STOPWORDS, stopword_hits, tokens

    d = load(spark, sf, "documents")
    ra = F.when(F.col("n_chars") >= 250, 1).otherwise(0)
    rb = F.when(
        stopword_hits(tokens("text"), STOPWORDS["en"]) >= 3, 1
    ).otherwise(0)
    c = d.select(ra.alias("ra"), rb.alias("rb")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ra") * F.col("rb")).alias("n11"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).alias("n00"),
        F.sum("ra").alias("a1"),
        F.sum("rb").alias("b1"),
    )
    chance = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    num = F.col("n") * (F.col("n11") + F.col("n00")) - chance
    den = F.col("n") * F.col("n") - chance
    return c.select(
        "n",
        "n11",
        "n00",
        "a1",
        "b1",
        num.cast("long").alias("kappa_num"),
        den.cast("long").alias("kappa_den"),
        F.round(num.cast("double") / den, 12).alias("kappa"),
    )




@query(
    "stats_hill_tail_estimator",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
           FROM toks GROUP BY w),
    top AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w ASC) AS rn
      FROM wc ORDER BY f DESC, w ASC LIMIT 21
    ),
    thr AS (SELECT f AS f_thr FROM top WHERE rn = 21),
    logs AS (
      SELECT ln(CAST(t.f AS DOUBLE) / c.f_thr) AS lr
      FROM top t CROSS JOIN thr c WHERE t.rn <= 20
    )
    SELECT CAST(20 AS BIGINT) AS k,
           (SELECT CAST(f_thr AS BIGINT) FROM thr) AS f_threshold,
           round(20.0 / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_sort(list(lr))), (a, v) -> a + v), 12)
             AS hill_alpha
    FROM logs
    """,
)
def stats_hill_tail_estimator(spark: SparkSession, sf: str) -> DataFrame:
    """HILL ESTIMATOR of the word-frequency power-law tail index:
    α̂ = k / Σᵢ ln(f₍ᵢ₎/f₍ₖ₊₁₎) over the top-k=20 order statistics
    (the synthetic corpus draws from a ~31-word pool, so k
    scales to the tail that exists) —
    the principled tail-heaviness measure next to text_zipf_fit's
    rank-regression slope (Hill uses only the tail it claims to
    model; the regression is biased by the body). The top-101 pick
    is orderBy().limit() → TakeOrdered; each ratio is one division
    of exact integer frequencies; the 100 ln terms fold
    smallest-first (sorted-fold discipline), round 12."""
    d = load(spark, sf, "documents")
    toks = d.select(F.explode(tx.tokens("text")).alias("w"))
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    top = (
        wc.orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(21)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("f").desc(), F.col("w").asc())
            ),
        )
    )
    top = top.localCheckpoint(eager=False)  # consumed twice (21 rows)
    thr = top.filter(F.col("rn") == 21).select(
        F.col("f").alias("f_thr")
    )
    logs = (
        top.filter(F.col("rn") <= 20)
        .crossJoin(F.broadcast(thr))
        .select(
            F.log(F.col("f").cast("double") / F.col("f_thr")).alias("lr"),
            "f_thr",
        )
    )
    return logs.groupBy("f_thr").agg(
        F.lit(20).cast("long").alias("k"),
        F.round(
            20.0
            / F.aggregate(
                F.array_sort(F.collect_list("lr")),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            12,
        ).alias("hill_alpha"),
    ).select(
        "k",
        F.col("f_thr").cast("long").alias("f_threshold"),
        "hill_alpha",
    )




@query(
    "stats_odds_ratio_ci",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS clicked,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS bought
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    c AS (
      SELECT CAST(sum(clicked * bought) AS BIGINT) AS a,
             CAST(sum(clicked * (1 - bought)) AS BIGINT) AS b,
             CAST(sum((1 - clicked) * bought) AS BIGINT) AS c,
             CAST(sum((1 - clicked) * (1 - bought)) AS BIGINT) AS d
      FROM u
    )
    SELECT a, b, c, d,
           round(CAST(a * d AS DOUBLE) / (b * c), 12) AS odds_ratio,
           round(exp(ln(CAST(a * d AS DOUBLE) / (b * c))
                     - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 12)
             AS ci_low,
           round(exp(ln(CAST(a * d AS DOUBLE) / (b * c))
                     + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 12)
             AS ci_high,
           ln(CAST(a * d AS DOUBLE) / (b * c))
             - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d) > 0
             AS significant_05
    FROM c
    """,
)
def stats_odds_ratio_ci(spark: SparkSession, sf: str) -> DataFrame:
    """ODDS RATIO with the Woolf 95% CI for "on days a user clicked,
    did they also purchase?" — the user-day 2×2 contingency analysis
    behind every conversion-funnel claim (the ratio version of
    stats_ab_test_proportions' difference test; user-day, not user,
    because this corpus's 15 heavy users all do everything
    eventually — the finer unit is where the variation lives). One
    user-day collapse (two MAX flags), one 4-cell exact-count
    reduce; OR = ad/bc is a single division of exact BIGINTs and the
    CI is the mirrored ln±1.96·sqrt(Σ1/cell) expression, round
    12."""
    e = load(spark, sf, "events")
    u = e.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("clicked"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("bought"),
    )
    c = u.agg(
        F.sum(F.col("clicked") * F.col("bought")).alias("a"),
        F.sum(F.col("clicked") * (1 - F.col("bought"))).alias("b"),
        F.sum((1 - F.col("clicked")) * F.col("bought")).alias("c"),
        F.sum((1 - F.col("clicked")) * (1 - F.col("bought"))).alias("d"),
    )
    or_ = (F.col("a") * F.col("d")).cast("double") / (
        F.col("b") * F.col("c")
    )
    se = F.sqrt(
        1.0 / F.col("a")
        + 1.0 / F.col("b")
        + 1.0 / F.col("c")
        + 1.0 / F.col("d")
    )
    return c.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(or_, 12).alias("odds_ratio"),
        F.round(F.exp(F.log(or_) - 1.96 * se), 12).alias("ci_low"),
        F.round(F.exp(F.log(or_) + 1.96 * se), 12).alias("ci_high"),
        (F.log(or_) - 1.96 * se > 0).alias("significant_05"),
    )




@query(
    "stats_sprt_ab_monitor",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS k,
             CAST(sum(CASE WHEN event_type IN ('purchase', 'click')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM events
      WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
      GROUP BY 1
    ),
    llr AS (
      SELECT day, k, n,
             sum(k * ln(0.35 / 0.30)
                 + (n - k) * ln(0.65 / 0.70)) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_llr
      FROM daily
    )
    SELECT day, k, n, round(cum_llr, 6) AS cum_llr,
           CASE WHEN cum_llr >= ln(19.0) THEN 'accept_h1'
                WHEN cum_llr <= -ln(19.0) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr
    """,
)
def stats_sprt_ab_monitor(spark: SparkSession, sf: str) -> DataFrame:
    """WALD SPRT sequential monitor: the cumulative log-likelihood
    ratio of the daily purchase share among click∪purchase events,
    testing H₀: p=0.30 vs H₁: p=0.35 with α=β=0.05 boundaries
    ±ln 19 — the "can we stop the experiment early?" dashboard that
    a fixed-horizon test (stats_ab_test_proportions) cannot answer
    without peeking penalties. Daily (k, n) are exact integer
    counts; each day adds k·ln(p₁/p₀) + (n−k)·ln(q₁/q₀) — constants'
    logs — and the cumulative sum runs in DAY ORDER (a sequential
    window fold, identical on both engines), round 6 (the LLR grows
    with volume — high-precision rounds of large doubles are
    engine-specific)."""
    import math

    e = load(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        e.select(day.alias("day"), "event_type")
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("k"),
            F.sum(
                F.when(
                    F.col("event_type").isin("purchase", "click"), 1
                ).otherwise(0)
            ).alias("n"),
        )
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )  # 30-row aggregate — the tiny-window exception
    term = F.col("k") * F.log(F.lit(0.35) / F.lit(0.30)) + (
        F.col("n") - F.col("k")
    ) * F.log(F.lit(0.65) / F.lit(0.70))
    llr = daily.withColumn("cum_llr", F.sum(term).over(wcum))
    bound = math.log(19.0)
    return llr.select(
        "day",
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round("cum_llr", 6).alias("cum_llr"),
        F.when(F.col("cum_llr") >= bound, "accept_h1")
        .when(F.col("cum_llr") <= -bound, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )




@query(
    "stats_negbin_fit",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS q
      FROM grid GROUP BY event_type
    ),
    f AS (
      SELECT event_type, n_days, s, q,
             CAST(s AS DOUBLE) / n_days AS mean,
             (CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * s / n_days) / (n_days - 1) AS var
      FROM m
    )
    SELECT event_type, n_days,
           round(mean, 12) AS mean,
           round(var, 12) AS variance,
           CASE WHEN var > mean
                THEN round(mean * mean / (var - mean), 12) END AS nb_r,
           CASE WHEN var > mean
                THEN round(mean / var, 12) END AS nb_p,
           var > mean AS overdispersed
    FROM f
    """,
)
def stats_negbin_fit(spark: SparkSession, sf: str) -> DataFrame:
    """NEGATIVE-BINOMIAL method-of-moments fit per event type on the
    dense daily grids: r = m²/(v−m), p = m/v — the parametric
    companion to ts_overdispersion_index (the index says "not
    Poisson"; the NB fit says what to use instead — the dispersion
    parameter every anomaly threshold and forecast interval needs).
    Exact BIGINT Σn/Σn² per type; mean/var/r/p mirrored doubles,
    round 12; types with v ≤ m honestly report NULL (NB undefined)
    instead of a garbage negative r."""
    g = _daily_grid(spark, sf)
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    return m.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(mean, 12).alias("mean"),
        F.round(var, 12).alias("variance"),
        F.when(var > mean, F.round(mean * mean / (var - mean), 12)).alias(
            "nb_r"
        ),
        F.when(var > mean, F.round(mean / var, 12)).alias("nb_p"),
        (var > mean).alias("overdispersed"),
    )




@query(
    "stats_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    c AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    ),
    tot AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
      FROM c GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n, t.row_total,
           round(CAST(c.n AS DOUBLE) / t.row_total, 12) AS p
    FROM c JOIN tot t USING (from_type)
    """,
)
def stats_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """FIRST-ORDER MARKOV transition matrix over each user's event
    stream (ts order, event_id tiebreak): P(next=j | current=i) —
    the behavioral fingerprint behind session simulators, anomaly
    detectors ("error→error loops"), and next-action models. One
    lag window per user (the sessionization shuffle), one pair
    count, one row-normalize; counts exact, probabilities one
    division, round 12. The 5×5 output is tiny however large the
    stream."""
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy(
        F.col("prev").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return c.join(F.broadcast(tot), on="from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.col("row_total").cast("long").alias("row_total"),
        F.round(
            F.col("n").cast("double") / F.col("row_total"), 12
        ).alias("p"),
    )




@query(
    "stats_mcnemar_test",
    oracle="""
    WITH flags AS (
      SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(list_filter(
                    string_split_regex(trim(text), '\\s+'),
                    t -> t IN ('the','a','an','of','and','to','in','is',
                               'it','that'))) >= 3
                  THEN 1 ELSE 0 END AS rb
      FROM documents
    ),
    c AS (
      SELECT CAST(sum(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(sum((1 - ra) * rb) AS BIGINT) AS c
      FROM flags
    )
    SELECT b, c,
           CAST((b - c) * (b - c) AS BIGINT) AS chi2_num,
           CAST(b + c AS BIGINT) AS chi2_den,
           round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 12)
             AS mcnemar_chi2,
           round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                 / (b + c), 12) AS mcnemar_chi2_cc,
           CAST((b - c) * (b - c) AS DOUBLE) / (b + c) > 3.841
             AS significant_05
    FROM c
    """,
)
def stats_mcnemar_test(spark: SparkSession, sf: str) -> DataFrame:
    """McNEMAR'S paired test on the two quality raters of
    stats_cohens_kappa (length gate vs stopword gate): does one gate
    systematically fire where the other doesn't? Only the DISCORDANT
    cells matter — χ² = (b−c)²/(b+c) (plus the continuity-corrected
    variant) — which is why this pairs with kappa: kappa says "how
    much agreement", McNemar says "is the DISagreement biased one
    way". Numerator and denominator are exact BIGINTs; the two χ²
    forms are mirrored doubles, round 12; significance compares
    against the χ²₁ 95% critical value 3.841."""
    from ..functions.text import STOPWORDS, stopword_hits, tokens

    d = load(spark, sf, "documents")
    ra = F.when(F.col("n_chars") >= 250, 1).otherwise(0)
    rb = F.when(
        stopword_hits(tokens("text"), STOPWORDS["en"]) >= 3, 1
    ).otherwise(0)
    c = d.select(ra.alias("ra"), rb.alias("rb")).agg(
        F.sum(F.col("ra") * (1 - F.col("rb"))).alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).alias("c"),
    )
    diff2 = (F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))
    chi2 = diff2.cast("double") / (F.col("b") + F.col("c"))
    cc = (F.abs(F.col("b") - F.col("c")) - 1)
    return c.select(
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        diff2.cast("long").alias("chi2_num"),
        (F.col("b") + F.col("c")).cast("long").alias("chi2_den"),
        F.round(chi2, 12).alias("mcnemar_chi2"),
        F.round(
            (cc * cc).cast("double") / (F.col("b") + F.col("c")), 12
        ).alias("mcnemar_chi2_cc"),
        (chi2 > 3.841).alias("significant_05"),
    )




@query(
    "stats_gumbel_block_maxima",
    oracle="""
    WITH hourly AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             date_part('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      WHERE event_type = 'click'
        AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
      GROUP BY 1, 2
    ),
    mx AS (
      SELECT day, CAST(max(n) AS BIGINT) AS block_max
      FROM hourly GROUP BY day
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(block_max) AS BIGINT) AS s,
             CAST(sum(block_max * block_max) AS BIGINT) AS q,
             CAST(max(block_max) AS BIGINT) AS overall_max
      FROM mx
    )
    SELECT n_blocks, overall_max,
           round(CAST(s AS DOUBLE) / n_blocks, 12) AS mean_max,
           round(sqrt((CAST(q AS DOUBLE)
                       - CAST(s AS DOUBLE) * s / n_blocks)
                      / (n_blocks - 1)) * sqrt(6.0) / pi(), 12)
             AS gumbel_beta,
           round(CAST(s AS DOUBLE) / n_blocks
                 - 0.5772156649015329
                   * (sqrt((CAST(q AS DOUBLE)
                            - CAST(s AS DOUBLE) * s / n_blocks)
                           / (n_blocks - 1)) * sqrt(6.0) / pi()), 12)
             AS gumbel_mu
    FROM m
    """,
)
def stats_gumbel_block_maxima(spark: SparkSession, sf: str) -> DataFrame:
    """GUMBEL (EV-I) fit to the DAILY MAXIMA of hourly click counts by
    method of moments — β = s·√6/π, μ = x̄ − γβ — the extreme-value
    threshold behind "what hourly burst should the autoscaler expect
    once a month?" (Tukey/IQR fences describe the body; EVT
    describes the record). Block maxima come from one (day, hour)
    aggregate + a per-day MAX — exact integers; the two-parameter
    fit is a mirrored double expression, round 12 (π and the
    Euler-Mascheroni constant are literals on both engines)."""
    e = load(spark, sf, "events").filter(F.col("event_type") == "click")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    hourly = (
        e.select(day.alias("day"), F.hour("ts").alias("hr"))
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .groupBy("day", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mx = hourly.groupBy("day").agg(F.max("n").alias("block_max"))
    m = mx.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("block_max").alias("s"),
        F.sum(F.col("block_max") * F.col("block_max")).alias("q"),
        F.max("block_max").alias("overall_max"),
    )
    import math

    mean = F.col("s").cast("double") / F.col("n_blocks")
    sd = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n_blocks")
        )
        / (F.col("n_blocks") - 1)
    )
    beta = sd * math.sqrt(6.0) / math.pi
    return m.select(
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("overall_max").cast("long").alias("overall_max"),
        F.round(mean, 12).alias("mean_max"),
        F.round(beta, 12).alias("gumbel_beta"),
        F.round(mean - 0.5772156649015329 * beta, 12).alias("gumbel_mu"),
    )




@query(
    "stats_theil_index",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice) AS BIGINT)) AS BIGINT)
               AS d
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    tot AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS x
      FROM rev GROUP BY c_nationkey
    ),
    terms AS (
      SELECT r.c_nationkey,
             (CAST(r.d AS DOUBLE) / t.x)
               * ln(CAST(r.d * t.n AS DOUBLE) / t.x) AS term
      FROM rev r JOIN tot t USING (c_nationkey)
      WHERE r.d > 0
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_sort(list(term))), (a, v) -> a + v), 12)
             AS theil_t
    FROM terms GROUP BY c_nationkey
    """,
)
def stats_theil_index(spark: SparkSession, sf: str) -> DataFrame:
    """THEIL T inequality index of customer revenue per nation:
    T = Σ (xᵢ/X)·ln(xᵢ·n/X) — the entropy-family inequality measure
    that DECOMPOSES (within-group + between-group terms add up),
    which Gini cannot do; the third lens beside olap_customer_hhi
    (head-weighted) and the Gini family (curve-weighted). Each ln
    argument is one division of exact integer products; per-nation
    terms fold smallest-first (sorted-fold discipline), round 12."""
    o = load(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("d"))
    )
    tot = rev.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("d").alias("x")
    )
    terms = (
        rev.join(F.broadcast(tot), on="c_nationkey")
        .filter(F.col("d") > 0)
        .select(
            "c_nationkey",
            (
                (F.col("d").cast("double") / F.col("x"))
                * F.log((F.col("d") * F.col("n")).cast("double") / F.col("x"))
            ).alias("term"),
        )
    )
    return terms.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("term")),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            12,
        ).alias("theil_t"),
    )




@query(
    "stats_record_days",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    rec AS (
      SELECT event_type, day, n,
             CASE WHEN day = 0 OR n > max(n) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS is_record
      FROM grid
    ),
    h AS (
      SELECT CAST(3.9949871309203906 AS DOUBLE) AS harmonic  -- H_30, pinned literal
    )
    SELECT event_type,
           CAST(sum(is_record) AS BIGINT) AS n_records,
           round(h.harmonic, 12) AS expected_records,
           round(CAST(sum(is_record) AS DOUBLE) / h.harmonic, 12)
             AS record_excess
    FROM rec CROSS JOIN h
    GROUP BY event_type, h.harmonic
    """,
)
def stats_record_days(spark: SparkSession, sf: str) -> DataFrame:
    """RECORD-DAY census: how many days set a new all-time daily-count
    high per event type, vs the H₃₀ ≈ 3.99 records an EXCHANGEABLE
    (trend-free) series would produce — the distribution-free trend
    detector from record theory (excess ≫ 1 = growth; ≪ 1 = decay
    or early spike). Records come from one running-max window per
    type on the dense grid; the harmonic expectation H_30 is a
    PINNED double literal identical in both programs (an aggregate
    over range() would depend on engine fold order). Counts exact;
    two rounded floats."""
    g = _daily_grid(spark, sf)
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = g.select(
        "event_type",
        F.when(
            (F.col("day") == 0)
            | (F.col("n") > F.max("n").over(wprev)),
            1,
        )
        .otherwise(0)
        .alias("is_record"),
    )
    # H_30 as the same ascending fold the oracle runs
    harmonic = float(sum(1.0 / (i + 1) for i in range(30)))
    return rec.groupBy("event_type").agg(
        F.sum("is_record").cast("long").alias("n_records"),
        F.round(F.lit(harmonic), 12).alias("expected_records"),
        F.round(
            F.sum("is_record").cast("double") / F.lit(harmonic), 12
        ).alias("record_excess"),
    )




@query(
    "stats_ljung_box",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events
      WHERE event_type = 'click'
        AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
      GROUP BY 1
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s
      FROM daily
    ),
    lags AS (SELECT CAST(range AS BIGINT) AS k FROM range(1, 8)),
    ck AS (
      SELECT l.k,
             CAST(sum((b.n * a.x - b.s) * (b.n * c.x - b.s)) AS BIGINT)
               AS chat
      FROM lags l
      CROSS JOIN base b
      JOIN daily a ON TRUE
      JOIN daily c ON c.day = a.day + l.k
      GROUP BY l.k
    ),
    c0 AS (
      SELECT CAST(sum((b.n * d.x - b.s) * (b.n * d.x - b.s)) AS BIGINT)
               AS c0
      FROM daily d CROSS JOIN base b
    ),
    terms AS (
      SELECT ck.k,
             (CAST(ck.chat AS DOUBLE) / c0.c0)
               * (CAST(ck.chat AS DOUBLE) / c0.c0)
               / (b.n - ck.k) AS t,
             b.n
      FROM ck CROSS JOIN c0 CROSS JOIN base b
    )
    SELECT CAST(min(n) AS BIGINT) AS n_days,
           CAST(7 AS BIGINT) AS n_lags,
           round(min(n) * (min(n) + 2)
                 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_sort(list(t))), (a, v) -> a + v), 12)
             AS ljung_box_q,
           min(n) * (min(n) + 2)
             * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_sort(list(t))), (a, v) -> a + v) > 14.067
             AS reject_white_noise_05
    FROM terms
    """,
)
def stats_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    """LJUNG–BOX portmanteau test on the click daily series: Q =
    n(n+2)·Σₖ r²ₖ/(n−k) over lags 1..7 — "is there ANY
    autocorrelation structure at all?", the single gate to run
    before trusting white-noise assumptions (and the honest
    pre-check for ts_autocorr_multi_lag's per-lag reads). Exactness
    device: the n²-scaled autocovariance ĉₖ = Σ(n·xₜ−S)(n·xₜ₊ₖ−S)
    is an EXACT BIGINT (the n² factors cancel in rₖ = ĉₖ/ĉ₀), so
    each r²ₖ is a ratio of exact integers; the 7 terms fold
    smallest-first, round 12; the 5% χ²₇ critical value 14.067 is a
    pinned literal."""
    e = load(spark, sf, "events").filter(F.col("event_type") == "click")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        e.select(day.alias("day"))
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    daily = daily.localCheckpoint(eager=False)  # consumed 3×
    base = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    c = daily.select(F.col("day").alias("dc"), F.col("x").alias("xc"))
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    ck = (
        a.crossJoin(F.broadcast(lags))
        .join(c, F.col("dc") == F.col("da") + F.col("k"))
        .crossJoin(F.broadcast(base))
        .groupBy("k")
        .agg(
            F.sum(
                (F.col("n") * F.col("xa") - F.col("s"))
                * (F.col("n") * F.col("xc") - F.col("s"))
            ).alias("chat")
        )
    )
    c0 = (
        daily.crossJoin(F.broadcast(base))
        .agg(
            F.sum(
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
            ).alias("c0")
        )
    )
    terms = (
        ck.crossJoin(F.broadcast(c0))
        .crossJoin(F.broadcast(base))
        .select(
            "n",
            (
                (F.col("chat").cast("double") / F.col("c0"))
                * (F.col("chat").cast("double") / F.col("c0"))
                / (F.col("n") - F.col("k"))
            ).alias("t"),
        )
    )
    q = F.min("n") * (F.min("n") + 2) * F.aggregate(
        F.array_sort(F.collect_list("t")), F.lit(0.0), lambda a_, v: a_ + v
    )
    return terms.agg(
        F.min("n").cast("long").alias("n_days"),
        F.lit(7).cast("long").alias("n_lags"),
        F.round(q, 12).alias("ljung_box_q"),
        (q > 14.067).alias("reject_white_noise_05"),
    )




@query(
    "stats_birthday_collision_check",
    oracle="""
    WITH b AS (
      SELECT CAST((strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                  * 16
                  + (strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               AS BIGINT) AS bucket
      FROM documents
    ),
    per AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY bucket
    ),
    m AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_items,
             CAST(count(*) AS BIGINT) AS occupied,
             CAST(sum(n * (n - 1)) AS BIGINT) AS pairs2,
             CAST(max(n) AS BIGINT) AS max_bucket
      FROM per
    )
    SELECT n_items, occupied, max_bucket,
           CAST(pairs2 // 2 AS BIGINT) AS observed_pairs,
           round(CAST(n_items AS DOUBLE) * (n_items - 1) / (2 * 256),
                 6) AS expected_pairs,
           round(CAST(pairs2 AS DOUBLE) * 256
                 / (CAST(n_items AS DOUBLE) * (n_items - 1)), 12)
             AS collision_ratio
    FROM m
    """,
)
def stats_birthday_collision_check(spark: SparkSession, sf: str) -> DataFrame:
    """BIRTHDAY-BOUND hash-quality check: pairs of doc_ids landing in
    the same 8-bit md5 bucket, observed vs the n(n−1)/2m expectation
    — the partitioning-health probe behind every hash-keyed shuffle
    and salting decision in this repo (a ratio ≫ 1 means the hash or
    the key distribution is broken and hot partitions follow).
    Collision pairs Σn(n−1)/2 and the max-bucket load are exact
    integers; the expectation (10³-magnitude) rounds at 6 and the
    O(1) ratio at 12. One bucket groupBy + a one-row reduce."""
    d = load(spark, sf, "documents").select("doc_id")

    def digit(i: int) -> F.Column:
        return F.expr(
            "instr('0123456789abcdef',"
            f" substr(md5(cast(doc_id as string)), {i}, 1)) - 1"
        )

    per = d.groupBy(
        (digit(1) * 16 + digit(2)).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = per.agg(
        F.sum("n").alias("n_items"),
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("pairs2"),
        F.max("n").alias("max_bucket"),
    )
    return m.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.col("occupied").cast("long").alias("occupied"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        F.expr("pairs2 div 2").alias("observed_pairs"),
        F.round(
            F.col("n_items").cast("double")
            * (F.col("n_items") - 1)
            / (2 * 256),
            6,
        ).alias("expected_pairs"),
        F.round(
            F.col("pairs2").cast("double")
            * 256
            / (F.col("n_items").cast("double") * (F.col("n_items") - 1)),
            12,
        ).alias("collision_ratio"),
    )




@query(
    "stats_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events
      WHERE event_type = 'click'
        AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
      GROUP BY 1
    ),
    n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    s_ AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY x HAVING count(*) > 1)
    )
    SELECT s_.s, n_.n,
           CAST(n_.n * (n_.n - 1) * (2 * n_.n + 5) - ties.tie_term
             AS BIGINT) AS var18,
           round(CASE
             WHEN s_.s > 0 THEN (s_.s - 1)
               / sqrt((n_.n * (n_.n - 1) * (2 * n_.n + 5)
                       - ties.tie_term) / 18.0)
             WHEN s_.s < 0 THEN (s_.s + 1)
               / sqrt((n_.n * (n_.n - 1) * (2 * n_.n + 5)
                       - ties.tie_term) / 18.0)
             ELSE 0.0 END, 12) AS z_stat,
           abs(CASE
             WHEN s_.s > 0 THEN (s_.s - 1)
               / sqrt((n_.n * (n_.n - 1) * (2 * n_.n + 5)
                       - ties.tie_term) / 18.0)
             WHEN s_.s < 0 THEN (s_.s + 1)
               / sqrt((n_.n * (n_.n - 1) * (2 * n_.n + 5)
                       - ties.tie_term) / 18.0)
             ELSE 0.0 END) > 1.96 AS trend_05
    FROM s_ CROSS JOIN n_ CROSS JOIN ties
    """,
)
def stats_mann_kendall(spark: SparkSession, sf: str) -> DataFrame:
    """MANN–KENDALL trend test on the click daily series: S =
    Σᵢ<ⱼ sign(xⱼ−xᵢ) with the tie-corrected variance — the
    distribution-free monotone-trend test (pairs with
    stats_record_days' record census and ts_theil_sen_trend's slope:
    MK is the significance, Theil–Sen the magnitude). The pairwise
    sign sum runs over the 30-day grid self-join (435 pairs — tiny
    by construction); S and 18·Var(S) are EXACT BIGINTs; the
    continuity-corrected z is one mirrored double, round 12."""
    e = load(spark, sf, "events").filter(F.col("event_type") == "click")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        e.select(day.alias("day"))
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    daily = daily.localCheckpoint(eager=False)  # consumed 3×
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s_ = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    n_ = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    m = s_.crossJoin(F.broadcast(n_)).crossJoin(F.broadcast(ties))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    )
    sd = F.sqrt(var18 / 18.0)
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / sd)
        .when(F.col("s") < 0, (F.col("s") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return m.select(
        F.col("s").cast("long").alias("s"),
        F.col("n").cast("long").alias("n"),
        var18.cast("long").alias("var18"),
        F.round(z, 12).alias("z_stat"),
        (F.abs(z) > 1.96).alias("trend_05"),
    )




@query(
    "stats_cochran_armitage",
    oracle="""
    WITH base AS (
      SELECT dayofweek(CAST(ts AS DATE)) AS w,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    g AS (
      SELECT CAST(w AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hit) AS BIGINT) AS k
      FROM base GROUP BY w
    ),
    m AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(k) AS BIGINT) AS kk,
             CAST(sum(k * w) AS BIGINT) AS skw,
             CAST(sum(n * w) AS BIGINT) AS snw,
             CAST(sum(n * w * w) AS BIGINT) AS snww
      FROM g
    )
    SELECT nn AS n_trials, kk AS n_hits,
           CAST(nn * skw - kk * snw AS BIGINT) AS trend_num,
           round(CAST(nn * skw - kk * snw AS DOUBLE)
                 / sqrt(CAST(kk AS DOUBLE) * (nn - kk)
                        * (CAST(nn AS DOUBLE) * snww - CAST(snw AS DOUBLE)
                           * snw) / nn),
                 12) AS z_stat,
           abs(CAST(nn * skw - kk * snw AS DOUBLE)
               / sqrt(CAST(kk AS DOUBLE) * (nn - kk)
                      * (CAST(nn AS DOUBLE) * snww - CAST(snw AS DOUBLE)
                         * snw) / nn)) > 1.96 AS trend_05
    FROM m
    """,
)
def stats_cochran_armitage(spark: SparkSession, sf: str) -> DataFrame:
    """COCHRAN–ARMITAGE trend-in-proportions test: does the purchase
    share (among click∪purchase events) rise or fall MONOTONICALLY
    across the ordered day-of-week groups? — the right test when the
    χ² independence check (stats_chi2_type_dow) would waste power
    ignoring the ordering. Scores = the dow index itself; the trend
    numerator N·Σkw − K·Σnw is an EXACT BIGINT and the variance
    assembles from exact Σn, Σnw, Σnw² in one mirrored expression,
    round 12. Dow convention pinned (DuckDB 0-6 ≡ Spark dayofweek−1,
    both applied explicitly). One conditional aggregate."""
    e = load(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    w = (F.dayofweek(F.col("ts").cast("date")) - 1).cast("long")
    g = e.select(
        w.alias("w"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("hit"),
    ).groupBy("w").agg(
        F.count(F.lit(1)).alias("n"), F.sum("hit").alias("k")
    )
    m = g.agg(
        F.sum("n").alias("nn"),
        F.sum("k").alias("kk"),
        F.sum(F.col("k") * F.col("w")).alias("skw"),
        F.sum(F.col("n") * F.col("w")).alias("snw"),
        F.sum(F.col("n") * F.col("w") * F.col("w")).alias("snww"),
    )
    num = F.col("nn") * F.col("skw") - F.col("kk") * F.col("snw")
    den = F.sqrt(
        F.col("kk").cast("double")
        * (F.col("nn") - F.col("kk"))
        * (
            F.col("nn").cast("double") * F.col("snww")
            - F.col("snw").cast("double") * F.col("snw")
        )
        / F.col("nn")
    )
    z = num.cast("double") / den
    return m.select(
        F.col("nn").cast("long").alias("n_trials"),
        F.col("kk").cast("long").alias("n_hits"),
        num.cast("long").alias("trend_num"),
        F.round(z, 12).alias("z_stat"),
        (F.abs(z) > 1.96).alias("trend_05"),
    )




# ===========================================================================
# Coverage round 9: multiple-testing control, paired nonparametrics,
# sequential drift detection
# ===========================================================================


@query(
    "stats_bh_fdr",
    oracle="""
    WITH ords AS (
      SELECT c.c_nationkey AS nation,
             o.o_orderdate < DATE '1995-07-01' AS h1,
             o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1996-01-01'
    ),
    per AS (
      SELECT nation,
             CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN h1 AND hi THEN 1 ELSE 0 END) AS BIGINT)
               AS x1,
             CAST(sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN NOT h1 AND hi THEN 1 ELSE 0 END) AS BIGINT)
               AS x2
      FROM ords GROUP BY nation
      HAVING sum(CASE WHEN h1 THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) > 0
         -- degenerate pooled rates (ADVICE r9): all-hi or no-hi
         -- nations give pooled ∈ {0,1} → z = 0/0 = NaN
         AND sum(CASE WHEN hi THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN hi THEN 1 ELSE 0 END) < count(*)
    ),
    zed AS (
      SELECT nation, n1, x1, n2, x2,
             (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)) AS z
      FROM per
    ),
    xt AS (
      SELECT nation, n1 + n2 AS n_orders, z,
             abs(z) / 1.4142135623730951 AS x,
             1.0 / (1.0 + 0.3275911 * (abs(z) / 1.4142135623730951)) AS t
      FROM zed
    ),
    pv AS (
      SELECT nation, n_orders, round(z, 9) AS z_stat,
             round((0.254829592 * t
                    - 0.284496736 * (t * t)
                    + 1.421413741 * (t * t * t)
                    - 1.453152027 * (t * t * t * t)
                    + 1.061405429 * (t * t * t * t * t))
                   * exp(-(x * x)), 12) AS p_value
      FROM xt
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_value, nation)
                  AS BIGINT) AS p_rank,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pv
    ),
    kmax AS (
      SELECT coalesce(max(CASE WHEN p_value <= p_rank * 0.10 / m
                                THEN p_rank END), 0) AS k
      FROM ranked
    )
    SELECT nation, n_orders, z_stat, p_value, p_rank,
           round(p_rank * 0.10 / m, 12) AS bh_threshold,
           p_rank <= (SELECT k FROM kmax) AS rejected
    FROM ranked
    """,
)
def stats_bh_fdr(spark: SparkSession, sf: str) -> DataFrame:
    """BENJAMINI–HOCHBERG FDR control over a 25-hypothesis family: per
    customer nation, a two-proportion z-test of high-priority order
    share, 1995H1 vs 1995H2, then the step-up procedure at q=0.10
    (round 13: retargeted from 1994, which predates the fixture's
    orders span 1995-01-01.. — the family was EMPTY at every SF)
    (reject ranks 1..k for the largest k with p₍ₖ₎ ≤ k·q/m) — the
    standard guard when a pipeline fires one test per segment and
    reports "significant" slices. Counts are exact BIGINTs; z is one
    mirrored double; the two-sided p uses the Abramowitz–Stegun
    7.1.26 erfc polynomial (|err| < 1.5e-7, mirrored term-for-term in
    the oracle, round 12) so both engines compute the identical
    defined statistic. The family is nation-bounded (25 rows), so the
    rank window and the step-up max are driver-trivial at any corpus
    scale; the per-nation counts are one map-combinable groupBy."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    ords = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .select(
            F.col("c_nationkey").alias("nation"),
            (F.col("o_orderdate") < F.lit("1995-07-01").cast("date")).alias(
                "h1"
            ),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hi"),
        )
    )
    per = (
        ords.groupBy("nation")
        .agg(
            F.sum(F.when(F.col("h1"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("h1") & F.col("hi"), 1).otherwise(0)).alias(
                "x1"
            ),
            F.sum(F.when(~F.col("h1"), 1).otherwise(0)).alias("n2"),
            F.sum(
                F.when(~F.col("h1") & F.col("hi"), 1).otherwise(0)
            ).alias("x2"),
        )
        .filter(
            (F.col("n1") > 0)
            & (F.col("n2") > 0)
            # degenerate pooled rates (ADVICE r9): a nation whose 1995
            # orders are all (or none) high-priority has pooled ∈ {0,1},
            # a zero variance denominator, and z = 0/0 = NaN that would
            # flow into the rank window — exclude it, mirrored in the
            # oracle's HAVING.
            & (F.col("x1") + F.col("x2") > 0)
            & (F.col("x1") + F.col("x2") < F.col("n1") + F.col("n2"))
        )
    )
    pooled = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = (
        F.col("x1").cast("double") / F.col("n1")
        - F.col("x2").cast("double") / F.col("n2")
    ) / F.sqrt(
        pooled * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    zed = per.select("nation", (F.col("n1") + F.col("n2")).alias("n_orders"), z.alias("z"))
    x = F.abs(F.col("z")) / F.lit(1.4142135623730951)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    erfc = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * (t * t)
        + F.lit(1.421413741) * (t * t * t)
        - F.lit(1.453152027) * (t * t * t * t)
        + F.lit(1.061405429) * (t * t * t * t * t)
    ) * F.exp(-(x * x))
    pv = zed.select(
        "nation",
        "n_orders",
        F.round(F.col("z"), 9).alias("z_stat"),
        F.round(erfc, 12).alias("p_value"),
    )
    w = Window.orderBy("p_value", "nation")
    ranked = pv.select(
        "*",
        F.row_number().over(w).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).cast("long").alias("m"),
    )
    ranked = ranked.localCheckpoint(eager=False)  # consumed twice
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_value")
                    <= F.col("p_rank") * F.lit(0.10) / F.col("m"),
                    F.col("p_rank"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "nation",
            "n_orders",
            "z_stat",
            "p_value",
            "p_rank",
            F.round(F.col("p_rank") * F.lit(0.10) / F.col("m"), 12).alias(
                "bh_threshold"
            ),
            (F.col("p_rank") <= F.col("k")).alias("rejected"),
        )
    )




@query(
    "stats_wilcoxon_signed_rank",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    paired AS (
      SELECT g1.day, g1.n - g2.n AS d
      FROM grid g1 JOIN grid g2 ON g1.day = g2.day
      WHERE g1.event_type = 'click' AND g2.event_type = 'view'
        AND g1.n <> g2.n
    ),
    rk AS (
      SELECT d,
             CAST(2 * rank() OVER (ORDER BY abs(d))
                  + count(*) OVER (PARTITION BY abs(d)) - 1 AS BIGINT)
               AS two_r,
             CAST(count(*) OVER (PARTITION BY abs(d)) AS BIGINT) AS t
      FROM paired
    ),
    agg_ AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN d > 0 THEN two_r ELSE 0 END) AS BIGINT)
               AS two_w_plus
      FROM rk
    ),
    ties AS (
      SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie_term
      FROM (SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS t
            FROM paired GROUP BY abs(d))
      WHERE t > 1
    )
    SELECT n, two_w_plus, tie_term,
           round((two_w_plus / 2.0 - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0
                        - tie_term / 48.0), 12) AS z_stat
    FROM agg_ CROSS JOIN ties
    """,
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf: str) -> DataFrame:
    """WILCOXON SIGNED-RANK paired test — clicks vs views paired by
    day over the dense 30-day grid: zero differences dropped, |d|
    ranked with midranks, W⁺ = Σ ranks of positive d, tie-corrected
    normal approximation. The midranks ride the doubled-rank device
    (2r = 2·rank + t − 1, exact BIGINT — same integer trick as
    stats_mann_whitney_u), so W⁺ is carried as 2W⁺ exactly and the
    only double is the final mirrored z (round 12). The series is
    30 points by construction; at corpus scale the grid aggregation
    is the usual map-combinable daily rollup."""
    g = _daily_grid(spark, sf)
    clicks = g.filter(F.col("event_type") == "click").select(
        "day", F.col("n").alias("nc")
    )
    views = g.filter(F.col("event_type") == "view").select(
        "day", F.col("n").alias("nv")
    )
    paired = (
        clicks.join(views, "day")
        .select((F.col("nc") - F.col("nv")).alias("d"))
        .filter(F.col("d") != 0)
    )
    paired = paired.localCheckpoint(eager=False)  # consumed twice
    rk = paired.select(
        "d",
        (
            F.lit(2) * F.rank().over(Window.orderBy(F.abs(F.col("d"))))
            + F.count(F.lit(1)).over(Window.partitionBy(F.abs(F.col("d"))))
            - F.lit(1)
        ).cast("long").alias("two_r"),
    )
    agg_ = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("two_r")).otherwise(0))
        .cast("long")
        .alias("two_w_plus"),
    )
    ties = (
        paired.groupBy(F.abs(F.col("d")).alias("ad"))
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0).cast("long"),
            ).alias("tie_term")
        )
    )
    m = agg_.crossJoin(F.broadcast(ties))
    z = (
        F.col("two_w_plus") / F.lit(2.0)
        - F.col("n") * (F.col("n") + 1) / F.lit(4.0)
    ) / F.sqrt(
        F.col("n") * (F.col("n") + F.lit(1.0)) * (2 * F.col("n") + 1)
        / F.lit(24.0)
        - F.col("tie_term") / F.lit(48.0)
    )
    return m.select(
        "n", "two_w_plus", "tie_term", F.round(z, 12).alias("z_stat")
    )




@query(
    "stats_page_hinkley",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    cum AS (
      SELECT event_type, day, n,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS s,
             CAST(day + 1 AS BIGINT) AS k
      FROM grid
    ),
    dev AS (
      SELECT event_type, day,
             sum(n - CAST(s AS DOUBLE) / k)
               OVER (PARTITION BY event_type ORDER BY day) AS m_t
      FROM cum
    ),
    ph AS (
      SELECT event_type, day, m_t,
             max(m_t) OVER (PARTITION BY event_type ORDER BY day) - m_t
               AS ph_t
      FROM dev
    ),
    best AS (
      SELECT event_type, max(ph_t) AS ph_max FROM ph GROUP BY event_type
    )
    SELECT p.event_type, round(b.ph_max, 9) AS ph_max,
           CAST(min(p.day) AS INT) AS argmax_day
    FROM ph p JOIN best b
      ON p.event_type = b.event_type AND p.ph_t = b.ph_max
    GROUP BY p.event_type, b.ph_max
    """,
)
def stats_page_hinkley(spark: SparkSession, sf: str) -> DataFrame:
    """PAGE–HINKLEY sequential drift detector (δ=0) replayed over each
    event stream's dense 30-day grid: mₜ = Σᵢ≤ₜ(xᵢ − x̄ᵢ) with x̄ᵢ the
    running mean, PHₜ = max(mₛ)ₛ≤ₜ − mₜ; reports each stream's peak
    downward-drift score and the day it fired. Running means are exact
    S/k IEEE divisions off a cumulative BIGINT sum; the mₜ fold is a
    sequential cumulative window in day order (identical accumulation
    order on both engines — the sorted-fold device), rounded only at
    the end. Per-key state is one cumulative window over a bounded
    series; at corpus scale this is the standard streaming-drift
    replay shape (per-key ordered scan, no global sort)."""
    g = _daily_grid(spark, sf)
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(wcum).cast("long").alias("s"),
        (F.col("day") + 1).cast("long").alias("k"),
    )
    dev = cum.select(
        "event_type",
        "day",
        F.sum(
            F.col("n") - F.col("s").cast("double") / F.col("k")
        ).over(wcum).alias("m_t"),
    )
    ph = dev.select(
        "event_type",
        "day",
        (F.max("m_t").over(wcum) - F.col("m_t")).alias("ph_t"),
    )
    ph = ph.localCheckpoint(eager=False)  # consumed twice
    best = ph.groupBy("event_type").agg(F.max("ph_t").alias("ph_max"))
    return (
        ph.join(F.broadcast(best), "event_type")
        .filter(F.col("ph_t") == F.col("ph_max"))
        .groupBy("event_type", "ph_max")
        .agg(F.min("day").cast("int").alias("argmax_day"))
        .select(
            "event_type",
            F.round("ph_max", 9).alias("ph_max"),
            "argmax_day",
        )
    )




@query(
    "stats_tost_equivalence",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    halves AS (
      SELECT event_type, day < 15 AS h1, n FROM grid
    ),
    per AS (
      SELECT event_type,
             CAST(sum(CASE WHEN h1 THEN n ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN h1 THEN n * n ELSE 0 END) AS BIGINT)
               AS q1,
             CAST(sum(CASE WHEN NOT h1 THEN n ELSE 0 END) AS BIGINT)
               AS s2,
             CAST(sum(CASE WHEN NOT h1 THEN n * n ELSE 0 END) AS BIGINT)
               AS q2
      FROM halves GROUP BY event_type
    ),
    m AS (
      SELECT event_type,
             CAST(s1 AS DOUBLE) / 15 AS m1, CAST(s2 AS DOUBLE) / 15 AS m2,
             (q1 - CAST(s1 AS DOUBLE) * s1 / 15) / 14 AS v1,
             (q2 - CAST(s2 AS DOUBLE) * s2 / 15) / 14 AS v2,
             0.1 * ((CAST(s1 AS DOUBLE) + s2) / 30) AS margin
      FROM per
    )
    SELECT event_type, round(m1, 9) AS mean_h1, round(m2, 9) AS mean_h2,
           round(margin, 9) AS margin,
           round((m1 - m2 + margin) / sqrt(v1 / 15 + v2 / 15), 12)
             AS t_lower,
           round((m1 - m2 - margin) / sqrt(v1 / 15 + v2 / 15), 12)
             AS t_upper,
           (m1 - m2 + margin) / sqrt(v1 / 15 + v2 / 15) > 1.645
             AND (m1 - m2 - margin) / sqrt(v1 / 15 + v2 / 15) < -1.645
             AS equivalent
    FROM m
    """,
)
def stats_tost_equivalence(spark: SparkSession, sf: str) -> DataFrame:
    """TOST EQUIVALENCE test (two one-sided Welch t's) — is each
    stream's daily level in the second half EQUIVALENT to the first
    half within a ±10%-of-mean margin? The question A/B "no change"
    claims actually need (absence of significance ≠ equivalence).
    Moments are exact BIGINTs; means/variances/margin are mirrored
    single divisions; both one-sided t's use the z critical value
    1.645 (dfs here ≈ 28, documented approximation — the decision
    boundary, not the statistic, absorbs it). Map-combinable moments,
    category-bounded output."""
    g = _daily_grid(spark, sf)
    per = g.groupBy("event_type").agg(
        F.sum(F.when(F.col("day") < 15, F.col("n")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(
            F.when(F.col("day") < 15, F.col("n") * F.col("n")).otherwise(0)
        )
        .cast("long")
        .alias("q1"),
        F.sum(F.when(F.col("day") >= 15, F.col("n")).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(
                F.col("day") >= 15, F.col("n") * F.col("n")
            ).otherwise(0)
        )
        .cast("long")
        .alias("q2"),
    )
    m1 = F.col("s1").cast("double") / 15
    m2 = F.col("s2").cast("double") / 15
    v1 = (F.col("q1") - F.col("s1").cast("double") * F.col("s1") / 15) / 14
    v2 = (F.col("q2") - F.col("s2").cast("double") * F.col("s2") / 15) / 14
    margin = F.lit(0.1) * ((F.col("s1").cast("double") + F.col("s2")) / 30)
    se = F.sqrt(v1 / 15 + v2 / 15)
    t_lo = (m1 - m2 + margin) / se
    t_hi = (m1 - m2 - margin) / se
    return per.select(
        "event_type",
        F.round(m1, 9).alias("mean_h1"),
        F.round(m2, 9).alias("mean_h2"),
        F.round(margin, 9).alias("margin"),
        F.round(t_lo, 12).alias("t_lower"),
        F.round(t_hi, 12).alias("t_upper"),
        ((t_lo > 1.645) & (t_hi < -1.645)).alias("equivalent"),
    )




@query(
    "stats_cvm_test",
    oracle="""
    WITH vals AS (
      SELECT value, event_type = 'click' AS is_a
      FROM events WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
      SELECT is_a,
             CAST(rank() OVER (ORDER BY value) AS BIGINT) AS r,
             CAST(row_number() OVER (PARTITION BY is_a ORDER BY value)
               AS BIGINT) AS i
      FROM vals
    ),
    per AS (
      SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
               AS m,
             CAST(sum(CASE WHEN is_a THEN (r - i) * (r - i) ELSE 0 END)
               AS BIGINT) AS da,
             CAST(sum(CASE WHEN NOT is_a THEN (r - i) * (r - i)
                      ELSE 0 END) AS BIGINT) AS db
      FROM ranked
    )
    SELECT n, m, CAST(n * da + m * db AS BIGINT) AS u_stat,
           round(CAST(n * da + m * db AS DOUBLE)
                   / (CAST(n AS DOUBLE) * m * (n + m))
                 - (4.0 * n * m - 1) / (6.0 * (n + m)), 12) AS t_stat
    FROM per
    """,
)
def stats_cvm_test(spark: SparkSession, sf: str) -> DataFrame:
    """CRAMÉR–VON MISES two-sample test (click vs view value
    distributions) in the Anderson rank formulation: U = n·Σ(rᵢ−i)² +
    m·Σ(sⱼ−j)², T = U/(nm(n+m)) − (4nm−1)/(6(n+m)) — the
    whole-distribution companion to the KS test (T weights the body,
    KS the worst point; both belong in a drift gate). Ranks use
    min-rank on ties and the within-group index is a row_number whose
    tie assignment provably cancels in the squared sum, so U is an
    exact BIGINT on both engines. The only global structure is the
    combined rank — at corpus scale it shards by value range exactly
    like stats_quantile_normalize."""
    e = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    vals = e.select(
        "value", (F.col("event_type") == "click").alias("is_a")
    )
    ranked = vals.select(
        "is_a",
        F.rank().over(Window.orderBy("value")).cast("long").alias("r"),
        F.row_number()
        .over(Window.partitionBy("is_a").orderBy("value"))
        .cast("long")
        .alias("i"),
    )
    d2 = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    per = ranked.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("m"),
        F.sum(F.when(F.col("is_a"), d2).otherwise(0))
        .cast("long")
        .alias("da"),
        F.sum(F.when(~F.col("is_a"), d2).otherwise(0))
        .cast("long")
        .alias("db"),
    )
    u = F.col("n") * F.col("da") + F.col("m") * F.col("db")
    t = u.cast("double") / (
        F.col("n").cast("double") * F.col("m") * (F.col("n") + F.col("m"))
    ) - (F.lit(4.0) * F.col("n") * F.col("m") - 1) / (
        F.lit(6.0) * (F.col("n") + F.col("m"))
    )
    return per.select(
        "n",
        "m",
        u.cast("long").alias("u_stat"),
        F.round(t, 12).alias("t_stat"),
    )




@query(
    "stats_dunn_index",
    oracle=f"""
    WITH {_EMB_SAMPLE_PAIRS_SQL}
    SELECT CAST(min(CASE WHEN qlab <> nlab THEN d2 END) AS BIGINT)
             AS min_cross_d2,
           CAST(max(CASE WHEN qlab = nlab THEN d2 END) AS BIGINT)
             AS max_same_d2,
           round(CAST(min(CASE WHEN qlab <> nlab THEN d2 END) AS DOUBLE)
                 / max(CASE WHEN qlab = nlab THEN d2 END), 12)
             AS dunn_sq
    FROM pairs
    """,
)
def stats_dunn_index(spark: SparkSession, sf: str) -> DataFrame:
    """DUNN INDEX (squared form) over the anchored pair sample: the
    minimum cross-label distance² over the maximum same-label
    distance² — the worst-case separation/compactness ratio that
    complements emb_davies_bouldin_sq's average-case score (Dunn ≪ 1
    here, consistent with the known weak clusters). Two conditional
    extreme aggregates over the exact-int64 broadcast pair stream —
    fully map-combinable, one mirrored division."""
    pairs = _sample_pairs(spark, sf)
    return pairs.agg(
        F.min(
            F.when(F.col("qlab") != F.col("nlab"), F.col("d2"))
        ).alias("min_cross_d2"),
        F.max(
            F.when(F.col("qlab") == F.col("nlab"), F.col("d2"))
        ).alias("max_same_d2"),
        F.round(
            F.min(
                F.when(F.col("qlab") != F.col("nlab"), F.col("d2"))
            ).cast("double")
            / F.max(
                F.when(F.col("qlab") == F.col("nlab"), F.col("d2"))
            ),
            12,
        ).alias("dunn_sq"),
    )




@query(
    "stats_chatterjee_xi",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    paired AS (
      SELECT g1.day, g1.n AS x, g2.n AS y
      FROM grid g1 JOIN grid g2 ON g1.day = g2.day
      WHERE g1.event_type = 'click' AND g2.event_type = 'view'
    ),
    rk AS (
      SELECT day, x,
             CAST(rank() OVER (ORDER BY y)
                  + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS r
      FROM paired
    ),
    diffs AS (
      SELECT abs(r - lag(r) OVER (ORDER BY x, day)) AS ad
      FROM rk
    )
    SELECT CAST(count(*) + 1 AS BIGINT) AS n,
           CAST(sum(ad) AS BIGINT) AS sum_abs_dr,
           round(1.0 - 3.0 * sum(ad)
                 / (CAST(count(*) + 1 AS DOUBLE) * (count(*) + 1) - 1),
                 12) AS xi
    FROM diffs WHERE ad IS NOT NULL
    """,
)
def stats_chatterjee_xi(spark: SparkSession, sf: str) -> DataFrame:
    """CHATTERJEE'S ξ rank correlation (2020) between the daily click
    and view series — the modern dependence coefficient that, unlike
    Pearson/Spearman, detects NON-MONOTONE functional dependence
    (ξ→1 iff y is a measurable function of x, ξ≈0 iff independent):
    sort by x, take ranks rᵢ = #{yⱼ ≤ yᵢ}, ξ = 1 − 3Σ|rᵢ₊₁−rᵢ|/(n²−1).
    Ranks and the lag-difference sum are exact BIGINTs (x ties broken
    by day, so the sort order is total on both engines); ξ is one
    mirrored division. Per-key ordered-scan shape, same class as the
    SPC/PH detectors."""
    g = _daily_grid(spark, sf)
    clicks = g.filter(F.col("event_type") == "click").select(
        "day", F.col("n").alias("x")
    )
    views = g.filter(F.col("event_type") == "view").select(
        "day", F.col("n").alias("y")
    )
    paired = clicks.join(views, "day")
    rk = paired.select(
        "day",
        "x",
        (
            F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        )
        .cast("long")
        .alias("r"),
    )
    diffs = rk.select(
        F.abs(
            F.col("r") - F.lag("r").over(Window.orderBy("x", "day"))
        ).alias("ad")
    ).filter(F.col("ad").isNotNull())
    n = F.count(F.lit(1)) + 1
    return diffs.agg(
        n.cast("long").alias("n"),
        F.sum("ad").cast("long").alias("sum_abs_dr"),
        F.round(
            F.lit(1.0)
            - F.lit(3.0)
            * F.sum("ad")
            / (n.cast("double") * n - 1),
            12,
        ).alias("xi"),
    )




@query(
    "stats_kendall_w",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    rk AS (
      SELECT event_type, day,
             CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY n)
                  + count(*) OVER (PARTITION BY event_type, n) - 1
               AS BIGINT) AS two_r
      FROM grid
    ),
    sums AS (
      SELECT day, CAST(sum(two_r) AS BIGINT) AS d FROM rk GROUP BY day
    ),
    ties AS (
      SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tt
      FROM (SELECT event_type, n, CAST(count(*) AS BIGINT) AS t
            FROM grid GROUP BY event_type, n)
      WHERE t > 1
    ),
    m_ AS (
      SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS m,
             CAST(count(DISTINCT day) AS BIGINT) AS n
      FROM grid
    )
    SELECT m_.m, m_.n,
           CAST(3 * (m_.n * (SELECT sum(d * d) FROM sums)
                     - (SELECT sum(d) FROM sums)
                       * (SELECT sum(d) FROM sums)) AS BIGINT) AS w_num,
           CAST(m_.n * (m_.m * m_.m * (m_.n * m_.n * m_.n - m_.n)
                        - m_.m * ties.tt) AS BIGINT) AS w_den,
           round(CAST(3 * (m_.n * (SELECT sum(d * d) FROM sums)
                           - (SELECT sum(d) FROM sums)
                             * (SELECT sum(d) FROM sums)) AS DOUBLE)
                 / (m_.n * (m_.m * m_.m * (m_.n * m_.n * m_.n - m_.n)
                            - m_.m * ties.tt)), 12) AS kendall_w
    FROM m_ CROSS JOIN ties
    """,
)
def stats_kendall_w(spark: SparkSession, sf: str) -> DataFrame:
    """KENDALL'S W — concordance of the five event streams' day
    rankings (do all streams agree which days were big?): each stream
    midranks the 30 days (doubled-rank device, exact BIGINT), W =
    12·S/(m²(n³−n) − m·ΣT) with the tie correction, carried as one
    exact integer numerator/denominator pair (3(nΣD²−(ΣD)²) over
    n(m²(n³−n)−mT) in doubled units — algebraically identical) plus a
    mirrored rounded ratio. W→1 = one shared daily rhythm, W→0 =
    independent rhythms; the multi-rater extension of the pairwise
    Spearman family and the effect size behind stats_friedman_test.
    Per-stream rank windows over the bounded grid, one groupBy."""
    g = _daily_grid(spark, sf)
    rk = g.select(
        "day",
        (
            F.lit(2)
            * F.rank().over(
                Window.partitionBy("event_type").orderBy("n")
            )
            + F.count(F.lit(1)).over(
                Window.partitionBy("event_type", "n")
            )
            - 1
        )
        .cast("long")
        .alias("two_r"),
    )
    sums = rk.groupBy("day").agg(
        F.sum("two_r").cast("long").alias("d")
    )
    s2 = sums.agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
        F.sum("d").cast("long").alias("sd"),
    )
    ties = (
        g.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * F.col("t") * F.col("t") - F.col("t")
                ),
                F.lit(0).cast("long"),
            ).alias("tt")
        )
    )
    m_ = g.agg(
        F.countDistinct("event_type").cast("long").alias("m"),
        F.countDistinct("day").cast("long").alias("n"),
    )
    j = (
        m_.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(s2))
    )
    num = 3 * (
        F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    )
    den = F.col("n") * (
        F.col("m")
        * F.col("m")
        * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        - F.col("m") * F.col("tt")
    )
    return j.select(
        "m",
        "n",
        num.cast("long").alias("w_num"),
        den.cast("long").alias("w_den"),
        F.round(num.cast("double") / den, 12).alias("kendall_w"),
    )




@query(
    "stats_eb_shrinkage",
    oracle="""
    WITH per AS (
      SELECT p.p_brand AS brand,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_returns
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    ),
    moments AS (
      SELECT CAST(count(*) AS BIGINT) AS nb,
             list_reduce(list_sort(list(
               CAST(n_returns AS DOUBLE) / n_items)), (a, b) -> a + b)
               AS sp,
             list_reduce(list_sort(list(
               (CAST(n_returns AS DOUBLE) / n_items)
               * (CAST(n_returns AS DOUBLE) / n_items))),
               (a, b) -> a + b) AS sp2
      FROM per
    ),
    ab AS (
      SELECT nb, sp / nb AS m1,
             (sp2 - sp * sp / nb) / nb AS v,
             ((sp / nb) * (1.0 - sp / nb)
              / ((sp2 - sp * sp / nb) / nb) - 1.0) AS ab_sum
      FROM moments
    )
    SELECT per.brand, per.n_items, per.n_returns,
           CAST(per.n_returns * 1000 // per.n_items AS BIGINT)
             AS raw_milli,
           round((per.n_returns + ab.m1 * ab.ab_sum)
                 / (per.n_items + ab.ab_sum), 9) AS shrunk_rate
    FROM per CROSS JOIN ab
    """,
)
def stats_eb_shrinkage(spark: SparkSession, sf: str) -> DataFrame:
    """EMPIRICAL-BAYES SHRINKAGE of per-brand return rates
    (beta-binomial, method of moments): small brands get pulled
    toward the global mean in proportion to their evidence — the
    standard fix for 'brand with 3 items and 1 return tops the
    leaderboard'. Per-brand counts are exact BIGINTs; the cross-brand
    moments fold SORTED (25 values) so both engines sum identical
    doubles; α+β and each shrunk rate are mirrored single-expression
    doubles, round 9. One broadcast star join + a brand-bounded
    scalar cross join."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    per = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_returns"),
        )
    )
    per = per.localCheckpoint(eager=False)  # moments + output
    pr = F.col("n_returns").cast("double") / F.col("n_items")

    def fold(col: F.Column) -> F.Column:
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    moments = per.agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        fold(pr).alias("sp"),
        fold(pr * pr).alias("sp2"),
    )
    m1 = F.col("sp") / F.col("nb")
    v = (F.col("sp2") - F.col("sp") * F.col("sp") / F.col("nb")) / F.col(
        "nb"
    )
    ab = moments.select(
        m1.alias("m1"),
        (m1 * (F.lit(1.0) - m1) / v - F.lit(1.0)).alias("ab_sum"),
    )
    return per.crossJoin(F.broadcast(ab)).select(
        "brand",
        "n_items",
        "n_returns",
        F.expr("n_returns * 1000 div n_items")
        .cast("long")
        .alias("raw_milli"),
        F.round(
            (F.col("n_returns") + F.col("m1") * F.col("ab_sum"))
            / (F.col("n_items") + F.col("ab_sum")),
            9,
        ).alias("shrunk_rate"),
    )




@query(
    "stats_hodges_lehmann",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    a AS (SELECT n AS x FROM grid WHERE event_type = 'click'),
    b AS (SELECT n AS y FROM grid WHERE event_type = 'view'),
    diffs AS (
      SELECT a.x - b.y AS d, CAST(count(*) AS BIGINT) AS w
      FROM a CROSS JOIN b GROUP BY a.x - b.y
    ),
    cum AS (
      SELECT d, w,
             CAST(sum(w) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS c
      FROM diffs
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS n_pairs FROM diffs),
    med AS (
      SELECT (SELECT min(d) FROM cum, tot
              WHERE c >= (n_pairs + 1) // 2) AS d_lo,
             (SELECT min(d) FROM cum, tot
              WHERE c >= n_pairs // 2 + 1) AS d_hi
    )
    SELECT tot.n_pairs,
           CAST(med.d_lo + med.d_hi AS BIGINT) AS two_hl,
           round((med.d_lo + med.d_hi) / 2.0, 6) AS hl_shift
    FROM tot CROSS JOIN med
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf: str) -> DataFrame:
    """HODGES–LEHMANN location-shift estimator between the click and
    view daily series: the median of all 900 pairwise differences —
    the robust effect-size companion to stats_mann_whitney_u (U says
    WHETHER the levels differ; HL says BY HOW MUCH, immune to
    outliers where the mean difference is not). Differences collapse
    to a weighted value histogram first (30×30 pairs → ≤900 distinct
    values), the two central order statistics come off one cumulative
    window, and the estimator is carried as an exact integer doubled
    median. Same exact-median-over-histogram device as
    stats_exact_median_twopass."""
    g = _daily_grid(spark, sf)
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("x")
    )
    b = g.filter(F.col("event_type") == "view").select(
        F.col("n").alias("y")
    )
    diffs = (
        a.crossJoin(F.broadcast(b))
        .groupBy((F.col("x") - F.col("y")).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    diffs = diffs.localCheckpoint(eager=False)  # cum + total
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = diffs.select(
        "d", F.sum("w").over(wcum).cast("long").alias("c")
    )
    cum = cum.localCheckpoint(eager=False)  # two lookups
    tot = diffs.agg(F.sum("w").cast("long").alias("n_pairs"))
    lo = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("c") >= F.expr("(n_pairs + 1) div 2"))
        .agg(F.min("d").alias("d_lo"))
    )
    hi = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("c") >= F.expr("n_pairs div 2 + 1"))
        .agg(F.min("d").alias("d_hi"))
    )
    return (
        tot.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_pairs",
            (F.col("d_lo") + F.col("d_hi")).cast("long").alias("two_hl"),
            F.round((F.col("d_lo") + F.col("d_hi")) / 2.0, 6).alias(
                "hl_shift"
            ),
        )
    )




@query(
    "stats_matthews_corr",
    oracle="""
    WITH flags AS (
      SELECT o_totalprice >= 150000 AS hi_value,
             o_orderpriority = '1-URGENT' AS urgent
      FROM orders
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN hi_value AND urgent THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(sum(CASE WHEN hi_value AND NOT urgent THEN 1 ELSE 0
               END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT hi_value AND urgent THEN 1 ELSE 0
               END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT hi_value AND NOT urgent THEN 1
               ELSE 0 END) AS BIGINT) AS d
      FROM flags
    )
    SELECT a, b, c, d,
           CAST(a * d - b * c AS BIGINT) AS mcc_num,
           round((a * d - b * c)
                 / sqrt((CAST(a + b AS DOUBLE) * (a + c))
                        * (CAST(b + d AS DOUBLE) * (c + d))), 12)
             AS mcc
    FROM cells
    """,
)
def stats_matthews_corr(spark: SparkSession, sf: str) -> DataFrame:
    """MATTHEWS CORRELATION between two binary order flags (high-value
    ≥ $150k × urgent priority) — the balanced 2×2 association score
    ML evals prefer over accuracy/F1 (it only rewards doing well on
    BOTH classes; ±1 = perfect (anti-)association, 0 = independence).
    Cells are exact BIGINTs; the numerator ad−bc stays integer; the
    denominator's four marginals multiply in a mirrored fixed
    grouping ((a+b)(a+c))·((b+d)(c+d)) as doubles to dodge int64
    overflow at corpus scale. One map-combinable aggregate."""
    o = load(spark, sf, "orders")
    flags = o.select(
        (F.col("o_totalprice") >= 150000).alias("hi_value"),
        (F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
    )
    cells = flags.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(n)
            for n, cond in [
                ("a", F.col("hi_value") & F.col("urgent")),
                ("b", F.col("hi_value") & ~F.col("urgent")),
                ("c", ~F.col("hi_value") & F.col("urgent")),
                ("d", ~F.col("hi_value") & ~F.col("urgent")),
            ]
        ]
    )
    num = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    den = F.sqrt(
        (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("a") + F.col("c"))
        )
        * (
            (F.col("b") + F.col("d")).cast("double")
            * (F.col("c") + F.col("d"))
        )
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        num.cast("long").alias("mcc_num"),
        F.round(num / den, 12).alias("mcc"),
    )




@query(
    "stats_poisson_etest_daily",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    paired AS (
      SELECT g1.day, g1.n AS k1, g2.n AS k2
      FROM grid g1 JOIN grid g2 ON g1.day = g2.day
      WHERE g1.event_type = 'click' AND g2.event_type = 'error'
    )
    SELECT CAST(day AS INT) AS day, k1, k2,
           round((k1 - k2) / sqrt(CAST(k1 + k2 AS DOUBLE)), 12)
             AS z_stat,
           abs((k1 - k2) / sqrt(CAST(k1 + k2 AS DOUBLE))) > 3.0
             AS flagged_3sigma
    FROM paired WHERE k1 + k2 > 0
    """,
)
def stats_poisson_etest_daily(spark: SparkSession, sf: str) -> DataFrame:
    """PER-DAY POISSON two-rate test (conditional/e-test normal form):
    are today's clicks and errors consistent with equal underlying
    rates? z = (k₁−k₂)/√(k₁+k₂) — the exact variance-stabilized form
    for count pairs, flagged at 3σ; the daily error-budget monitor
    that needs no history (contrast stats_page_hinkley, which needs
    the whole series). Counts exact, one mirrored division per day,
    grid-bounded output."""
    g = _daily_grid(spark, sf)
    clicks = g.filter(F.col("event_type") == "click").select(
        "day", F.col("n").alias("k1")
    )
    errors = g.filter(F.col("event_type") == "error").select(
        "day", F.col("n").alias("k2")
    )
    paired = clicks.join(errors, "day").filter(
        F.col("k1") + F.col("k2") > 0
    )
    z = (F.col("k1") - F.col("k2")) / F.sqrt(
        (F.col("k1") + F.col("k2")).cast("double")
    )
    return paired.select(
        F.col("day").cast("int").alias("day"),
        "k1",
        "k2",
        F.round(z, 12).alias("z_stat"),
        (F.abs(z) > 3.0).alias("flagged_3sigma"),
    )




@query(
    "stats_gamma_fit_moments",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT))
               AS BIGINT) AS s,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)
                      * CAST(round(o_totalprice) AS BIGINT))
               AS BIGINT) AS s2
      FROM orders GROUP BY o_orderpriority
    )
    SELECT priority, n,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_dollars,
           round(((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                 / ((s2 - CAST(s AS DOUBLE) * s / n) / n), 9)
             AS gamma_shape_k,
           round(((s2 - CAST(s AS DOUBLE) * s / n) / n)
                 / (CAST(s AS DOUBLE) / n), 6)
             AS gamma_scale_dollars
    FROM per
    """,
)
def stats_gamma_fit_moments(spark: SparkSession, sf: str) -> DataFrame:
    """GAMMA FIT (method of moments) of order values per priority
    class: k = m²/σ², θ = σ²/m — the standard positive-skew model
    for monetary distributions (k ≈ 1 exponential-like heavy churn;
    k ≫ 1 near-normal), feeding CLV simulation and anomaly gates
    that a normal fit would mis-tail. Moments are exact BIGINTs in
    DOLLAR units — the round-9 sf0.1 sweep caught Σ(cents²)
    overflowing int64 (5.5e7² × 30k rows > 2⁶³); dollar-rounded
    values keep the second moment exact with ~10⁴× headroom (shard
    the moment sums beyond that). k and θ are mirrored expressions
    off the same two divisions, round 9/6. One map-combinable groupBy
    over a 5-class domain."""
    o = load(spark, sf, "orders")
    dollars = F.round(F.col("o_totalprice")).cast("long")
    per = o.select(
        F.col("o_orderpriority").alias("priority"),
        dollars.alias("c"),
    ).groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    m = F.col("s").cast("double") / F.col("n")
    v = (F.col("s2") - F.col("s").cast("double") * F.col("s") / F.col("n")) / F.col("n")
    return per.select(
        "priority",
        "n",
        F.round(m, 6).alias("mean_dollars"),
        F.round((m * m) / v, 9).alias("gamma_shape_k"),
        F.round(v / m, 6).alias("gamma_scale_dollars"),
    )




@query(
    "stats_youden_threshold_sweep",
    oracle="""
    WITH thr AS (
      SELECT unnest([50000, 100000, 150000, 200000, 250000,
                     300000, 350000, 400000, 450000]) AS t
    ),
    cells AS (
      SELECT thr.t,
             CAST(sum(CASE WHEN o_totalprice >= thr.t
                            AND o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN o_totalprice >= thr.t
                            AND o_orderpriority <> '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN o_totalprice < thr.t
                            AND o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN o_totalprice < thr.t
                            AND o_orderpriority <> '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM orders CROSS JOIN thr GROUP BY thr.t
    )
    SELECT CAST(t AS BIGINT) AS threshold, tp, fp, fn, tn,
           CAST(tp * 1000 // (tp + fn) AS BIGINT) AS tpr_milli,
           CAST(fp * 1000 // (fp + tn) AS BIGINT) AS fpr_milli,
           CAST(tp * 1000 // (tp + fn) - fp * 1000 // (fp + tn)
             AS BIGINT) AS youden_j_milli
    FROM cells
    """,
)
def stats_youden_threshold_sweep(
    spark: SparkSession, sf: str
) -> DataFrame:
    """YOUDEN'S J THRESHOLD SWEEP — the operating-point chart for a
    one-feature classifier (does order value predict urgency?): at 9
    candidate thresholds, the exact confusion cells plus TPR/FPR/J as
    integer milli-rates; argmax J is the optimal cutoff, a flat curve
    near 0 says the feature carries no signal (the expected verdict
    on this synthetic pairing — the op validates the machinery, the
    shape is the finding). One broadcast threshold fan-out over a
    single fact scan, 9-row output."""
    o = load(spark, sf, "orders").select("o_totalprice", "o_orderpriority")
    thr = spark.createDataFrame(
        [(t,) for t in range(50000, 450001, 50000)], ["t"]
    )
    cells = (
        o.crossJoin(F.broadcast(thr))
        .groupBy("t")
        .agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("long")
                .alias(name)
                for name, cond in [
                    (
                        "tp",
                        (F.col("o_totalprice") >= F.col("t"))
                        & (F.col("o_orderpriority") == "1-URGENT"),
                    ),
                    (
                        "fp",
                        (F.col("o_totalprice") >= F.col("t"))
                        & (F.col("o_orderpriority") != "1-URGENT"),
                    ),
                    (
                        "fn",
                        (F.col("o_totalprice") < F.col("t"))
                        & (F.col("o_orderpriority") == "1-URGENT"),
                    ),
                    (
                        "tn",
                        (F.col("o_totalprice") < F.col("t"))
                        & (F.col("o_orderpriority") != "1-URGENT"),
                    ),
                ]
            ]
        )
    )
    return cells.select(
        F.col("t").cast("long").alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("tp * 1000 div (tp + fn)").cast("long").alias("tpr_milli"),
        F.expr("fp * 1000 div (fp + tn)").cast("long").alias("fpr_milli"),
        F.expr("tp * 1000 div (tp + fn) - fp * 1000 div (fp + tn)")
        .cast("long")
        .alias("youden_j_milli"),
    )




@query(
    "stats_gtest_independence",
    oracle="""
    WITH cells AS (
      SELECT l.l_returnflag AS returnflag, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS observed
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    margins AS (
      SELECT observed,
             CAST(sum(observed) OVER (PARTITION BY returnflag) AS BIGINT)
               AS row_n,
             CAST(sum(observed) OVER (PARTITION BY priority) AS BIGINT)
               AS col_n,
             CAST(sum(observed) OVER () AS BIGINT) AS total_n,
             CAST(count(DISTINCT returnflag) OVER () AS BIGINT) AS nr,
             CAST(count(DISTINCT priority) OVER () AS BIGINT) AS nc
      FROM cells
    ),
    terms AS (
      SELECT round(observed * ln(CAST(observed AS DOUBLE) * total_n
                     / (CAST(row_n AS DOUBLE) * col_n)), 9) AS term,
             nr, nc
      FROM margins WHERE observed > 0
    )
    SELECT CAST(max(nr) AS BIGINT) AS n_rows_cat,
           CAST(max(nc) AS BIGINT) AS n_cols_cat,
           CAST((max(nr) - 1) * (max(nc) - 1) AS BIGINT) AS dof,
           round(2.0 * list_reduce(list_sort(list(term)),
                                   (a, b) -> a + b), 6) AS g_stat
    FROM terms
    """,
)
def stats_gtest_independence(spark: SparkSession, sf: str) -> DataFrame:
    """G-TEST of independence (likelihood-ratio χ²) on the returnflag ×
    priority table: G = 2Σ O·ln(O·N/(R·C)) — the additive-under-
    partitioning alternative to Pearson's χ² (G decomposes exactly
    across sub-tables, which is why log-linear modeling uses it; it
    also pairs with the per-cell residual heatmap). Each cell term is
    pre-rounded at 9 and the ≤35 terms fold SORTED, so both engines
    sum identical doubles — the zipf-fit device on a contingency
    table. dof ships alongside for the χ² lookup."""
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
        "observed",
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
        F.size(F.collect_set("returnflag").over(Window.partitionBy()))
        .cast("long")
        .alias("nr"),
        F.size(F.collect_set("priority").over(Window.partitionBy()))
        .cast("long")
        .alias("nc"),
    )
    term = F.round(
        F.col("observed")
        * F.log(
            F.col("observed").cast("double")
            * F.col("total_n")
            / (F.col("row_n").cast("double") * F.col("col_n"))
        ),
        9,
    )
    terms = margins.filter(F.col("observed") > 0).select(
        term.alias("term"), "nr", "nc"
    )
    return terms.agg(
        F.max("nr").cast("long").alias("n_rows_cat"),
        F.max("nc").cast("long").alias("n_cols_cat"),
        ((F.max("nr") - 1) * (F.max("nc") - 1))
        .cast("long")
        .alias("dof"),
        F.round(
            F.lit(2.0)
            * F.aggregate(
                F.array_sort(F.collect_list("term")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("g_stat"),
    )




@query(
    "stats_cooks_distance",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events
      WHERE event_type = 'click'
        AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
            BETWEEN 0 AND 29
      GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily
    ),
    fit AS (
      SELECT n, sx, sy,
             (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
               AS b1,
             CAST(n * sxx - sx * sx AS BIGINT) AS n_sxx_dev
      FROM m
    ),
    resid AS (
      SELECT d.x, d.y,
             d.y - (CAST(f.sy AS DOUBLE) / f.n
                    + f.b1 * (d.x - CAST(f.sx AS DOUBLE) / f.n)) AS r,
             1.0 / f.n + CAST(f.n AS DOUBLE)
               * (d.x - CAST(f.sx AS DOUBLE) / f.n)
               * (d.x - CAST(f.sx AS DOUBLE) / f.n) / f.n_sxx_dev AS h,
             f.n
      FROM daily d CROSS JOIN fit f
    ),
    sse AS (
      SELECT list_reduce(list_sort(list(round(r * r, 9))),
                         (a, b) -> a + b) AS sse, max(n) AS n
      FROM resid
    )
    SELECT CAST(resid.x AS INT) AS day, resid.y,
           round(resid.r, 9) AS residual,
           round(resid.h, 12) AS leverage,
           round((resid.r * resid.r) * resid.h
                 / ((1.0 - resid.h) * (1.0 - resid.h))
                 / (2.0 * sse.sse / (sse.n - 2)), 9) AS cooks_d,
           (resid.r * resid.r) * resid.h
             / ((1.0 - resid.h) * (1.0 - resid.h))
             / (2.0 * sse.sse / (sse.n - 2))
             > 4.0 / sse.n AS influential
    FROM resid CROSS JOIN sse
    """,
)
def stats_cooks_distance(spark: SparkSession, sf: str) -> DataFrame:
    """COOK'S DISTANCE for the daily click OLS trend — which single
    days, if dropped, would move the fitted line (the influence
    diagnostic that separates 'trend' from 'one launch-day spike
    pretending to be a trend'; flag at the standard D > 4/n). Slope,
    residuals, and leverages derive from exact integer sums in
    mirrored closed form; SSE folds SORTED over per-day r²
    pre-rounded at 9 (the zipf-fit device), so both engines divide
    identical doubles. Grid-bounded output with the 4/n flag."""
    e = load(spark, sf, "events").filter(F.col("event_type") == "click")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        e.select(day.alias("x"))
        .filter((F.col("x") >= 0) & (F.col("x") <= 29))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    daily = daily.localCheckpoint(eager=False)  # fit + resid
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    fit = m.select(
        "n",
        "sx",
        "sy",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double")
        ).alias("b1"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("n_sxx_dev"),
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "x",
        "y",
        (
            F.col("y")
            - (
                F.col("sy").cast("double") / F.col("n")
                + F.col("b1")
                * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            )
        ).alias("r"),
        (
            F.lit(1.0) / F.col("n")
            + F.col("n").cast("double")
            * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            / F.col("n_sxx_dev")
        ).alias("h"),
        "n",
    )
    resid = resid.localCheckpoint(eager=False)  # sse + output
    sse = resid.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.round(F.col("r") * F.col("r"), 9))),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("sse"),
        F.max("n").alias("nn"),
    )
    j = resid.crossJoin(F.broadcast(sse))
    d = (
        (F.col("r") * F.col("r"))
        * F.col("h")
        / ((F.lit(1.0) - F.col("h")) * (F.lit(1.0) - F.col("h")))
        / (F.lit(2.0) * F.col("sse") / (F.col("nn") - 2))
    )
    return j.select(
        F.col("x").cast("int").alias("day"),
        "y",
        F.round("r", 9).alias("residual"),
        F.round("h", 12).alias("leverage"),
        F.round(d, 9).alias("cooks_d"),
        (d > F.lit(4.0) / F.col("nn")).alias("influential"),
    )




@query(
    "stats_cochran_q",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    med AS (
      SELECT event_type,
             CAST((list_sort(list(n))[15] + list_sort(list(n))[16])
               AS BIGINT) AS two_med
      FROM grid GROUP BY event_type
    ),
    flags AS (
      SELECT g.day, g.event_type,
             CASE WHEN 2 * g.n > m.two_med THEN 1 ELSE 0 END AS x
      FROM grid g JOIN med m ON g.event_type = m.event_type
    ),
    rows_ AS (
      SELECT day, CAST(sum(x) AS BIGINT) AS ri FROM flags GROUP BY day
    ),
    cols_ AS (
      SELECT event_type, CAST(sum(x) AS BIGINT) AS cj FROM flags
      GROUP BY event_type
    ),
    k_ AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cols_),
    parts AS (
      SELECT (SELECT k FROM k_) AS k,
             (SELECT CAST(sum(cj * cj) AS BIGINT) FROM cols_) AS scc,
             (SELECT CAST(sum(ri) AS BIGINT) FROM rows_) AS sr,
             (SELECT CAST(sum(ri * ri) AS BIGINT) FROM rows_) AS srr
    )
    SELECT k, sr AS total_successes,
           CAST(k * (k - 1) * scc - (k - 1) * sr * sr AS BIGINT)
             AS q_num,
           CAST(k * sr - srr AS BIGINT) AS q_den,
           round(CAST(k * (k - 1) * scc - (k - 1) * sr * sr AS DOUBLE)
                 / (k * sr - srr), 9) AS cochran_q
    FROM parts
    """,
)
def stats_cochran_q(spark: SparkSession, sf: str) -> DataFrame:
    """COCHRAN'S Q — do the five event streams' 'above own median'
    daily indicators share one success rate? The k-treatment
    extension of McNemar for matched binary outcomes (here: days are
    the blocks, streams the treatments): Q = (k−1)(kΣCⱼ²−(ΣCⱼ)²)/
    (kΣRᵢ−ΣRᵢ²) ~ χ²ₖ₋₁. Each stream's median comes off an exact
    30-value in-array sort (doubled-median device) so the binary
    matrix is exact; Q is carried as an integer numerator/denominator
    pair plus one mirrored ratio. Grid-bounded throughout."""
    g = _daily_grid(spark, sf)
    med = g.groupBy("event_type").agg(
        F.expr(
            "cast(sort_array(collect_list(n))[14]"
            " + sort_array(collect_list(n))[15] as bigint)"
        ).alias("two_med")
    )
    flags = g.join(F.broadcast(med), "event_type").select(
        "day",
        "event_type",
        F.when(2 * F.col("n") > F.col("two_med"), 1)
        .otherwise(0)
        .alias("x"),
    )
    flags = flags.localCheckpoint(eager=False)  # rows + cols
    rows_ = flags.groupBy("day").agg(F.sum("x").cast("long").alias("ri"))
    cols_ = flags.groupBy("event_type").agg(
        F.sum("x").cast("long").alias("cj")
    )
    parts = (
        cols_.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.col("cj") * F.col("cj")).cast("long").alias("scc"),
        )
        .crossJoin(
            F.broadcast(
                rows_.agg(
                    F.sum("ri").cast("long").alias("sr"),
                    F.sum(F.col("ri") * F.col("ri"))
                    .cast("long")
                    .alias("srr"),
                )
            )
        )
    )
    qnum = (
        F.col("k") * (F.col("k") - 1) * F.col("scc")
        - (F.col("k") - 1) * F.col("sr") * F.col("sr")
    )
    qden = F.col("k") * F.col("sr") - F.col("srr")
    return parts.select(
        "k",
        F.col("sr").alias("total_successes"),
        qnum.cast("long").alias("q_num"),
        qden.cast("long").alias("q_den"),
        F.round(qnum.cast("double") / qden, 9).alias("cochran_q"),
    )




@query(
    "stats_lin_ccc",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    paired AS (
      SELECT g1.n AS x, g2.n AS y
      FROM grid g1 JOIN grid g2 ON g1.day = g2.day
      WHERE g1.event_type = 'click' AND g2.event_type = 'view'
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM paired
    )
    SELECT n,
           CAST(2 * (n * sxy - sx * sy) AS BIGINT) AS ccc_num,
           CAST(n * sxx - sx * sx + n * syy - sy * sy
                + (sx - sy) * (sx - sy) AS BIGINT) AS ccc_den,
           round(CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
                 / (n * sxx - sx * sx + n * syy - sy * sy
                    + (sx - sy) * (sx - sy)), 12) AS lin_ccc
    FROM m
    """,
)
def stats_lin_ccc(spark: SparkSession, sf: str) -> DataFrame:
    """LIN'S CONCORDANCE correlation between the click and view daily
    series — the AGREEMENT coefficient (Pearson r measures linear
    association; CCC additionally penalizes scale and location bias,
    so it is the right score for 'does replica B reproduce metric A'
    checks, not just 'do they co-move'). Multiplying the standard
    form through by n² makes BOTH numerator and denominator exact
    BIGINTs — 2(nΣxy−ΣxΣy) over (nΣx²−(Σx)²)+(nΣy²−(Σy)²)+(Σx−Σy)²
    — with one mirrored ratio. One map-combinable moment pass."""
    g = _daily_grid(spark, sf)
    paired = (
        g.filter(F.col("event_type") == "click")
        .select("day", F.col("n").alias("x"))
        .join(
            g.filter(F.col("event_type") == "view").select(
                "day", F.col("n").alias("y")
            ),
            "day",
        )
    )
    m = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = 2 * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (
        F.col("n") * F.col("sxx")
        - F.col("sx") * F.col("sx")
        + F.col("n") * F.col("syy")
        - F.col("sy") * F.col("sy")
        + (F.col("sx") - F.col("sy")) * (F.col("sx") - F.col("sy"))
    )
    return m.select(
        "n",
        num.cast("long").alias("ccc_num"),
        den.cast("long").alias("ccc_den"),
        F.round(num.cast("double") / den, 12).alias("lin_ccc"),
    )




@query(
    "stats_sign_test",
    oracle=f"""
    WITH {_DAILY_GRID_SQL},
    paired AS (
      SELECT g1.n AS x, g2.n AS y
      FROM grid g1 JOIN grid g2 ON g1.day = g2.day
      WHERE g1.event_type = 'click' AND g2.event_type = 'view'
        AND g1.n <> g2.n
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg
      FROM paired
    )
    SELECT n_pos, n_neg,
           round((CASE WHEN n_pos > n_neg THEN n_pos - n_neg - 1
                       WHEN n_pos < n_neg THEN n_pos - n_neg + 1
                       ELSE 0 END)
                 / sqrt(CAST(n_pos + n_neg AS DOUBLE)), 12) AS z_stat,
           abs((CASE WHEN n_pos > n_neg THEN n_pos - n_neg - 1
                     WHEN n_pos < n_neg THEN n_pos - n_neg + 1
                     ELSE 0 END)
               / sqrt(CAST(n_pos + n_neg AS DOUBLE))) > 1.96
             AS significant_05
    FROM m
    """,
)
def stats_sign_test(spark: SparkSession, sf: str) -> DataFrame:
    """PAIRED SIGN TEST (clicks vs views by day): the assumption-free
    floor of the paired-test ladder — it uses only the SIGN of each
    day's difference (Wilcoxon adds magnitudes, the t-test adds
    normality), so it is the test that still holds when everything
    else's assumptions fail. Ties drop; z uses the continuity-
    corrected normal approximation of Binomial(n, ½). Exact counts,
    one mirrored z, grid-bounded."""
    g = _daily_grid(spark, sf)
    paired = (
        g.filter(F.col("event_type") == "click")
        .select("day", F.col("n").alias("x"))
        .join(
            g.filter(F.col("event_type") == "view").select(
                "day", F.col("n").alias("y")
            ),
            "day",
        )
        .filter(F.col("x") != F.col("y"))
    )
    m = paired.agg(
        F.sum(F.when(F.col("x") > F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("x") < F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
    )
    corrected = (
        F.when(
            F.col("n_pos") > F.col("n_neg"),
            F.col("n_pos") - F.col("n_neg") - 1,
        )
        .when(
            F.col("n_pos") < F.col("n_neg"),
            F.col("n_pos") - F.col("n_neg") + 1,
        )
        .otherwise(F.lit(0))
    )
    z = corrected / F.sqrt(
        (F.col("n_pos") + F.col("n_neg")).cast("double")
    )
    return m.select(
        "n_pos",
        "n_neg",
        F.round(z, 12).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"),
    )




# ===========================================================================
# Coverage round 10: reliability / agreement statistics, spectral and
# recurrence time-series devices, vocabulary-richness panels, and the
# approximation-quality audits for the sketch/dedup stacks.
# ===========================================================================


@query(
    "stats_mood_median_test",
    oracle="""
    WITH vals AS (
      SELECT event_type, CAST(round(value) AS BIGINT) AS u FROM events
    ),
    hist AS (
      SELECT u, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY u
    ),
    cum AS (
      SELECT u, CAST(sum(c) OVER (ORDER BY u) AS BIGINT) AS cum
      FROM hist
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    med AS (
      SELECT CAST(min(u) AS BIGINT) AS med FROM cum, n
      WHERE 2 * cum >= n + 1
    ),
    per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(CASE WHEN u > med THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above
      FROM vals, med GROUP BY event_type, med
    ),
    marg AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS nn,
             CAST(sum(n_above) AS BIGINT) AS a_tot
      FROM per
    )
    SELECT event_type, n_i, n_above, n_i - n_above AS n_below,
           round(CAST(n_i AS DOUBLE) * a_tot / nn, 6) AS expected_above,
           round(
             (n_above - CAST(n_i AS DOUBLE) * a_tot / nn)
               * (n_above - CAST(n_i AS DOUBLE) * a_tot / nn)
               / (CAST(n_i AS DOUBLE) * a_tot / nn)
             + ((n_i - n_above) - CAST(n_i AS DOUBLE) * (nn - a_tot) / nn)
               * ((n_i - n_above) - CAST(n_i AS DOUBLE) * (nn - a_tot) / nn)
               / (CAST(n_i AS DOUBLE) * (nn - a_tot) / nn), 9)
             AS chi2_term
    FROM per, marg
    """,
)
def stats_mood_median_test(spark: SparkSession, sf: str) -> DataFrame:
    """MOOD'S MEDIAN TEST across the 5 event types: does any stream's
    value distribution sit above/below the others' shared center? The
    grand median is EXACT — smallest integer unit u with 2·cum(u) ≥
    N+1 off the value histogram's cumulative (the counting-sort
    device, no global sort of raw rows) — and the 2×k contingency of
    above/≤ counts is pure BIGINTs; each type's χ² contribution is
    one mirrored double, round 9 (sum the k terms against a χ²ₖ₋₁
    table). The median-test is the assumption-free fallback when
    Kruskal-Wallis' shape-equality premise fails. One histogram
    groupBy + one per-type groupBy; the histogram is value-domain-
    bounded, so the cumulative window is driver-trivial at any
    corpus size."""
    e = load(spark, sf, "events")
    u = F.round(F.col("value")).cast("long")
    vals = e.select("event_type", u.alias("u"))
    hist = vals.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("u").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("u", F.sum("c").over(wcum).alias("cum"))
    n = vals.agg(F.count(F.lit(1)).alias("n"))
    med = (
        cum.crossJoin(F.broadcast(n))
        .filter(2 * F.col("cum") >= F.col("n") + 1)
        .agg(F.min("u").alias("med"))
    )
    per = (
        vals.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum(F.when(F.col("u") > F.col("med"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
    )
    marg = per.agg(
        F.sum("n_i").cast("long").alias("nn"),
        F.sum("n_above").cast("long").alias("a_tot"),
    )
    ea = F.col("n_i").cast("double") * F.col("a_tot") / F.col("nn")
    eb = (
        F.col("n_i").cast("double")
        * (F.col("nn") - F.col("a_tot"))
        / F.col("nn")
    )
    oa = F.col("n_above")
    ob = F.col("n_i") - F.col("n_above")
    return per.crossJoin(F.broadcast(marg)).select(
        "event_type",
        "n_i",
        "n_above",
        ob.cast("long").alias("n_below"),
        F.round(ea, 6).alias("expected_above"),
        F.round(
            (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb, 9
        ).alias("chi2_term"),
    )




@query(
    "stats_cronbach_alpha",
    oracle="""
    WITH cell AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY user_id, event_type
    ),
    n AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events
    ),
    item AS (
      SELECT event_type,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM cell GROUP BY event_type
    ),
    ivar AS (
      SELECT round(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                   9) AS v
      FROM item, n
    ),
    tots AS (
      SELECT user_id, CAST(sum(x) AS BIGINT) AS t FROM cell
      GROUP BY user_id
    ),
    tvar AS (
      SELECT CAST(count(*) AS BIGINT) AS k_items_chk,
             list_reduce(list_sort(list(v)), (a, b) -> a + b) AS sum_iv
      FROM ivar
    ),
    tv AS (
      SELECT CAST(sum(t) AS BIGINT) AS st,
             CAST(sum(t * t) AS BIGINT) AS st2
      FROM tots
    )
    SELECT n.n AS n_users, tvar.k_items_chk AS k_items,
           round(tvar.sum_iv, 9) AS sum_item_var,
           round(CAST(tv.st2 AS DOUBLE) / n.n
                 - (CAST(tv.st AS DOUBLE) / n.n)
                   * (CAST(tv.st AS DOUBLE) / n.n), 9) AS total_var,
           round((CAST(tvar.k_items_chk AS DOUBLE)
                  / (tvar.k_items_chk - 1))
                 * (1.0 - tvar.sum_iv
                    / (CAST(tv.st2 AS DOUBLE) / n.n
                       - (CAST(tv.st AS DOUBLE) / n.n)
                         * (CAST(tv.st AS DOUBLE) / n.n))), 9) AS alpha
    FROM n, tvar, tv
    """,
)
def stats_cronbach_alpha(spark: SparkSession, sf: str) -> DataFrame:
    """CRONBACH'S ALPHA over the user × event-type activity matrix —
    items are the 5 event streams, the 'score' is each user's event
    count per stream (absent cells are exact zeros, handled WITHOUT
    materializing the dense grid: population variance from ΣX and ΣX²
    over present cells divided by the full user count N). Alpha =
    k/(k−1)·(1 − Σσᵢ²/σ_T²) answers 'do the streams move together
    per user' — the internal-consistency gate before averaging them
    into one engagement score. All moments are EXACT BIGINTs; the 5
    item variances fold SORTED pre-rounded at 9 (the g-test device);
    alpha is one mirrored double. Two map-combinable groupBys, no
    user×item grid shuffle."""
    e = load(spark, sf, "events")
    cell = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("x")
    )
    cell = cell.localCheckpoint(eager=False)  # consumed twice
    n = e.agg(F.countDistinct("user_id").alias("n"))
    item = cell.groupBy("event_type").agg(
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    ivar = item.crossJoin(F.broadcast(n)).select(
        F.round(
            F.col("s2").cast("double") / F.col("n")
            - (F.col("s1").cast("double") / F.col("n"))
            * (F.col("s1").cast("double") / F.col("n")),
            9,
        ).alias("v")
    )
    tvar = ivar.agg(
        F.count(F.lit(1)).cast("long").alias("k_items_chk"),
        F.aggregate(
            F.array_sort(F.collect_list("v")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sum_iv"),
    )
    tots = cell.groupBy("user_id").agg(F.sum("x").alias("t"))
    tv = tots.agg(
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("st2"),
    )
    joined = (
        n.crossJoin(F.broadcast(tvar)).crossJoin(F.broadcast(tv))
    )
    total_var = (
        F.col("st2").cast("double") / F.col("n")
        - (F.col("st").cast("double") / F.col("n"))
        * (F.col("st").cast("double") / F.col("n"))
    )
    k_d = F.col("k_items_chk").cast("double")
    return joined.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("k_items_chk").alias("k_items"),
        F.round(F.col("sum_iv"), 9).alias("sum_item_var"),
        F.round(total_var, 9).alias("total_var"),
        F.round(
            (k_d / (F.col("k_items_chk") - 1))
            * (F.lit(1.0) - F.col("sum_iv") / total_var),
            9,
        ).alias("alpha"),
    )




@query(
    "stats_icc_oneway",
    oracle="""
    WITH y AS (
      SELECT c.c_nationkey AS nation,
             CAST(round(o.o_totalprice) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    per AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(y) AS BIGINT) AS s_i,
             CAST(sum(y * y) AS BIGINT) AS s2_i
      FROM y GROUP BY nation
    ),
    terms AS (
      SELECT n_i, s2_i,
             round(CAST(s_i AS DOUBLE) * s_i / n_i, 0) AS sq_over_n
      FROM per
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_i) AS BIGINT) AS nn,
             CAST(sum(n_i * n_i) AS BIGINT) AS sn2,
             CAST(sum(s2_i) AS BIGINT) AS s2_tot,
             list_reduce(list_sort(list(sq_over_n)), (a, b) -> a + b)
               AS ssq
      FROM terms
    ),
    sytab AS (SELECT CAST(sum(y) AS BIGINT) AS sy FROM y),
    g AS (
      SELECT k, nn, s2_tot, ssq, sy,
             CAST(nn - CAST(sn2 AS DOUBLE) / nn AS DOUBLE) / (k - 1)
               AS n0
      FROM tot, sytab
    )
    SELECT k AS n_groups, nn AS n_total,
           round(n0, 6) AS n0,
           round((ssq - CAST(sy AS DOUBLE) * sy / nn) / (k - 1), 0)
             AS msb,
           round((s2_tot - ssq) / (nn - k), 0) AS msw,
           round(((ssq - CAST(sy AS DOUBLE) * sy / nn) / (k - 1)
                  - (s2_tot - ssq) / (nn - k))
                 / ((ssq - CAST(sy AS DOUBLE) * sy / nn) / (k - 1)
                    + (n0 - 1) * ((s2_tot - ssq) / (nn - k))), 9)
             AS icc1
    FROM g
    """,
)
def stats_icc_oneway(spark: SparkSession, sf: str) -> DataFrame:
    """ONE-WAY RANDOM-EFFECTS ICC(1,1) of order value clustered by
    customer nation — how much of order-value variance is BETWEEN
    nations (the design-effect input: ICC > 0 inflates the variance
    of nation-clustered samples and every A/B test randomized by
    geography pays it). Unbalanced-ANOVA mean squares from EXACT
    BIGINT dollar moments (the gamma-fit overflow discipline); the
    per-group Sᵢ²/nᵢ terms are pre-rounded at 6 and folded SORTED
    since Sᵢ² itself would overflow int64 past ~sf1; n₀ is the
    standard unbalanced group-size correction. One map-combinable
    groupBy over 25 nations + a broadcast customer join."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    y = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("nation"),
            F.round(F.col("o_totalprice")).cast("long").alias("y"),
        )
    )
    y = y.localCheckpoint(eager=False)  # consumed twice
    per = y.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("y").alias("s_i"),
        F.sum(F.col("y") * F.col("y")).alias("s2_i"),
    )
    terms = per.select(
        "n_i",
        "s2_i",
        # round to the INTEGER grid: at ~1e14 magnitude any decimal
        # rounding is below double spacing and the two engines pick
        # different nearest doubles; integers are exact to 2^53
        F.round(
            F.col("s_i").cast("double") * F.col("s_i") / F.col("n_i"), 0
        ).alias("sq_over_n"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("nn"),
        F.sum(F.col("n_i") * F.col("n_i")).cast("long").alias("sn2"),
        F.sum("s2_i").cast("long").alias("s2_tot"),
        F.aggregate(
            F.array_sort(F.collect_list("sq_over_n")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("ssq"),
    )
    sy = y.agg(F.sum("y").alias("sy"))
    g = tot.crossJoin(F.broadcast(sy))
    n0 = (
        F.col("nn") - F.col("sn2").cast("double") / F.col("nn")
    ) / (F.col("k") - 1)
    msb = (
        F.col("ssq") - F.col("sy").cast("double") * F.col("sy") / F.col("nn")
    ) / (F.col("k") - 1)
    msw = (F.col("s2_tot") - F.col("ssq")) / (F.col("nn") - F.col("k"))
    return g.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        F.round(n0, 6).alias("n0"),
        # integer grid (see sq_over_n): mean squares sit at ~1e10
        F.round(msb, 0).alias("msb"),
        F.round(msw, 0).alias("msw"),
        F.round((msb - msw) / (msb + (n0 - 1) * msw), 9).alias("icc1"),
    )




@query(
    "stats_holm_bonferroni",
    oracle="""
    WITH ords AS (
      SELECT c.c_nationkey AS nation,
             o.o_orderdate < DATE '1995-07-01' AS h1,
             o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1996-01-01'
    ),
    per AS (
      SELECT nation,
             CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN h1 AND hi THEN 1 ELSE 0 END) AS BIGINT)
               AS x1,
             CAST(sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN NOT h1 AND hi THEN 1 ELSE 0 END) AS BIGINT)
               AS x2
      FROM ords GROUP BY nation
      HAVING sum(CASE WHEN h1 THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN hi THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN hi THEN 1 ELSE 0 END) < count(*)
    ),
    zed AS (
      SELECT nation, n1 + n2 AS n_orders,
             (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)) AS z
      FROM per
    ),
    xt AS (
      SELECT nation, n_orders, z,
             abs(z) / 1.4142135623730951 AS x,
             1.0 / (1.0 + 0.3275911 * (abs(z) / 1.4142135623730951)) AS t
      FROM zed
    ),
    pv AS (
      SELECT nation, n_orders, round(z, 9) AS z_stat,
             round((0.254829592 * t
                    - 0.284496736 * (t * t)
                    + 1.421413741 * (t * t * t)
                    - 1.453152027 * (t * t * t * t)
                    + 1.061405429 * (t * t * t * t * t))
                   * exp(-(x * x)), 12) AS p_value
      FROM xt
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_value, nation)
                  AS BIGINT) AS p_rank,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pv
    ),
    flags AS (
      SELECT *, round(0.05 / (m - p_rank + 1), 12) AS holm_threshold,
             CASE WHEN p_value <= 0.05 / (m - p_rank + 1)
                  THEN 1 ELSE 0 END AS ok
      FROM ranked
    )
    SELECT nation, n_orders, z_stat, p_value, p_rank, holm_threshold,
           CAST(min(ok) OVER (ORDER BY p_rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             = 1 AS rejected
    FROM flags
    """,
)
def stats_holm_bonferroni(spark: SparkSession, sf: str) -> DataFrame:
    """HOLM–BONFERRONI step-down over the same 25-hypothesis family as
    stats_bh_fdr (per-nation two-proportion z, 1995H1 vs H2): reject
    ranks 1..K where EVERY j ≤ K has p₍ⱼ₎ ≤ α/(m−j+1) — the FWER
    complement to BH's FDR (uniformly more powerful than plain
    Bonferroni, no independence assumption). The stop-at-first-
    failure scan is a running MIN of the per-rank indicator over the
    rank window — no iteration. Same exact-BIGINT counts, mirrored
    erfc polynomial, and degenerate-pooled-rate guard as the BH twin;
    the family is nation-bounded so the window is driver-trivial."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    ords = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .select(
            F.col("c_nationkey").alias("nation"),
            (F.col("o_orderdate") < F.lit("1995-07-01").cast("date")).alias(
                "h1"
            ),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hi"),
        )
    )
    per = (
        ords.groupBy("nation")
        .agg(
            F.sum(F.when(F.col("h1"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("h1") & F.col("hi"), 1).otherwise(0)).alias(
                "x1"
            ),
            F.sum(F.when(~F.col("h1"), 1).otherwise(0)).alias("n2"),
            F.sum(
                F.when(~F.col("h1") & F.col("hi"), 1).otherwise(0)
            ).alias("x2"),
        )
        .filter(
            (F.col("n1") > 0)
            & (F.col("n2") > 0)
            & (F.col("x1") + F.col("x2") > 0)
            & (F.col("x1") + F.col("x2") < F.col("n1") + F.col("n2"))
        )
    )
    pooled = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = (
        F.col("x1").cast("double") / F.col("n1")
        - F.col("x2").cast("double") / F.col("n2")
    ) / F.sqrt(
        pooled * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    zed = per.select(
        "nation",
        (F.col("n1") + F.col("n2")).cast("long").alias("n_orders"),
        z.alias("z"),
    )
    x = F.abs(F.col("z")) / F.lit(1.4142135623730951)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    erfc = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * (t * t)
        + F.lit(1.421413741) * (t * t * t)
        - F.lit(1.453152027) * (t * t * t * t)
        + F.lit(1.061405429) * (t * t * t * t * t)
    ) * F.exp(-(x * x))
    pv = zed.select(
        "nation",
        "n_orders",
        F.round(F.col("z"), 9).alias("z_stat"),
        F.round(erfc, 12).alias("p_value"),
    )
    w = Window.orderBy("p_value", "nation")
    ranked = pv.select(
        "*",
        F.row_number().over(w).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    thr = F.lit(0.05) / (F.col("m") - F.col("p_rank") + 1)
    flags = ranked.select(
        "*",
        F.round(thr, 12).alias("holm_threshold"),
        F.when(F.col("p_value") <= thr, 1).otherwise(0).alias("ok"),
    )
    wrun = Window.orderBy("p_rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flags.select(
        "nation",
        "n_orders",
        "z_stat",
        "p_value",
        "p_rank",
        "holm_threshold",
        (F.min("ok").over(wrun) == 1).alias("rejected"),
    )




@query(
    "stats_durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
      FROM events
      WHERE CAST(ts AS DATE) >= DATE '2024-01-01'
        AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) <= 29
      GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily
    ),
    resid AS (
      SELECT d.x,
             CAST(s.n * (s.n * s.sxx - s.sx * s.sx) AS DOUBLE)
               * CAST(d.y AS DOUBLE)
             - (CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
                  * CAST(s.sy AS DOUBLE)
                - CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
                  * CAST(s.sx AS DOUBLE))
             - CAST(s.n * (s.n * s.sxy - s.sx * s.sy) AS DOUBLE)
               * CAST(d.x AS DOUBLE) AS e
      FROM daily d, s
    ),
    diffs AS (
      SELECT e * e AS e2,
             CASE WHEN lag(e) OVER (ORDER BY x) IS NULL THEN NULL
                  ELSE (e - lag(e) OVER (ORDER BY x))
                       * (e - lag(e) OVER (ORDER BY x)) END AS d2
      FROM resid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(list_reduce(list_sort(list(d2) FILTER (d2 IS NOT NULL)),
                             (a, b) -> a + b)
                 / list_reduce(list_sort(list(e2)), (a, b) -> a + b), 9)
             AS dw,
           round(1.0
                 - list_reduce(list_sort(list(d2) FILTER (d2 IS NOT NULL)),
                               (a, b) -> a + b)
                   / list_reduce(list_sort(list(e2)), (a, b) -> a + b)
                   / 2.0, 9) AS rho1_approx
    FROM diffs
    """,
)
def stats_durbin_watson(spark: SparkSession, sf: str) -> DataFrame:
    """DURBIN–WATSON autocorrelation test on the daily-value OLS trend
    residuals — the 'are my regression errors independent' gate that
    decides whether the OLS trend's standard errors can be believed
    (DW ≈ 2 independent, → 0 positive serial correlation). The
    residuals use the n·den-scaled closed form (n·den·e_t = n·den·y_t
    − (den·Σy − num·Σx) − n·num·t — the ols_daily_trend rational-slope
    device carried one step further) with exact-int64 factors but
    DOUBLE triple products (the products would wrap int64 beyond the
    documented sf range while DuckDB errors — asymmetric; both engines
    run the identical IEEE expression); Σe² and Σ(Δe)² fold SORTED so
    both engines sum identical IEEE values, and the den² scale
    cancels in the ratio. DW and the ρ₁ ≈ 1 − DW/2 companion are
    mirrored doubles, round 9. One day-grain groupBy + a 30-row
    window."""
    e = load(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        e.select(
            day.alias("x"), F.round(F.col("value")).cast("long").alias("u")
        )
        .filter((F.col("x") >= 0) & (F.col("x") <= 29))
        .groupBy("x")
        .agg(F.sum("u").alias("y"))
    )
    daily = daily.localCheckpoint(eager=False)  # consumed twice
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # The n·den / den / num / n·num FACTORS stay exact int64 (bounded by
    # ~26100·max|Σy|, safe), but the triple products n·den·y and n·num·x
    # would wrap int64 beyond the documented sf range while DuckDB errors
    # on BIGINT overflow — an asymmetric parity break. Cast each factor
    # to double BEFORE the product, mirrored operation-for-operation in
    # the oracle, so both engines run the identical IEEE expression.
    resid = daily.crossJoin(F.broadcast(s)).select(
        "x",
        (
            (F.col("n") * den).cast("double") * F.col("y").cast("double")
            - (
                den.cast("double") * F.col("sy").cast("double")
                - num.cast("double") * F.col("sx").cast("double")
            )
            - (F.col("n") * num).cast("double") * F.col("x").cast("double")
        ).alias("e"),
    )
    wlag = Window.orderBy("x")
    diffs = resid.select(
        (F.col("e") * F.col("e")).alias("e2"),
        F.when(
            F.lag("e").over(wlag).isNull(), F.lit(None).cast("double")
        )
        .otherwise(
            (F.col("e") - F.lag("e").over(wlag))
            * (F.col("e") - F.lag("e").over(wlag))
        )
        .alias("d2"),
    )
    sum_d2 = F.aggregate(
        F.array_sort(
            F.filter(F.collect_list("d2"), lambda v: v.isNotNull())
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sum_e2 = F.aggregate(
        F.array_sort(F.collect_list("e2")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(sum_d2 / sum_e2, 9).alias("dw"),
        F.round(F.lit(1.0) - sum_d2 / sum_e2 / F.lit(2.0), 9).alias(
            "rho1_approx"
        ),
    )




@query(
    "stats_bartlett_test",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)
                      * CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS s2
      FROM orders GROUP BY o_orderpriority
      HAVING count(*) > 1
    ),
    v AS (
      SELECT priority, n_i,
             round((s2 - CAST(s AS DOUBLE) * s / n_i) / (n_i - 1), 6)
               AS var_i
      FROM per
    ),
    terms AS (
      SELECT n_i, var_i,
             round((n_i - 1) * var_i, 6) AS w_var,
             round((n_i - 1) * ln(var_i), 9) AS w_ln,
             round(1.0 / (n_i - 1), 12) AS inv_df
      FROM v
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_i) AS BIGINT) AS nn,
             list_reduce(list_sort(list(w_var)), (a, b) -> a + b) AS sw,
             list_reduce(list_sort(list(w_ln)), (a, b) -> a + b) AS sl,
             list_reduce(list_sort(list(inv_df)), (a, b) -> a + b) AS si
      FROM terms
    )
    SELECT k AS n_groups, nn AS n_total,
           round(sw / (nn - k), 3) AS pooled_var,
           round(((nn - k) * ln(sw / (nn - k)) - sl)
                 / (1.0 + (si - 1.0 / (nn - k)) / (3.0 * (k - 1))), 9)
             AS bartlett_stat
    FROM tot
    """,
)
def stats_bartlett_test(spark: SparkSession, sf: str) -> DataFrame:
    """BARTLETT'S TEST of variance homogeneity across the 5 order
    priorities — the parametric (normality-assuming) complement to the
    robust Levene/Brown-Forsythe already in the catalog: T = ((N−k)·
    ln S²ₚ − Σ(nᵢ−1)·ln Sᵢ²)/C with the standard C correction. Group
    moments are EXACT BIGINT dollars (gamma-fit overflow discipline;
    (Σy)² runs as a mirrored double since it exceeds int64 past
    ~sf0.1); the per-group variance, (nᵢ−1)·ln Sᵢ², and 1/(nᵢ−1)
    terms are pre-rounded and folded SORTED, so both engines assemble
    T from identical doubles, round 9 (χ²ₖ₋₁ reference). One
    map-combinable groupBy over a 5-class domain."""
    o = load(spark, sf, "orders")
    yy = F.round(F.col("o_totalprice")).cast("long")
    per = (
        o.select(F.col("o_orderpriority").alias("priority"), yy.alias("y"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("s2"),
        )
        .filter(F.col("n_i") > 1)
    )
    var_i = F.round(
        (F.col("s2") - F.col("s").cast("double") * F.col("s") / F.col("n_i"))
        / (F.col("n_i") - 1),
        6,
    )
    v = per.select("priority", "n_i", var_i.alias("var_i"))
    terms = v.select(
        "n_i",
        F.round((F.col("n_i") - 1) * F.col("var_i"), 6).alias("w_var"),
        F.round((F.col("n_i") - 1) * F.log(F.col("var_i")), 9).alias(
            "w_ln"
        ),
        F.round(F.lit(1.0) / (F.col("n_i") - 1), 12).alias("inv_df"),
    )

    def fold(col: str):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("nn"),
        fold("w_var").alias("sw"),
        fold("w_ln").alias("sl"),
        fold("inv_df").alias("si"),
    )
    dfree = F.col("nn") - F.col("k")
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        F.round(F.col("sw") / dfree, 3).alias("pooled_var"),
        F.round(
            (
                dfree * F.log(F.col("sw") / dfree)
                - F.col("sl")
            )
            / (
                F.lit(1.0)
                + (F.col("si") - F.lit(1.0) / dfree)
                / (F.lit(3.0) * (F.col("k") - 1))
            ),
            9,
        ).alias("bartlett_stat"),
    )




@query(
    "stats_fleiss_kappa",
    oracle="""
    WITH cell AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             event_type, CAST(count(*) AS BIGINT) AS n_ij
      FROM events
      WHERE CAST(ts AS DATE) >= DATE '2024-01-01'
        AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) <= 29
      GROUP BY 1, 2
    ),
    subj AS (
      SELECT d, CAST(sum(n_ij) AS BIGINT) AS n_i,
             CAST(sum(n_ij * n_ij) AS BIGINT) AS s2_i
      FROM cell GROUP BY d HAVING sum(n_ij) > 1
    ),
    pi AS (
      SELECT d, n_i,
             round(CAST(s2_i - n_i AS DOUBLE)
                   / (CAST(n_i AS DOUBLE) * (n_i - 1)), 12) AS p_i
      FROM subj
    ),
    pbar AS (
      SELECT CAST(count(*) AS BIGINT) AS n_subjects,
             list_reduce(list_sort(list(p_i)), (a, b) -> a + b) AS sp,
             CAST(sum(n_i) AS BIGINT) AS n_tot
      FROM pi
    ),
    cat AS (
      SELECT c.event_type, CAST(sum(c.n_ij) AS BIGINT) AS n_j
      FROM cell c JOIN subj s ON c.d = s.d
      GROUP BY c.event_type
    ),
    pe AS (
      SELECT list_reduce(list_sort(list(
               round((CAST(n_j AS DOUBLE) / b.n_tot)
                     * (CAST(n_j AS DOUBLE) / b.n_tot), 12))),
             (a, c) -> a + c) AS p_e
      FROM cat, pbar b GROUP BY b.n_tot
    )
    SELECT b.n_subjects, b.n_tot AS n_ratings,
           round(b.sp / b.n_subjects, 9) AS p_bar,
           round(pe.p_e, 9) AS p_e,
           round((b.sp / b.n_subjects - pe.p_e) / (1.0 - pe.p_e), 9)
             AS fleiss_kappa
    FROM pbar b, pe
    """,
)
def stats_fleiss_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """FLEISS' KAPPA over the day × event-type table — chance-corrected
    agreement treating each day as a subject and each event as one
    'rating' of that day into one of the k streams (the varying-nᵢ
    generalization: Pᵢ = (Σnᵢⱼ² − nᵢ)/(nᵢ(nᵢ−1))): κ near 0 means
    days are interchangeable traffic mixes, κ → 1 means single-stream
    days — a drift/segmentation prescreen. Cell counts exact BIGINTs;
    the 30 per-day Pᵢ and k category-share terms are pre-rounded at
    12 and folded SORTED; κ is one mirrored double, round 9. Two
    bounded groupBys."""
    e = load(spark, sf, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    cell = (
        e.select(day.alias("d"), "event_type")
        .filter((F.col("d") >= 0) & (F.col("d") <= 29))
        .groupBy("d", "event_type")
        .agg(F.count(F.lit(1)).alias("n_ij"))
    )
    cell = cell.localCheckpoint(eager=False)  # consumed twice
    subj = (
        cell.groupBy("d")
        .agg(
            F.sum("n_ij").alias("n_i"),
            F.sum(F.col("n_ij") * F.col("n_ij")).alias("s2_i"),
        )
        .filter(F.col("n_i") > 1)
    )
    subj = subj.localCheckpoint(eager=False)  # consumed twice
    pi = subj.select(
        "d",
        "n_i",
        F.round(
            (F.col("s2_i") - F.col("n_i")).cast("double")
            / (F.col("n_i").cast("double") * (F.col("n_i") - 1)),
            12,
        ).alias("p_i"),
    )
    pbar = pi.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.aggregate(
            F.array_sort(F.collect_list("p_i")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sp"),
        F.sum("n_i").cast("long").alias("n_tot"),
    )
    cat = (
        cell.join(subj.select("d"), "d")
        .groupBy("event_type")
        .agg(F.sum("n_ij").alias("n_j"))
    )
    pe = (
        cat.crossJoin(F.broadcast(pbar.select("n_tot")))
        .select(
            F.round(
                (F.col("n_j").cast("double") / F.col("n_tot"))
                * (F.col("n_j").cast("double") / F.col("n_tot")),
                12,
            ).alias("t")
        )
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("t")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("p_e")
        )
    )
    j = pbar.crossJoin(F.broadcast(pe))
    p_bar = F.col("sp") / F.col("n_subjects")
    return j.select(
        "n_subjects",
        F.col("n_tot").alias("n_ratings"),
        F.round(p_bar, 9).alias("p_bar"),
        F.round(F.col("p_e"), 9).alias("p_e"),
        F.round(
            (p_bar - F.col("p_e")) / (F.lit(1.0) - F.col("p_e")), 9
        ).alias("fleiss_kappa"),
    )




@query(
    "stats_tukey_hsd",
    oracle="""
    WITH y AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice) AS BIGINT) AS y
      FROM orders
    ),
    per AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM y GROUP BY grp
    ),
    msw AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_sort(list(
               round(s2 - CAST(s AS DOUBLE) * s / n_i, 0))),
               (a, b) -> a + b) AS ssw
      FROM per
    )
    SELECT a.grp AS group_a, b.grp AS group_b, a.n_i AS n_a, b.n_i AS n_b,
           round(CAST(a.s AS DOUBLE) / a.n_i
                 - CAST(b.s AS DOUBLE) / b.n_i, 6) AS mean_diff,
           round((CAST(a.s AS DOUBLE) / a.n_i
                  - CAST(b.s AS DOUBLE) / b.n_i)
                 / sqrt((m.ssw / (m.nn - m.k)) / 2.0
                        * (1.0 / a.n_i + 1.0 / b.n_i)), 9) AS q_stat
    FROM per a JOIN per b ON a.grp < b.grp, msw m
    """,
)
def stats_tukey_hsd(spark: SparkSession, sf: str) -> DataFrame:
    """TUKEY HSD pairwise q statistics across the 5 order priorities —
    the post-hoc step after stats_anova_oneway rejects: which specific
    priority pairs differ in mean order value (|q| against the
    studentized-range table at k=5). Uses the Tukey–Kramer unequal-n
    form q = Δmean/√(MSW/2·(1/nₐ+1/n_b)). Dollar moments exact
    BIGINTs (the gamma/ICC discipline); per-group SSW terms integer-
    grid pre-rounded then folded SORTED; the 10 pair rows come from a
    category-bounded self-join. Display doubles at round 6/9."""
    o = load(spark, sf, "orders")
    y = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice")).cast("long").alias("y"),
    )
    per = y.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    per = per.localCheckpoint(eager=False)  # consumed thrice
    ssw_term = F.round(
        F.col("s2") - F.col("s").cast("double") * F.col("s") / F.col("n_i"),
        0,
    )
    msw = per.select(
        "n_i", ssw_term.alias("t")
    ).agg(
        F.sum("n_i").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.array_sort(F.collect_list("t")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("ssw"),
    )
    a = per.select(
        F.col("grp").alias("group_a"),
        F.col("n_i").alias("n_a"),
        F.col("s").alias("s_a"),
    )
    b = per.select(
        F.col("grp").alias("group_b"),
        F.col("n_i").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(msw))
    )
    diff = (
        F.col("s_a").cast("double") / F.col("n_a")
        - F.col("s_b").cast("double") / F.col("n_b")
    )
    q = diff / F.sqrt(
        (F.col("ssw") / (F.col("nn") - F.col("k")))
        / F.lit(2.0)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(diff, 6).alias("mean_diff"),
        F.round(q, 9).alias("q_stat"),
    )




@query(
    "stats_log_rank_test",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey AS cust,
             min(o_orderdate) AS first_dt
      FROM orders GROUP BY o_custkey
    ),
    seconds AS (
      SELECT o.o_custkey AS cust, min(o.o_orderdate) AS second_dt
      FROM orders o JOIN firsts f ON o.o_custkey = f.cust
      WHERE o.o_orderdate > f.first_dt
      GROUP BY o.o_custkey
    ),
    horizon AS (SELECT max(o_orderdate) AS h FROM orders),
    subj AS (
      SELECT f.cust,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS grp1,
             CASE WHEN s.second_dt IS NOT NULL THEN 1 ELSE 0 END
               AS event,
             CASE WHEN s.second_dt IS NOT NULL
                  THEN datediff('day', f.first_dt, s.second_dt)
                  ELSE datediff('day', f.first_dt, hz.h) END AS t
      FROM firsts f
      JOIN customer c ON c.c_custkey = f.cust
      LEFT JOIN seconds s ON s.cust = f.cust
      CROSS JOIN horizon hz
    ),
    times AS (
      SELECT t AS et, CAST(sum(event) AS BIGINT) AS d_t,
             CAST(sum(CASE WHEN grp1 = 1 THEN event ELSE 0 END)
               AS BIGINT) AS d1_t
      FROM subj GROUP BY t HAVING sum(event) > 0
    ),
    risk AS (
      SELECT tm.et, tm.d_t, tm.d1_t,
             CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(s.grp1) AS BIGINT) AS n1_t
      FROM times tm JOIN subj s ON s.t >= tm.et
      GROUP BY tm.et, tm.d_t, tm.d1_t
    ),
    terms AS (
      SELECT round(d1_t - CAST(d_t AS DOUBLE) * n1_t / n_t, 12) AS oe,
             CASE WHEN n_t > 1 THEN round(
               CAST(d_t AS DOUBLE) * n1_t / n_t
               * (1.0 - CAST(n1_t AS DOUBLE) / n_t)
               * (n_t - d_t) / (n_t - 1), 12) ELSE 0.0 END AS v
      FROM risk
    )
    SELECT CAST(count(*) AS BIGINT) AS n_event_times,
           round(list_reduce(list_sort(list(oe)), (a, b) -> a + b), 6)
             AS observed_minus_expected,
           round(list_reduce(list_sort(list(v)), (a, b) -> a + b), 6)
             AS variance_sum,
           round(list_reduce(list_sort(list(oe)), (a, b) -> a + b)
                 * list_reduce(list_sort(list(oe)), (a, b) -> a + b)
                 / list_reduce(list_sort(list(v)), (a, b) -> a + b), 9)
             AS log_rank_chi2
    FROM terms
    """,
)
def stats_log_rank_test(spark: SparkSession, sf: str) -> DataFrame:
    """LOG-RANK TEST — do BUILDING-segment customers reorder faster?
    Duration = days from first to second order (censored at the
    corpus horizon), the two-group survival comparison completing the
    Kaplan–Meier op: χ² = (Σ(O₁ₜ−E₁ₜ))²/ΣVₜ over the distinct event
    times with the standard hypergeometric variance. Risk sets come
    from a time-join on the day-bounded event-time table (never a
    per-subject window); O−E and V terms are pre-rounded at 12 and
    folded SORTED, so both engines assemble the χ² from identical
    doubles, round 9."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    firsts = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.min("o_orderdate").alias("first_dt")
    )
    seconds = (
        o.join(
            firsts, o.o_custkey == firsts.cust
        )
        .filter(F.col("o_orderdate") > F.col("first_dt"))
        .groupBy("cust")
        .agg(F.min("o_orderdate").alias("second_dt"))
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    subj = (
        firsts.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            firsts.cust == F.col("c_custkey"),
        )
        .join(seconds, "cust", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "cust",
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("grp1"),
            F.when(F.col("second_dt").isNotNull(), 1)
            .otherwise(0)
            .alias("event"),
            F.when(
                F.col("second_dt").isNotNull(),
                F.datediff("second_dt", "first_dt"),
            )
            .otherwise(F.datediff("h", "first_dt"))
            .alias("t"),
        )
    )
    subj = subj.localCheckpoint(eager=False)  # consumed twice
    times = (
        subj.groupBy(F.col("t").alias("et"))
        .agg(
            F.sum("event").alias("d_t"),
            F.sum(
                F.when(F.col("grp1") == 1, F.col("event")).otherwise(0)
            ).alias("d1_t"),
        )
        .filter(F.col("d_t") > 0)
    )
    risk = (
        times.join(subj, subj.t >= times.et)
        .groupBy("et", "d_t", "d1_t")
        .agg(
            F.count(F.lit(1)).alias("n_t"),
            F.sum("grp1").alias("n1_t"),
        )
    )
    oe = F.round(
        F.col("d1_t")
        - F.col("d_t").cast("double") * F.col("n1_t") / F.col("n_t"),
        12,
    )
    v = F.when(
        F.col("n_t") > 1,
        F.round(
            F.col("d_t").cast("double")
            * F.col("n1_t")
            / F.col("n_t")
            * (F.lit(1.0) - F.col("n1_t").cast("double") / F.col("n_t"))
            * (F.col("n_t") - F.col("d_t"))
            / (F.col("n_t") - 1),
            12,
        ),
    ).otherwise(F.lit(0.0))
    terms = risk.select(oe.alias("oe"), v.alias("v"))

    def fold(col: str):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.round(fold("oe"), 6).alias("observed_minus_expected"),
        F.round(fold("v"), 6).alias("variance_sum"),
        F.round(fold("oe") * fold("oe") / fold("v"), 9).alias(
            "log_rank_chi2"
        ),
    )




@query(
    "stats_two_way_anova",
    oracle="""
    WITH y AS (
      SELECT o.o_orderpriority AS a, l.l_returnflag AS b,
             CAST(round(l.l_extendedprice) AS BIGINT) AS y
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS s2
      FROM y GROUP BY a, b
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(s2) AS BIGINT) AS s2t,
             CAST(count(DISTINCT a) AS BIGINT) AS ka,
             CAST(count(DISTINCT b) AS BIGINT) AS kb
      FROM cells
    ),
    sqs AS (
      SELECT
        (SELECT list_reduce(list_sort(list(
           round(CAST(s AS DOUBLE) * s / n, 0))), (x, z) -> x + z)
         FROM cells) AS sq_cells,
        (SELECT list_reduce(list_sort(list(
           round(CAST(s AS DOUBLE) * s / n, 0))), (x, z) -> x + z)
         FROM (SELECT a, CAST(sum(n) AS BIGINT) AS n,
                      CAST(sum(s) AS BIGINT) AS s
               FROM cells GROUP BY a)) AS sq_a,
        (SELECT list_reduce(list_sort(list(
           round(CAST(s AS DOUBLE) * s / n, 0))), (x, z) -> x + z)
         FROM (SELECT b, CAST(sum(n) AS BIGINT) AS n,
                      CAST(sum(s) AS BIGINT) AS s
               FROM cells GROUP BY b)) AS sq_b
    )
    SELECT t.ka AS k_a, t.kb AS k_b, t.nn AS n_total,
           round(q.sq_a - CAST(t.st AS DOUBLE) * t.st / t.nn, 0) AS ss_a,
           round(q.sq_b - CAST(t.st AS DOUBLE) * t.st / t.nn, 0) AS ss_b,
           round(q.sq_cells - q.sq_a - q.sq_b
                 + CAST(t.st AS DOUBLE) * t.st / t.nn, 0) AS ss_ab,
           round(t.s2t - q.sq_cells, 0) AS ss_error,
           round((q.sq_a - CAST(t.st AS DOUBLE) * t.st / t.nn)
                 / (t.ka - 1)
                 / ((t.s2t - q.sq_cells) / (t.nn - t.ka * t.kb)), 9)
             AS f_a,
           round((q.sq_b - CAST(t.st AS DOUBLE) * t.st / t.nn)
                 / (t.kb - 1)
                 / ((t.s2t - q.sq_cells) / (t.nn - t.ka * t.kb)), 9)
             AS f_b,
           round((q.sq_cells - q.sq_a - q.sq_b
                  + CAST(t.st AS DOUBLE) * t.st / t.nn)
                 / ((t.ka - 1) * (t.kb - 1))
                 / ((t.s2t - q.sq_cells) / (t.nn - t.ka * t.kb)), 9)
             AS f_ab
    FROM tot t, sqs q
    """,
)
def stats_two_way_anova(spark: SparkSession, sf: str) -> DataFrame:
    """TWO-WAY ANOVA (priority × return flag on line revenue) with the
    unadjusted cell-means decomposition: SS_A, SS_B, SS_AB = SS_cells
    − SS_A − SS_B, SSE = SST − SS_cells, and the three F ratios — the
    'does the return-behavior effect DEPEND on priority' interaction
    test one-way ANOVA can't ask. (Unbalanced data makes this the
    Type-I-style sequential decomposition; documented, mirrored.)
    Cell moments are EXACT BIGINT dollars; every Σs²/n family is
    integer-grid pre-rounded and folded SORTED (the ICC device,
    three folds: cells, A margins, B margins); F's are mirrored
    doubles, round 9. One fact-join groupBy to a 15-cell table."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    y = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("a"),
        F.col("l_returnflag").alias("b"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    cells = y.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    cells = cells.localCheckpoint(eager=False)  # 4 consumers

    def sqfold(df, keys):
        g = df.groupBy(*keys).agg(
            F.sum("n").alias("n"), F.sum("s").alias("s")
        ) if keys else df
        term = F.round(
            F.col("s").cast("double") * F.col("s") / F.col("n"), 0
        )
        return g.select(term.alias("t")).agg(
            F.aggregate(
                F.array_sort(F.collect_list("t")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("sq")
        )

    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("st"),
        F.sum("s2").cast("long").alias("s2t"),
        F.countDistinct("a").cast("long").alias("ka"),
        F.countDistinct("b").cast("long").alias("kb"),
    )
    sq_cells = sqfold(cells, []).select(F.col("sq").alias("sq_cells"))
    sq_a = sqfold(cells, ["a"]).select(F.col("sq").alias("sq_a"))
    sq_b = sqfold(cells, ["b"]).select(F.col("sq").alias("sq_b"))
    j = (
        tot.crossJoin(F.broadcast(sq_cells))
        .crossJoin(F.broadcast(sq_a))
        .crossJoin(F.broadcast(sq_b))
    )
    corr = F.col("st").cast("double") * F.col("st") / F.col("nn")
    ss_a = F.col("sq_a") - corr
    ss_b = F.col("sq_b") - corr
    ss_ab = F.col("sq_cells") - F.col("sq_a") - F.col("sq_b") + corr
    ss_e = F.col("s2t") - F.col("sq_cells")
    df_e = F.col("nn") - F.col("ka") * F.col("kb")
    mse = ss_e / df_e
    return j.select(
        F.col("ka").alias("k_a"),
        F.col("kb").alias("k_b"),
        F.col("nn").alias("n_total"),
        F.round(ss_a, 0).alias("ss_a"),
        F.round(ss_b, 0).alias("ss_b"),
        F.round(ss_ab, 0).alias("ss_ab"),
        F.round(ss_e, 0).alias("ss_error"),
        F.round(ss_a / (F.col("ka") - 1) / mse, 9).alias("f_a"),
        F.round(ss_b / (F.col("kb") - 1) / mse, 9).alias("f_b"),
        F.round(
            ss_ab / ((F.col("ka") - 1) * (F.col("kb") - 1)) / mse, 9
        ).alias("f_ab"),
    )




@query(
    "stats_powerlaw_ks_fit",
    oracle="""
    WITH tail AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS x
      FROM orders WHERE round(o_totalprice) >= 200000
    ),
    alpha AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             1.0 + count(*) / list_reduce(list_sort(list(
               round(ln(CAST(x AS DOUBLE) / 200000.0), 12))),
               (a, b) -> a + b) AS a_hat
      FROM tail
    ),
    ranked AS (
      SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS rk
      FROM tail
    ),
    ks AS (
      SELECT max(abs(CAST(rk AS DOUBLE) / al.n
                     - (1.0 - exp((1.0 - al.a_hat)
                                  * ln(CAST(x AS DOUBLE) / 200000.0)))))
               AS d
      FROM ranked, alpha al
    )
    SELECT al.n AS n_tail, CAST(200000 AS BIGINT) AS xmin_dollars,
           round(al.a_hat, 9) AS alpha_hat,
           round(ks.d, 9) AS ks_d
    FROM alpha al, ks
    """,
)
def stats_powerlaw_ks_fit(spark: SparkSession, sf: str) -> DataFrame:
    """POWER-LAW TAIL FIT + KS GOODNESS — the Clauset-Shalizi-Newman
    workflow's core: Hill/MLE exponent α̂ = 1 + n/Σln(x/xmin) over the
    order-value tail (xmin pinned at $200k), then the KS distance
    between the empirical tail CDF and the fitted CDF 1 −
    (x/xmin)^(1−α̂) — the 'is this really a power law' one-number
    check behind every heavy-tail claim. ln terms pre-rounded and
    folded SORTED; the fitted CDF uses exp((1−α̂)·ln r), the SAME
    expression tree both engines, and the KS max is order-free. The
    rank window runs over the tail only (tails are small by
    definition; range-shard it past ~10⁸ tail rows)."""
    o = load(spark, sf, "orders")
    x = F.round(F.col("o_totalprice")).cast("long")
    tail = o.select(x.alias("x")).filter(F.col("x") >= 200000)
    tail = tail.localCheckpoint(eager=False)  # consumed twice
    lnterm = F.round(
        F.log(F.col("x").cast("double") / F.lit(200000.0)), 12
    )
    alpha = tail.select(lnterm.alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.aggregate(
                F.array_sort(F.collect_list("t")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("a_hat"),
    )
    ranked = tail.select(
        "x", F.row_number().over(Window.orderBy("x")).cast("long").alias("rk")
    )
    j = ranked.crossJoin(F.broadcast(alpha))
    theo = F.lit(1.0) - F.exp(
        (F.lit(1.0) - F.col("a_hat"))
        * F.log(F.col("x").cast("double") / F.lit(200000.0))
    )
    ks = j.agg(
        F.max(
            F.abs(F.col("rk").cast("double") / F.col("n") - theo)
        ).alias("d")
    )
    return alpha.crossJoin(F.broadcast(ks)).select(
        F.col("n").alias("n_tail"),
        F.lit(200000).cast("long").alias("xmin_dollars"),
        F.round(F.col("a_hat"), 9).alias("alpha_hat"),
        F.round(F.col("d"), 9).alias("ks_d"),
    )




@query(
    "stats_cuped_variance_reduction",
    oracle="""
    WITH pre AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1997-01-01'
      GROUP BY 1
    ),
    post AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders
      WHERE o_orderdate >= DATE '1997-01-01'
        AND o_orderdate < DATE '1998-01-01'
      GROUP BY 1
    ),
    j AS (
      SELECT p.cust, p.x, coalesce(q.y, 0) AS y
      FROM pre p LEFT JOIN post q ON q.cust = p.cust
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM j
    )
    SELECT n AS n_customers,
           round((sxy - CAST(sx AS DOUBLE) * sy / n)
                 / (sxx - CAST(sx AS DOUBLE) * sx / n), 9) AS theta,
           round(((sxy - CAST(sx AS DOUBLE) * sy / n)
                  * (sxy - CAST(sx AS DOUBLE) * sy / n))
                 / ((sxx - CAST(sx AS DOUBLE) * sx / n)
                    * (syy - CAST(sy AS DOUBLE) * sy / n)), 9)
             AS rho_squared,
           round(100.0 * ((sxy - CAST(sx AS DOUBLE) * sy / n)
                          * (sxy - CAST(sx AS DOUBLE) * sy / n))
                 / ((sxx - CAST(sx AS DOUBLE) * sx / n)
                    * (syy - CAST(sy AS DOUBLE) * sy / n)), 6)
             AS variance_reduction_pct
    FROM m
    """,
)
def stats_cuped_variance_reduction(
    spark: SparkSession, sf: str
) -> DataFrame:
    """CUPED PRE-REGISTRATION — how much A/B variance would the
    pre-period covariate remove? θ = cov(pre, post)/var(pre) is the
    adjustment coefficient and ρ² the guaranteed variance reduction
    (Deng et al. 2013) — the number that decides whether an
    experiment needs 4 weeks or 1. Pre = 1996 customer revenue, post
    = 1997 (absent post = exact 0, kept — churned customers are
    signal). All five moments are EXACT BIGINT dollars in one
    customer-grain groupBy; θ and ρ² are mirrored single-expression
    doubles, round 9/6."""
    o = load(spark, sf, "orders")
    dollars = F.round(F.col("o_totalprice")).cast("long")
    pre = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sum(dollars).alias("x"))
    )
    post = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sum(dollars).alias("y"))
    )
    j = pre.join(post, "cust", "left").select(
        "x", F.coalesce("y", F.lit(0)).alias("y")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov = F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col(
        "n"
    )
    vx = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col(
        "n"
    )
    vy = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col(
        "n"
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.round(cov / vx, 9).alias("theta"),
        F.round(cov * cov / (vx * vy), 9).alias("rho_squared"),
        F.round(F.lit(100.0) * cov * cov / (vx * vy), 6).alias(
            "variance_reduction_pct"
        ),
    )




@query(
    "stats_ratio_metric_delta_ci",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS cust,
             CAST(count(*) AS BIGINT) AS y,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY o_custkey
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per
    ),
    r AS (
      SELECT n, sx, sy,
             CAST(sx AS DOUBLE) / sy AS ratio,
             (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vx,
             (syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vy,
             (sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS cxy,
             CAST(sy AS DOUBLE) / n AS ybar
      FROM m
    )
    SELECT n AS n_customers, round(ratio, 9) AS revenue_per_order,
           round(sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy)
                      / n) / ybar, 9) AS delta_se,
           round(ratio - 1.959963984540054
                 * sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy)
                        / n) / ybar, 6) AS ci_lo,
           round(ratio + 1.959963984540054
                 * sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy)
                        / n) / ybar, 6) AS ci_hi
    FROM r
    """,
)
def stats_ratio_metric_delta_ci(
    spark: SparkSession, sf: str
) -> DataFrame:
    """DELTA-METHOD CI FOR A RATIO METRIC — revenue-per-order with
    customer-level clustering: the ratio of sums Σx/Σy is NOT a mean
    of per-customer ratios, and its variance needs the delta method
    Var ≈ (σx² − 2R·σxy + R²·σy²)/(n·ȳ²) (Deng et al.) — the standard
    fix for every per-session/per-order metric randomized per user.
    Customer-grain moments are exact BIGINT dollars/counts; SE and
    the 95% CI are mirrored expression ladders (z = 1.959963… as a
    shared literal), round 9/6. One customer groupBy."""
    o = load(spark, sf, "orders")
    per = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.count(F.lit(1)).alias("y"),
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("x"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    ratio = F.col("sx").cast("double") / F.col("sy")
    vx = (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / n) / (
        n - 1
    )
    vy = (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n) / (
        n - 1
    )
    cxy = (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / n) / (
        n - 1
    )
    ybar = F.col("sy").cast("double") / n
    se = F.sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy) / n) / ybar
    z = F.lit(1.959963984540054)
    return m.select(
        n.alias("n_customers"),
        F.round(ratio, 9).alias("revenue_per_order"),
        F.round(se, 9).alias("delta_se"),
        F.round(ratio - z * se, 6).alias("ci_lo"),
        F.round(ratio + z * se, 6).alias("ci_hi"),
    )




@query(
    "stats_ols_slope_by_quarter",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('quarter', CAST(l_shipdate AS DATE)) AS q,
             datediff('day', DATE '1997-01-01', CAST(l_shipdate AS DATE))
               AS x,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS y
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    s AS (
      SELECT strftime(q, '%Y-Q') || CAST((month(q) + 2) // 3 AS VARCHAR)
               AS quarter,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY q
    )
    SELECT quarter, n AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 9) AS slope_cents_per_day
    FROM s
    """,
)
def stats_ols_slope_by_quarter(
    spark: SparkSession, sf: str
) -> DataFrame:
    """QUARTERLY OLS SLOPE STABILITY — the 1997 daily-revenue trend
    refit per quarter: four slopes whose sign flips or magnitude
    jumps tell you the single full-year trend (stats_ols_daily_trend)
    is averaging over regimes — the cheapest structural-stability
    check before anyone extrapolates it. Same exact-BIGINT normal
    equations per quarter (the rational slope_num/slope_den ships so
    downstream comparisons stay float-free); one day groupBy + a
    4-row rollup."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = li.groupBy(
        F.trunc(F.col("l_shipdate").cast("date"), "quarter").alias("q"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1997-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.sum(cents).alias("y"))
    quarter = F.concat(
        F.date_format("q", "yyyy"),
        F.lit("-Q"),
        ((F.month("q") + 2) / 3).cast("int").cast("string"),
    )
    s = daily.groupBy(quarter.alias("quarter")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "quarter",
        F.col("n").alias("n_days"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.round(num.cast("double") / den, 9).alias(
            "slope_cents_per_day"
        ),
    )




@query(
    "stats_jackknife_ratio_se",
    oracle="""
    WITH g AS (
      SELECT n.n_name AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c_i,
             CAST(count(*) AS BIGINT) AS n_i
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(c_i) AS BIGINT) AS tc, CAST(sum(n_i) AS BIGINT) AS tn,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    loo AS (
      SELECT k, tc, tn,
             round(CAST(tc - c_i AS DOUBLE) / (tn - n_i), 6) AS theta_i
      FROM g CROSS JOIN tot
    ),
    bar AS (
      SELECT k, tc, tn,
             round(list_reduce(list_sort(list(theta_i)), (a, b) -> a + b)
                   / k, 6) AS theta_bar,
             list_sort(list(theta_i)) AS thetas
      FROM loo GROUP BY k, tc, tn
    )
    SELECT k AS n_groups,
           round(CAST(tc AS DOUBLE) / tn, 4) AS theta_hat,
           round((k - 1) * (theta_bar - CAST(tc AS DOUBLE) / tn), 6)
             AS jack_bias,
           round(sqrt((k - 1.0) / k
                 * list_reduce(
                     list_sort(
                       list_transform(
                         thetas,
                         t -> (t - theta_bar) * (t - theta_bar)
                       )
                     ),
                     (a, b) -> a + b)), 6) AS jack_se
    FROM bar
    """,
)
def stats_jackknife_ratio_se(spark: SparkSession, sf: str) -> DataFrame:
    """DELETE-ONE-GROUP JACKKNIFE standard error for the mean
    order-value RATIO estimator, groups = customer nations — the
    assumption-free uncertainty number for a ratio whose analytic SE
    (delta method, already in the catalog) leans on independence the
    nation clustering violates; the jackknife bias term comes free.
    NO resampling loop: each leave-one-out replicate is a closed form
    over the exact per-group BIGINT sums ((T_c−c_i)/(T_n−n_i)), so
    the whole estimator is one groupBy + a 25-row fold. θ_i/θ̄ round
    at 6 (≤15 significant digits at the 1e7 ratio magnitude — decimal
    rounding beyond double resolution is engine-divergent), the raw
    squared deviations fold SORTED unrounded (bit-identical inputs),
    outputs round 4/6 inside resolution."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    g = (
        o.select("o_custkey", F.round(F.col("o_totalprice") * 100)
                 .cast("long").alias("cents"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum("cents").alias("c_i"),
            F.count(F.lit(1)).cast("long").alias("n_i"),
        )
    )
    tot = g.agg(
        F.sum("c_i").alias("tc"),
        F.sum("n_i").alias("tn"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        "k", "tc", "tn",
        F.round(
            (F.col("tc") - F.col("c_i")).cast("double")
            / (F.col("tn") - F.col("n_i")),
            6,
        ).alias("theta_i"),
    )

    def fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bar = loo.groupBy("k", "tc", "tn").agg(
        F.round(fold("theta_i") / F.col("k"), 6).alias("theta_bar"),
        F.array_sort(F.collect_list("theta_i")).alias("thetas"),
    )
    # NO rounding on the squared deviations: their ~1e10 magnitude puts
    # 12-decimal rounding beyond double resolution, where the two
    # engines' decimal-round implementations pick different ulps
    # (observed at sf0.1). The inputs (theta_i, theta_bar) are already
    # identical rounded-6 doubles, so the raw square and sorted fold
    # are bit-identical by construction.
    dev2 = F.transform(
        F.col("thetas"),
        lambda t: (t - F.col("theta_bar")) * (t - F.col("theta_bar")),
    )
    theta_hat = F.col("tc").cast("double") / F.col("tn")
    return bar.select(
        F.col("k").alias("n_groups"),
        F.round(theta_hat, 4).alias("theta_hat"),
        F.round(
            (F.col("k") - 1) * (F.col("theta_bar") - theta_hat), 6
        ).alias("jack_bias"),
        F.round(
            F.sqrt(
                (F.col("k") - 1.0)
                / F.col("k")
                * F.aggregate(
                    F.array_sort(dev2),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("jack_se"),
    )


__all__ = sorted(n for n in dir() if not n.startswith("__"))
