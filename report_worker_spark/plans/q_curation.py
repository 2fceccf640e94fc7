"""Catalog family: training-data curation, sampling and packing audits.

Mechanically split from the monolithic plans/catalog.py (round
12); query definition order within the family is the original
file order, and all shared helpers come from ``_qshared``.
"""

from __future__ import annotations

from ._qshared import *  # noqa: F401,F403




@query(
    "curation_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 CAST(CAST(concat('0x', substr(md5(concat('split1',
                      CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100 AS INT) AS b
          FROM documents)
    """,
)
def curation_split(spark: SparkSession, sf: str) -> DataFrame:
    """Stable train/val/test assignment by content-hash bucket —
    partitioning-independent (sample()/randomSplit() are not) and
    stable under appends: a doc keeps its split forever."""
    from ..functions.curation import train_val_test_split

    d = load(spark, sf, "documents")
    return train_val_test_split(d, "doc_id").select("doc_id", "split")




@query(
    "curation_sample",
    oracle="""
    SELECT doc_id, n_chars
    FROM (SELECT doc_id, n_chars,
                 CAST(CAST(concat('0x', substr(md5(concat('s1',
                      CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100 AS INT) AS b
          FROM documents)
    WHERE b < 10
    """,
)
def curation_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~10% sample by content hash."""
    from ..functions.curation import deterministic_sample

    d = load(spark, sf, "documents")
    return deterministic_sample(d, "doc_id", 10).select("doc_id", "n_chars")




@query(
    "curation_rebalance",
    oracle="""
    SELECT doc_id, source
    FROM (SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(CAST(concat('0x', substr(md5(concat('mix1',
                            CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100
                            AS INT) ASC,
                            doc_id ASC) AS rn
          FROM documents)
    WHERE rn <= 15
    """,
)
def curation_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """Data-mix rebalancing: cap each source at N docs, chosen by a
    stable hash order (not arrival order) — rerunning after appends
    keeps earlier selections whenever their buckets still rank first."""
    from ..functions.curation import hash_bucket

    d = load(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(
        hash_bucket("doc_id", "mix1").asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("doc_id", "source")
    )




# --- Benchmark decontamination (LLM-pipeline core op) ------------------------


@query(
    "curation_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                            t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                            t[i+6] || ' ' || t[i+7]
                            for i in range(1, len(t) - 6)]) AS g
      FROM toks WHERE len(t) >= 8
    ), ex AS (
      SELECT doc_id, unnest(g) AS gram FROM grams
    ), bench AS (
      SELECT DISTINCT gram FROM ex WHERE doc_id % 17 = 0
    )
    SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_bench_grams
    FROM ex e JOIN bench b ON e.gram = b.gram
    WHERE e.doc_id % 17 <> 0
    GROUP BY e.doc_id
    """,
)
def curation_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 8-token
    gram with the held-out 'benchmark' slice (here: doc_id % 17 = 0 —
    the standard n-gram-overlap decontamination used for LLM training
    sets). Shape at 100 TB: the benchmark gram set is small and
    broadcast; training grams stream through an equi-join — no shuffle
    of the corpus, no cross join. Returns per-doc distinct contaminated
    gram counts (docs with zero hits are clean and absent)."""
    from ..functions.dedup import word_shingles
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    grams = d.select(
        "doc_id", F.explode(word_shingles("text", 8)).alias("gram")
    )
    bench = (
        grams.filter(F.col("doc_id") % 17 == 0).select("gram").dropDuplicates()
    )
    train = grams.filter(F.col("doc_id") % 17 != 0)
    return (
        train.join(F.broadcast(bench), on="gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bench_grams"))
    )




@query(
    "curation_pipeline_e2e",
    oracle="""
    WITH kept AS (
      SELECT doc_id, text, n_chars FROM documents
      WHERE n_chars >= 200
        AND len(string_split_regex(trim(text), '\\s+')) >= 30
    ), dedup AS (
      SELECT min(doc_id) AS doc_id, max(n_chars) AS n_chars
      FROM kept GROUP BY md5(text)
    ), split AS (
      SELECT doc_id, n_chars,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, n_chars,
                   CAST(CAST(concat('0x', substr(md5(concat('split1',
                        CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100 AS INT)
                     AS b
            FROM dedup)
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM split GROUP BY split
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The end-to-end curation story in one plan: quality gate (length +
    token floor) → exact dedup (md5 groups, min-id canonical) → stable
    content-hash split assignment → per-split accounting. Every stage is
    a hash aggregate or a stateless projection — the whole pipeline is
    two shuffles (dedup groupBy, final groupBy) regardless of corpus
    size."""
    from ..functions.curation import train_val_test_split

    d = load(spark, sf, "documents")
    kept = d.filter(
        (F.col("n_chars") >= 200) & (F.size(tx.tokens("text")) >= 30)
    )
    dedup = kept.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id"), F.max("n_chars").alias("n_chars")
    )
    split = train_val_test_split(dedup, "doc_id").select(
        "doc_id", "n_chars", "split"
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )




@query(
    "curation_stratified_sample",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             CAST(CAST(concat('0x', substr(md5(concat('strat1',
                  CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) % 100 AS INT) AS b
      FROM documents)
    WHERE (source = 'web' AND b < 5)
       OR (source = 'books' AND b < 50)
       OR (source NOT IN ('web', 'books') AND b < 20)
    """,
)
def curation_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified sampling with per-source rates (down-weight crawl,
    keep books) — deterministic content-hash buckets, NOT sampleBy():
    Bernoulli sampling is partitioning-dependent, so a re-read with
    different parallelism would change the sample. One projection + one
    filter; no shuffle."""
    from ..functions.curation import hash_bucket

    d = load(spark, sf, "documents")
    b = hash_bucket("doc_id", "strat1")
    rate = (
        F.when(F.col("source") == "web", F.lit(5))
        .when(F.col("source") == "books", F.lit(50))
        .otherwise(F.lit(20))
    )
    return d.filter(b < rate).select("doc_id", "source")




@query(
    "curation_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - n_tokens AS tokens_before
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(floor(tokens_before / 2048) AS BIGINT) AS pack_id,
           tokens_before % 2048 AS pack_offset
    FROM c
    """,
)
def curation_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Training-sequence packing (concat-then-chunk): documents in
    stable id order, each assigned the 2048-token pack where its first
    token lands (the standard LLM pretraining packing approximation).
    Exact integer running sums, computed DISTRIBUTED (round 13): the
    corpus-grain prefix sum rides functions.ranks.ranked_prefix_sum —
    range-repartition on doc_id, per-shard local cumsum, a bounded
    shard-offset table — bit-identical to the SQL global window with
    no single-task sort at any scale."""
    from ..functions.ranks import ranked_prefix_sum

    d = load(spark, sf, "documents")
    t = d.select("doc_id", tx.token_count("text").cast("long").alias("n_tokens"))
    c = ranked_prefix_sum(t, ["doc_id"], "n_tokens", out_col="_ps").withColumn(
        "tokens_before", F.col("_ps") - F.col("n_tokens")
    )
    return c.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("tokens_before") / 2048).alias("pack_id"),
        (F.col("tokens_before") % 2048).alias("pack_offset"),
    )




@query(
    "curation_chunk_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t,
             len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST((gs.start - 1) // 24 AS BIGINT) AS chunk_idx,
           CAST(gs.start AS BIGINT) AS chunk_start,
           CAST(len(list_slice(t.t, gs.start, gs.start + 31)) AS BIGINT)
             AS chunk_tokens,
           md5(array_to_string(list_slice(t.t, gs.start, gs.start + 31), ' '))
             AS chunk_hash
    FROM t, unnest(range(1, greatest(t.n, 1) + 1, 24)) AS gs(start)
    """,
)
def curation_chunk_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking for LLM context building: 32-token
    chunks every 24 tokens (8-token overlap), one content-hash per
    chunk. split → sequence → explode → slice, all JVM, no shuffle."""
    from ..functions import curation as cu
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    return cu.chunk_with_overlap(d, window=32, stride=24)




@query(
    "curation_kfold",
    oracle="""
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5('kfold1' || CAST(doc_id AS VARCHAR)),
                1, 4) AS INTEGER) % 5 AS BIGINT) AS fold
    FROM documents
    """,
)
def curation_kfold(spark: SparkSession, sf: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) from the same
    content-hash bucketing as train/val/test splits: partitioning-
    independent, stable under appends, reproducible on any engine with
    md5 — no shuffle, no RNG state."""
    from ..functions.curation import hash_bucket

    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        (hash_bucket("doc_id", salt="kfold1", buckets=5))
        .cast("long")
        .alias("fold"),
    )




@query(
    "curation_mix_weights",
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_total
      FROM documents GROUP BY source
    ), t AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c
    )
    SELECT source, n_docs, n_chars_total,
           round(pow(CAST(n_docs AS DOUBLE) / total, 0.7), 12) AS w_raw
    FROM c, t
    """,
)
def curation_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based data-mix weights (the multilingual/LLM
    up-sampling rule w ∝ p^α, α=0.7): exact per-source counts, one
    pow() per source. Raw (unnormalized) weights are emitted because
    the normalizing sum is a float accumulation; pow is rounded to 12
    decimals (transcendental, like ln in drift_psi_bins). Output is
    |sources| rows from one combinable aggregate."""
    d = load(spark, sf, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    t = c.agg(F.sum("n_docs").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_chars_total",
        F.round(
            F.pow(F.col("n_docs").cast("double") / F.col("total"), 0.7), 12
        ).alias("w_raw"),
    )




@query(
    "curation_length_batches",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             CAST(n_tokens // 16 AS BIGINT) AS len_bucket,
             row_number() OVER (PARTITION BY n_tokens // 16
                                ORDER BY doc_id) AS rn
      FROM t
    )
    SELECT doc_id, n_tokens, len_bucket,
           CAST((rn - 1) // 8 AS BIGINT) AS batch_in_bucket
    FROM b
    """,
)
def curation_length_batches(spark: SparkSession, sf: str) -> DataFrame:
    """Length-bucketed batch assignment (pad-efficient batching: docs
    of similar token length train together, minimizing padding waste):
    bucket by n_tokens DIV 16, then deterministic 8-doc batches within
    each bucket by stable id order. The window runs per bucket — at
    scale each bucket is an independent partition, and the id-ordered
    row_number is the only coordination."""
    d = load(spark, sf, "documents")
    t = d.select(
        "doc_id", tx.token_count("text").cast("long").alias("n_tokens")
    )
    b = t.withColumn(
        "len_bucket", F.expr("CAST(n_tokens DIV 16 AS BIGINT)")
    )
    w = Window.partitionBy("len_bucket").orderBy("doc_id")
    return b.withColumn("rn", F.row_number().over(w)).select(
        "doc_id",
        "n_tokens",
        "len_bucket",
        F.expr("CAST((rn - 1) DIV 8 AS BIGINT)").alias("batch_in_bucket"),
    )




@query(
    "curation_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE CAST(concat('0x', substr(md5(concat('w1',
            CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) * 2048
          < CAST(n_chars AS BIGINT) * 65536
    """,
)
def curation_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Length-proportional document sampling: keep with probability
    min(1, n_chars/2048) decided by pure integer arithmetic on a
    16-bit md5 hash — deterministic, partitioning-independent, and a
    plain filter (no shuffle, pushes after the scan). The weighted
    counterpart of `curation_sample`'s uniform bucketing."""
    from ..functions.curation import length_weighted_sample

    d = load(spark, sf, "documents")
    return length_weighted_sample(d).select("doc_id", "n_chars")




@query(
    "curation_winsorize",
    oracle="""
    WITH cents AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ), bounds AS (
      SELECT event_type,
             quantile_cont(c, 0.05) AS lo,
             quantile_cont(c, 0.95) AS hi
      FROM cents GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.c,
           least(greatest(CAST(e.c AS DOUBLE), b.lo), b.hi) AS c_winsorized,
           (CAST(e.c AS DOUBLE) < b.lo OR CAST(e.c AS DOUBLE) > b.hi)
             AS clipped
    FROM cents e JOIN bounds b ON e.event_type = b.event_type
    """,
)
def curation_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group winsorization (outlier clipping at exact p05/p95) —
    the feature-cleaning step before training-metadata aggregation. Two
    shuffles: the exact grouped percentile (integer cents, the proven
    bit-identical quantile_cont twin) and the clip itself is a
    broadcast join of |groups| rows back onto the stream. The clipped
    value stays DOUBLE: least/greatest SELECT one of two bit-identical
    doubles, so parity is exact (a BIGINT re-cast would diverge —
    Spark truncates, DuckDB rounds)."""
    cents = load(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    bounds = cents.groupBy("event_type").agg(
        F.percentile("c", F.lit(0.05)).alias("lo"),
        F.percentile("c", F.lit(0.95)).alias("hi"),
    )
    cd = F.col("c").cast("double")
    return (
        cents.join(F.broadcast(bounds), on="event_type")
        .select(
            "event_id",
            "event_type",
            "c",
            F.least(F.greatest(cd, F.col("lo")), F.col("hi")).alias(
                "c_winsorized"
            ),
            ((cd < F.col("lo")) | (cd > F.col("hi"))).alias("clipped"),
        )
    )




@query(
    "curation_contrastive_triplets",
    oracle=f"""
    WITH {_NGRAM3_SQL},
    pairs AS (
      SELECT id_a, id_b FROM inter
      WHERE CAST(n_common AS DOUBLE) / (sz_a + sz_b - n_common) >= 0.8
    ),
    pos AS (
      SELECT anchor, min(other) AS positive_id FROM (
        SELECT id_a AS anchor, id_b AS other FROM pairs
        UNION ALL
        SELECT id_b AS anchor, id_a AS other FROM pairs
      ) GROUP BY anchor
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT anchor AS anchor_id, positive_id,
           CASE
             WHEN cand <> anchor AND cand <> positive_id THEN cand
             WHEN (cand + 1) % n_docs <> anchor
                  AND (cand + 1) % n_docs <> positive_id
               THEN (cand + 1) % n_docs
             ELSE (cand + 2) % n_docs
           END AS negative_id
    FROM (SELECT p.*, n.n_docs,
                 (p.anchor * 7919 + 13) % n.n_docs AS cand
          FROM pos p CROSS JOIN n)
    """,
)
def curation_contrastive_triplets(spark: SparkSession, sf: str) -> DataFrame:
    """(anchor, positive, negative) triplet mining for contrastive
    training: positives are verified 3-gram-Jaccard≥0.8 near-dups
    (earliest partner — deterministic), negatives are a fixed affine
    hash of the anchor id over the corpus ring, skipping forward past
    collisions with the anchor/positive (three consecutive candidates
    cannot all collide with two ids). The pair mining reuses the
    prefix-filtered inverted index; the negative draw is O(1) per
    anchor — no sampling shuffle, reproducible across runs and
    engines."""
    d = load(spark, sf, "documents")
    pairs = dd.ngram_jaccard_pairs(d, n=3, threshold=0.8)
    pos = (
        pairs.select(F.col("id_a").alias("anchor"), F.col("id_b").alias("other"))
        .unionAll(
            pairs.select(F.col("id_b").alias("anchor"), F.col("id_a").alias("other"))
        )
        .groupBy("anchor")
        .agg(F.min("other").alias("positive_id"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    cand = (F.col("anchor") * 7919 + 13) % F.col("n_docs")
    c1 = (cand + 1) % F.col("n_docs")
    c2 = (cand + 2) % F.col("n_docs")
    neg = (
        F.when((cand != F.col("anchor")) & (cand != F.col("positive_id")), cand)
        .when((c1 != F.col("anchor")) & (c1 != F.col("positive_id")), c1)
        .otherwise(c2)
    )
    return (
        pos.crossJoin(F.broadcast(n))
        .select(
            F.col("anchor").alias("anchor_id"),
            "positive_id",
            neg.alias("negative_id"),
        )
    )




@query(
    "curation_reservoir_k",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || ':rk'),
                                         doc_id) AS rn
      FROM documents)
    WHERE rn <= 20
    """,
)
def curation_reservoir_k(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-k-per-group sampling (min(k, n) docs per source) — the
    deterministic equivalent of a per-group reservoir: rank by a
    content-independent md5 of the id (uniform, reproducible on any
    partitioning/engine) and keep the first 20. One keyed window
    shuffle; the rate-based samplers (curation_sample/stratified) can't
    promise exact group sizes, this can."""
    d = load(spark, sf, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rk")))
    w = Window.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source")
    )




@query(
    "curation_token_budget_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS r
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY r, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM d
    )
    SELECT doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens - n_tokens < 10000
    """,
)
def curation_token_budget_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sampling: the first ~10k tokens of the corpus in
    deterministic md5 order (curation.py:token_budget_sample). The
    oracle computes the global prefix sum as ONE ordered window — the
    thing the Spark side must equal while never materializing a
    corpus-wide single-partition sort (hex-prefix shards + in-shard
    windows + a 256-row offset table). Hash-parity certifies the
    distributed prefix-sum decomposition is exactly the sequential
    semantics."""
    from ..functions import curation as cu
    from ..util import spread

    d = spread(load(spark, sf, "documents")).select(
        "doc_id", tx.token_count("text").cast("long").alias("n_tokens")
    )
    return cu.token_budget_sample(d, budget=10_000)




@query(
    "curation_dp_noisy_counts",
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    u AS (
      SELECT source, n,
             (CAST(CAST(('0x' || substr(md5('dp:' || source), 1, 8))
                        AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 - 0.5
               AS uu
      FROM c
    )
    SELECT source, n,
           round(CAST(n AS DOUBLE)
                 + (-sign(uu) * ln(1.0 - 2.0 * abs(uu))), 12) AS noisy_n
    FROM u
    """,
)
def curation_dp_noisy_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism, b=1 —
    the ε=1 / sensitivity-1 setting for per-group COUNT): the shape a
    pipeline uses to publish per-source corpus stats without exposing
    any single document's membership. The "randomness" is the
    deterministic md5-uniform device (seeded per key, (u+0.5)/2³² −
    0.5 ∈ (−0.5, 0.5), so the inverse-CDF ln never sees 0) — in
    production the seed column would be a secret salt; here
    determinism is what makes the mechanism hash-verifiable
    cross-engine. ln rounds at 12 decimals (entropy discipline);
    everything else is exact. One map-combinable groupBy."""
    c = load(spark, sf, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    )
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp:"), F.col("source"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0) - F.lit(0.5)
    noise = -F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    return c.select(
        "source",
        "n",
        F.round(F.col("n").cast("double") + noise, 12).alias("noisy_n"),
    )




@query(
    "curation_span_corruption",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id, t[CAST(gs.pos AS INT)] AS w,
             CAST(gs.pos AS BIGINT) AS pos,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                        || CAST(gs.pos AS VARCHAR) || ':mask'), 1, 8))
                  AS BIGINT) % 100 < 15 AS masked
      FROM d, unnest(range(1, len(t) + 1)) AS gs(pos)
    ),
    runs AS (
      SELECT doc_id, w, pos,
             pos - row_number() OVER (PARTITION BY doc_id, masked
                                      ORDER BY pos) AS grp
      FROM toks WHERE masked
    ),
    spans AS (
      SELECT doc_id, grp, min(pos) AS span_start,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY min(pos)) - 1 AS BIGINT) AS k
      FROM runs GROUP BY doc_id, grp
    ),
    pieces AS (
      SELECT t.doc_id, t.pos,
             CASE WHEN NOT t.masked THEN t.w
                  WHEN t.pos = s.span_start
                    THEN '<extra_id_' || CAST(s.k AS VARCHAR) || '>'
                  ELSE NULL END AS piece,
             CASE WHEN t.masked THEN
               CASE WHEN t.pos = s.span_start
                 THEN '<extra_id_' || CAST(s.k AS VARCHAR) || '> ' || t.w
                 ELSE t.w END
             ELSE NULL END AS tgt
      FROM toks t
      LEFT JOIN runs r ON r.doc_id = t.doc_id AND r.pos = t.pos
      LEFT JOIN spans s ON s.doc_id = r.doc_id AND s.grp = r.grp
    )
    SELECT doc_id,
           CAST(count(tgt) AS BIGINT) AS n_masked,
           COALESCE(string_agg(piece, ' ' ORDER BY pos), '') AS corrupted,
           COALESCE(string_agg(tgt, ' ' ORDER BY pos), '') AS target
    FROM pieces GROUP BY doc_id
    """,
)
def curation_span_corruption(spark: SparkSession, sf: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020): ~15% of token
    positions mask deterministically (md5 device per (doc, pos));
    consecutive masked runs collapse to one ``<extra_id_k>`` sentinel
    in the corrupted input, and the target lists each sentinel with
    its hidden tokens — the (input, target) pair a denoising LM
    pretrains on. Implementation (and the one-corpus-shuffle scale
    story) lives in functions/curation.span_corrupt, shared with the
    stress battery."""
    from ..functions.curation import span_corrupt
    from ..util import spread

    return span_corrupt(spread(load(spark, sf, "documents")))




@query(
    "curation_leakage_safe_split",
    oracle=f"""
    WITH {_COMPONENTS_CTE},
    keyed AS (
      SELECT d.doc_id, COALESCE(r.comp, d.doc_id) AS cluster_key
      FROM documents d LEFT JOIN rec r ON r.node = d.doc_id
    )
    SELECT doc_id, cluster_key,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, cluster_key,
                 CAST(CAST(concat('0x', substr(md5(concat('split1',
                      CAST(cluster_key AS VARCHAR))), 1, 4)) AS BIGINT)
                      % 100 AS INT) AS b
          FROM keyed)
    """,
)
def curation_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val/test split WITHOUT near-dup leakage: hash the CLUSTER
    representative (connected component of jaccard>=0.8 pairs), not the
    doc id, so every member of a near-dup cluster lands on the same
    side — the eval-contamination failure mode of naive per-doc splits.
    One extra join over curation_split; the component labels come from
    the same label-propagation used by dedup_canonical_docs."""
    from ..functions.curation import train_val_test_split

    d = load(spark, sf, "documents")
    pairs = dd.ngram_jaccard_pairs(d, n=3, threshold=0.8)
    comps = dd.connected_components(pairs)
    keyed = d.select("doc_id").join(
        comps.select(F.col("node").alias("doc_id"), "component"),
        on="doc_id",
        how="left",
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_key"),
    )
    return train_val_test_split(keyed, "cluster_key").select(
        "doc_id", "cluster_key", "split"
    )




@query(
    "curation_dsir_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    uni AS (SELECT doc_id, unnest(t) AS feat FROM toks),
    big AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS feat
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) g
      WHERE len(t) >= 2
    ),
    feats AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
    fb AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(feat), 1, 4)) AS BIGINT)
                  % 256 AS BIGINT) AS b
      FROM feats
    ),
    tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    cp AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n
      FROM fb JOIN tgt USING (doc_id) GROUP BY b
    ),
    cq AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM fb GROUP BY b),
    tp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fb JOIN tgt USING (doc_id)),
    tq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fb),
    scored AS (
      SELECT fb.doc_id,
             ln(((COALESCE(cp.n, 0) + 0.5) * (tq.n + 0.5 * 256)) /
                ((cq.n + 0.5) * (tp.n + 0.5 * 256))) AS lp
      FROM fb LEFT JOIN cp USING (b) JOIN cq USING (b), tp, tq
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           round(list_reduce(list_sort(list(lp)), (x, y) -> x + y)
                 / count(*), 9) AS dsir_logratio
    FROM scored GROUP BY doc_id
    """,
)
def curation_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram features are —
    mean log p_target(feat)/p_raw(feat) over the doc's unigrams +
    bigrams, features hashed into 256 md5 buckets (md5 so the SQL twin
    reproduces the bucketing bit-for-bit; a deployment would swap in
    xxhash64). Target here = the English slice of the corpus.

    Scale shape: ONE pass over the feature explode fits the whole
    model — the target membership is a flag carried on each feature
    row (no semi-join against a target id list), so np/nq are a single
    map-side-combinable groupBy and the tp/tq totals are whole-frame
    window sums over the fitted 256-row model (never a second corpus
    scan; the naive cp/cq/tp/tq-as-separate-aggregates formulation
    re-reads the corpus 6×). Scoring broadcasts the 256-row model back
    over the same explode — 2 corpus passes total, no join by feature
    string anywhere. Float discipline: the ln argument is one division
    of exactly-representable products (counts ≤ 2⁵³ stay exact with
    the +0.5/+128 smoothing terms), ln differs ≤1 ulp across engines,
    so terms fold smallest-first and the mean rounds to 9 decimals
    (same rationale as text_bigram_lm_score)."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("_tgt"),
        tx.tokens("text").alias("_t"),
    )
    sz = F.size("_t")
    uni = toks.select("doc_id", "_tgt", F.explode("_t").alias("feat"))
    big = (
        toks.filter(sz >= 2)
        .select(
            "doc_id",
            "_tgt",
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, sz - 1), F.slice("_t", 2, sz - 1)
                )
            ).alias("_p"),
        )
        .select(
            "doc_id",
            "_tgt",
            F.concat_ws(" ", F.col("_p.0"), F.col("_p.1")).alias("feat"),
        )
    )
    feats = uni.unionByName(big)
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 4), 16, 10)
        .cast("long")
        % 256
    )
    fb = feats.select("doc_id", "_tgt", bucket.alias("b"))
    fitted = fb.groupBy("b").agg(
        F.count(F.lit(1)).alias("nq"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("np"),
    )
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    model = fitted.withColumn("tq", F.sum("nq").over(wall)).withColumn(
        "tp", F.sum("np").over(wall)
    )
    lp = F.log(
        ((F.col("np") + F.lit(0.5)) * (F.col("tq") + F.lit(0.5) * 256))
        / ((F.col("nq") + F.lit(0.5)) * (F.col("tp") + F.lit(0.5) * 256))
    )
    scored = fb.join(F.broadcast(model.select("b", lp.alias("_lp"))), on="b")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("_lp")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)),
            9,
        ).alias("dsir_logratio"),
    )




@query(
    "curation_epoch_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR))
               AS k
      FROM documents d
      CROSS JOIN (SELECT unnest(range(0, 3)) AS epoch) e
    ),
    sharded AS (
      SELECT epoch, doc_id, k,
             CAST(ascii(substr(k, 1, 1)) % 8 AS INT) AS shard
      FROM keyed
    )
    SELECT CAST(epoch AS INT) AS epoch, shard,
           CAST(row_number() OVER (PARTITION BY epoch, shard
                                   ORDER BY k, doc_id) AS BIGINT) AS pos,
           doc_id
    FROM sharded
    """,
)
def curation_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-epoch training shuffle: every epoch gets an
    independent pseudo-random document order, derived from content
    (md5 of doc_id:epoch) so it is reproducible across runs, cluster
    layouts, and engines — no RNG state, no global sort. Order lives
    WITHIN shards (epoch, shard, pos): shards are the data-loader's
    parallel read unit, so the only windows are per-(epoch, shard) —
    a global row_number would serialize the corpus through one
    partition at 100 TB, exactly the trap this shape avoids."""
    d = load(spark, sf, "documents").select("doc_id")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.col("epoch").cast("string"))
        ).alias("k"),
    )
    sharded = keyed.withColumn(
        "shard", (F.ascii(F.substring("k", 1, 1)) % 8).cast("int")
    )
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("k").asc(), F.col("doc_id").asc()
    )
    return sharded.select(
        "epoch",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "doc_id",
    )




@query(
    "curation_shard_manifest",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS r
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_chars, r,
             sum(n_chars) OVER (ORDER BY r, doc_id) AS cum
      FROM d
    ),
    s AS (
      SELECT doc_id, n_chars, r,
             (cum - n_chars) // 50000 AS out_shard
      FROM c
    )
    SELECT CAST(out_shard AS BIGINT) AS out_shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_tokens,
           arg_min(doc_id, r) AS first_id,
           arg_max(doc_id, r) AS last_id
    FROM s GROUP BY out_shard
    """,
)
def curation_shard_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic OUTPUT-SHARD manifest for a packed training run:
    docs line up in md5 hash order, shard k owns token positions
    [k·50000, (k+1)·50000) by each doc's starting offset — boundaries
    never split a doc, every engine and partitioning reproduces the
    same layout, and the per-shard (n_docs, n_tokens, first, last)
    rows are what a resumable writer fences uploads with. The global
    prefix sum is the sharded two-phase device (per-range windows +
    bounded offset table) from curation.token_budget_sample — no
    corpus-wide ordered window; the oracle replays with one (its
    scale, not ours)."""
    from ..functions import curation as cu

    docs = load(spark, sf, "documents").select("doc_id", "n_chars")
    return cu.shard_manifest(
        docs, 50_000, id_col="doc_id", weight_col="n_chars"
    )




@query(
    "curation_temperature_weights",
    oracle="""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs AS DOUBLE)) AS wt
      FROM s
    ),
    z AS (
      SELECT list_reduce(list_sort(list(wt)), (x, y) -> x + y) AS tot,
             CAST(sum(n_docs) AS BIGINT) AS n_total
      FROM w
    )
    SELECT w.source, w.n_docs,
           round(w.wt / z.tot, 12) AS sample_prob,
           round(w.wt / z.tot * z.n_total, 12) AS expected_docs
    FROM w CROSS JOIN z
    """,
)
def curation_temperature_weights(spark: SparkSession, sf: str) -> DataFrame:
    """TEMPERATURE-SCALED mixture weights at T = 2 (the mT5/Pile
    upsampling rule p_s ∝ n_s^(1/T)): small sources gain share,
    giants lose it, and the exponent 1/2 is exactly sqrt — an IEEE
    correctly-rounded op, so no pow() cross-engine drift. The
    normalizer folds smallest-first over the 20-row source table and
    both outputs round to 12 (the ln/sqrt discipline). One groupBy
    over the corpus; everything after is dim-sized."""
    d = load(spark, sf, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = s.select(
        "source",
        "n_docs",
        F.sqrt(F.col("n_docs").cast("double")).alias("wt"),
    )
    z = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list("wt")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("tot"),
        F.sum("n_docs").alias("n_total"),
    )
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(F.col("wt") / F.col("tot"), 12).alias("sample_prob"),
        F.round(
            F.col("wt") / F.col("tot") * F.col("n_total"), 12
        ).alias("expected_docs"),
    )




@query(
    "curation_class_balance_downsample",
    oracle="""
    WITH tgt AS (
      SELECT min(cnt) AS target FROM (
        SELECT count(*) AS cnt FROM embeddings GROUP BY label
      )
    ),
    ranked AS (
      SELECT vec_id, label,
             row_number() OVER (PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(vec_id) AS BIGINT) AS kept_id_sum
    FROM ranked CROSS JOIN tgt
    WHERE rn <= tgt.target
    GROUP BY label
    """,
)
def curation_class_balance_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """CLASS-BALANCED DOWNSAMPLING — cap every label at the minority
    class size, keeping each label's first-k in deterministic md5
    hash order (so the kept set is reproducible across engines,
    partitionings, and reruns — the content-hash sampling discipline
    of curation_sample). Per-label windows shuffle once on label;
    the target is a one-row broadcast. Emits the per-label census +
    an id-sum checksum so the driver hash pins WHICH rows were kept,
    not just how many."""
    emb = load(spark, sf, "embeddings").select("vec_id", "label")
    tgt = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("target"))
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = emb.select(
        "vec_id", "label", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.crossJoin(F.broadcast(tgt))
        .filter(F.col("rn") <= F.col("target"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("vec_id").alias("kept_id_sum"),
        )
    )




@query("curation_coreset_kcenter", oracle=_kcenter_oracle(8))
def curation_coreset_kcenter(spark: SparkSession, sf: str) -> DataFrame:
    """CORESET selection by k-CENTER farthest-first traversal (Gonzalez
    1985, the 2-approximation): start at the smallest vec_id, then 7×
    pick the point FARTHEST from the chosen set — the diversity-
    maximizing subset used to seed curriculum/dedup-aware sampling.
    d² on the ×256 integer grid keeps every distance and argmax
    EXACT; ties break to the smaller id. Each round is one broadcast
    of the single new center + one linear min-fold over the corpus
    and one TakeOrdered(1) — no driver collect of vectors, no
    all-pairs; k bounds the loop.

    r15 restructure: the running min-d² table is a LINEAGE CHAIN of
    ``least`` folds over the ONE pinned codes table instead of a
    localCheckpoint per round — round i recomputes i cheap folds from
    in-memory blocks, which beats materializing 7 intermediate copies
    of the (vec_id, qv, nn, d) table (A/B at sf0.1: 2.34 s vs 2.90 s
    steady shared-session; cold JVM 3.38 vs 6.72). k = 8 bounds the
    re-derivation at 28 block re-reads; for k ≫ 8 re-introduce a
    checkpoint every few rounds. The VERDICT_r14-suggested Arrow
    kernel for the fold was built, measured SLOWER fresh-JVM (3.5-3.8
    vs 2.0-2.2 baseline: 8 sequential Python stages pay worker
    fan-out/spawn each round, while the fold is only 2 000×64 ints
    per round locally), and rejected on that evidence — at this SF
    the query is round-orchestration bound, not fold bound (see
    OPTIMIZATION_r15.md §3)."""
    emb = load(spark, sf, "embeddings")
    qz = F.expr(
        "transform(embedding,"
        " v -> cast(round(cast(v as double) * 256) as bigint))"
    )
    codes = emb.select("vec_id", qz.alias("qv")).select(
        "vec_id",
        "qv",
        F.expr(
            "aggregate(zip_with(qv, qv, (p, r) -> p * r),"
            " cast(0 as bigint), (a, p) -> a + p)"
        ).alias("nn"),
    )
    codes = codes.localCheckpoint(eager=False)  # consumed every round
    first = codes.orderBy(F.col("vec_id").asc()).limit(1)
    d2_new = (
        F.col("nn")
        + F.col("cnn")
        - 2
        * F.expr(
            "aggregate(zip_with(qv, cqv, (p, r) -> p * r),"
            " cast(0 as bigint), (a, p) -> a + p)"
        )
    )
    dists = codes.crossJoin(
        F.broadcast(
            first.select(
                F.col("qv").alias("cqv"), F.col("nn").alias("cnn")
            )
        )
    ).select("vec_id", "qv", "nn", d2_new.alias("d"))
    picks = [
        first.select(
            F.lit(1).cast("long").alias("sel_order"),
            "vec_id",
            F.lit(0).cast("long").alias("d2_when_picked"),
        )
    ]
    for i in range(2, 9):
        top = dists.orderBy(
            F.col("d").desc(), F.col("vec_id").asc()
        ).limit(1)
        top = top.localCheckpoint(eager=False)  # pick + dist update
        picks.append(
            top.select(
                F.lit(i).cast("long").alias("sel_order"),
                "vec_id",
                F.col("d").alias("d2_when_picked"),
            )
        )
        dists = dists.crossJoin(
            F.broadcast(
                top.select(
                    F.col("qv").alias("cqv"), F.col("nn").alias("cnn")
                )
            )
        ).select(
            "vec_id",
            "qv",
            "nn",
            F.least(F.col("d"), d2_new).alias("d"),
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out




@query(
    "curation_stratified_quota",
    oracle="""
    WITH strata AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_stratum
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(sum(n_stratum) AS BIGINT) AS n FROM strata),
    alloc AS (
      SELECT s.source, s.lang, s.n_stratum,
             CAST(500 * s.n_stratum // t.n AS BIGINT) AS base_q,
             CAST(500 * s.n_stratum % t.n AS BIGINT) AS rem
      FROM strata s CROSS JOIN tot t
    ),
    leftover AS (
      SELECT CAST(500 - sum(base_q) AS BIGINT) AS l FROM alloc
    ),
    ranked AS (
      SELECT a.*,
             row_number() OVER (ORDER BY a.rem DESC, a.source, a.lang)
               AS rk,
             l.l
      FROM alloc a CROSS JOIN leftover l
    ),
    quota AS (
      SELECT source, lang, n_stratum,
             CAST(base_q + CASE WHEN rk <= l THEN 1 ELSE 0 END AS BIGINT)
               AS quota
      FROM ranked
    ),
    kept AS (
      SELECT d.source, d.lang, d.doc_id
      FROM (SELECT source, lang, doc_id,
                   row_number() OVER (
                     PARTITION BY source, lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents) d
      JOIN quota q ON q.source = d.source AND q.lang = d.lang
      WHERE d.rn <= q.quota
    )
    SELECT q.source, q.lang, q.n_stratum, q.quota,
           CAST(coalesce(sum(k.doc_id), 0) AS BIGINT) AS kept_id_sum
    FROM quota q
    LEFT JOIN kept k ON k.source = q.source AND k.lang = q.lang
    GROUP BY q.source, q.lang, q.n_stratum, q.quota
    """,
)
def curation_stratified_quota(spark: SparkSession, sf: str) -> DataFrame:
    """PROPORTIONAL STRATIFIED SAMPLING with exact largest-remainder
    (Hamilton) allocation: a 500-doc budget split across
    (source, lang) strata so that Σquota = 500 EXACTLY — base
    quota = ⌊B·n_s/N⌋ (integer division), the ⌈⌉ leftovers go to the
    largest remainders (source/lang tiebreak). Each stratum then
    keeps its first-quota docs in md5 hash order (the content-hash
    determinism discipline), pinned by an id-sum checksum so the
    driver hash fixes WHICH rows were kept. Everything is integer
    arithmetic; the strata table is tiny (sources × langs), so its
    ranking window is O(strata), and the per-stratum keep is one
    window keyed on the stratum."""
    d = load(spark, sf, "documents").select("doc_id", "source", "lang")
    strata = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_stratum")
    )
    tot = strata.agg(F.sum("n_stratum").alias("n"))
    alloc = strata.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_stratum",
        F.expr("500 * n_stratum div n").alias("base_q"),
        (F.lit(500) * F.col("n_stratum") % F.col("n")).alias("rem"),
    )
    leftover = alloc.agg((500 - F.sum("base_q")).alias("l"))
    wrk = Window.orderBy(F.col("rem").desc(), "source", "lang")
    quota = (
        alloc.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(wrk))  # O(strata) rows
        .select(
            "source",
            "lang",
            "n_stratum",
            (
                F.col("base_q")
                + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
    wk = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    kept = (
        d.withColumn("rn", F.row_number().over(wk))
        .join(quota, on=["source", "lang"])
        .filter(F.col("rn") <= F.col("quota"))
        .groupBy("source", "lang")
        .agg(F.sum("doc_id").alias("kept_id_sum"))
    )
    return (
        quota.join(kept, on=["source", "lang"], how="left")
        .select(
            "source",
            "lang",
            "n_stratum",
            "quota",
            F.coalesce("kept_id_sum", F.lit(0))
            .cast("long")
            .alias("kept_id_sum"),
        )
    )




@query(
    "curation_dup_rate_by_source",
    oracle="""
    WITH h AS (
      SELECT source, md5(text) AS th FROM documents
    ),
    per AS (
      SELECT source, th, CAST(count(*) AS BIGINT) AS n
      FROM h GROUP BY source, th
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(n) - count(*) AS BIGINT) AS n_redundant,
           round(CAST(sum(n) - count(*) AS DOUBLE) / sum(n), 12)
             AS dup_share
    FROM per GROUP BY source
    """,
)
def curation_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT-DUPLICATE RATE per source — the per-provider scorecard a
    data-acquisition review reads before renewing a crawl contract
    (a source shipping 40% redundant bytes is priced accordingly).
    Content identity = md5(text); redundancy = docs − distinct
    within the source. One content-hash groupBy + one source
    rollup — both map-combinable; the share is one division, round
    12. The within-source variant of dedup_exact's corpus census."""
    d = load(spark, sf, "documents")
    per = d.groupBy(
        "source", F.md5(F.col("text").cast("binary")).alias("th")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_redundant"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n"),
            12,
        ).alias("dup_share"),
    )




@query(
    "curation_mixing_anneal",
    oracle="""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    epochs AS (SELECT CAST(range AS BIGINT) AS epoch FROM range(0, 5)),
    p AS (
      SELECT e.epoch, s.source, s.n_docs,
             pow(CAST(s.n_docs AS DOUBLE), 1.0 - 0.125 * e.epoch) AS w
      FROM s CROSS JOIN epochs e
    ),
    z AS (
      SELECT epoch,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(w))), (a, v) -> a + v) AS zsum
      FROM p GROUP BY epoch
    )
    SELECT p.epoch, p.source, p.n_docs,
           round(p.w / z.zsum, 12) AS mix_weight
    FROM p JOIN z USING (epoch)
    """,
)
def curation_mixing_anneal(spark: SparkSession, sf: str) -> DataFrame:
    """ANNEALED DATA-MIXING schedule: per training epoch e∈0..4 the
    per-source sampling weight w_s ∝ n_s^α(e) with α annealing
    1 → 0.5 — the standard "start proportional, end square-root
    rebalanced" curriculum that keeps big sources from drowning the
    mix late in training. Counts are exact; the pow/normalize chain
    is mirrored doubles with the per-epoch normalizer folded
    smallest-first (sorted-fold), round 12. The source table is tiny
    — the one corpus-sized cost is the count scan."""
    d = load(spark, sf, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    epochs = spark.range(5).select(F.col("id").alias("epoch"))
    p = src.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "source",
        "n_docs",
        F.pow(
            F.col("n_docs").cast("double"),
            1.0 - 0.125 * F.col("epoch"),
        ).alias("w"),
    )
    z = p.groupBy("epoch").agg(
        F.aggregate(
            F.array_sort(F.collect_list("w")),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("zsum")
    )
    return p.join(F.broadcast(z), on="epoch").select(
        "epoch",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("w") / F.col("zsum"), 12).alias("mix_weight"),
    )




@query(
    "curation_pii_scrub_census",
    oracle="""
    WITH seeded AS (
      SELECT doc_id, source,
             CASE
               WHEN doc_id % 7 = 0 THEN
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com now'
               WHEN doc_id % 11 = 0 THEN
                 text || ' call 555-' || CAST(1000 + doc_id % 9000
                                              AS VARCHAR) || ' today'
               ELSE text
             END AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, source,
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
               '555-[0-9]{4}', '<PHONE>', 'g') AS clean,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS n_emails,
             len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones
      FROM seeded
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_with_pii,
           CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
           CAST(sum(n_phones) AS BIGINT) AS phones_redacted,
           CAST(sum(CASE WHEN contains(clean, '@') THEN 1 ELSE 0 END)
             AS BIGINT) AS residual_at_signs,
           CAST(sum(len(md5(clean))) AS BIGINT) AS clean_md5_len_sum
    FROM scrubbed GROUP BY source
    """,
)
def curation_pii_scrub_census(spark: SparkSession, sf: str) -> DataFrame:
    """PII SCRUB + census — the redaction pass every training-data
    pipeline legally needs: emails and (seeded) phone patterns are
    replaced by tags, and the per-source report counts documents
    touched, redactions by kind, and RESIDUALS (any '@' left after
    scrubbing is a pattern-escape bug — must be 0). The fixture
    injects deterministic PII (doc_id-derived addresses on id%7,
    phone stubs on id%11) so both engines see identical positives;
    the md5-length checksum of the scrubbed text pins that the
    replacement text itself matches byte-for-byte. Pure JVM regex
    column expressions (backreference-free by the cross-engine
    rule), one scan, one aggregate."""
    d = load(spark, sf, "documents").select("doc_id", "source", "text")
    seeded = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                (1000 + F.col("doc_id") % 9000).cast("string"),
                F.lit(" today"),
            ),
        )
        .otherwise(F.col("text")),
    )
    email_re = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    phone_re = "555-[0-9]{4}"
    scrubbed = seeded.select(
        "source",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("clean"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{email_re}', 0)")
        ).alias("n_emails"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{phone_re}', 0)")
        ).alias("n_phones"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_emails") + F.col("n_phones") > 0, 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("docs_with_pii"),
        F.sum("n_emails").cast("long").alias("emails_redacted"),
        F.sum("n_phones").cast("long").alias("phones_redacted"),
        F.sum(
            F.when(F.col("clean").contains("@"), 1).otherwise(0)
        )
        .cast("long")
        .alias("residual_at_signs"),
        F.sum(F.length(F.md5(F.col("clean").cast("binary"))))
        .cast("long")
        .alias("clean_md5_len_sum"),
    )




@query(
    "curation_funnel_report",
    oracle="""
    WITH s0 AS (SELECT doc_id, text, n_chars FROM documents),
    s1 AS (SELECT * FROM s0 WHERE n_chars >= 100),
    s2 AS (
      SELECT * FROM s1
      WHERE len(list_filter(string_split_regex(trim(text), '\\s+'),
                t -> t IN ('the','a','an','of','and','to','in','is',
                           'it','that'))) >= 1
    ),
    s3 AS (
      SELECT min(doc_id) AS doc_id
      FROM s2 GROUP BY md5(text)
    ),
    counts AS (
      SELECT 0 AS stage, 'raw' AS name,
             (SELECT CAST(count(*) AS BIGINT) FROM s0) AS docs
      UNION ALL
      SELECT 1, 'length_gate',
             (SELECT CAST(count(*) AS BIGINT) FROM s1)
      UNION ALL
      SELECT 2, 'stopword_gate',
             (SELECT CAST(count(*) AS BIGINT) FROM s2)
      UNION ALL
      SELECT 3, 'exact_dedup',
             (SELECT CAST(count(*) AS BIGINT) FROM s3)
    )
    SELECT CAST(stage AS BIGINT) AS stage, name, docs,
           CAST(docs - lead(docs) OVER (ORDER BY stage) AS BIGINT)
             AS removed_next,
           round(CAST(docs AS DOUBLE)
                 / first_value(docs) OVER (ORDER BY stage), 12)
             AS survival_rate
    FROM counts
    """,
)
def curation_funnel_report(spark: SparkSession, sf: str) -> DataFrame:
    """CURATION FUNNEL report — the one-page artifact a data run
    ships: raw → length gate (n_chars ≥ 100) → stopword gate (≥ 1
    English function word) → exact dedup (min-id canonical), with
    per-stage survivors, removals, and survival rate. Each stage is
    the REAL operator the catalog exposes individually (quality
    gates, content-hash dedup); this query composes them and pins
    the composition end-to-end. All counts exact; the 4-row funnel
    window is constant-sized."""
    from ..functions.text import STOPWORDS, stopword_hits, tokens

    d = load(spark, sf, "documents").select("doc_id", "text", "n_chars")
    d = d.localCheckpoint(eager=False)  # 3 stage counts share the scan
    s1 = d.filter(F.col("n_chars") >= 100)
    s2 = s1.filter(stopword_hits(tokens("text"), STOPWORDS["en"]) >= 1)
    s3 = s2.groupBy(F.md5(F.col("text").cast("binary"))).agg(
        F.min("doc_id").alias("doc_id")
    )
    rows = [
        (0, "raw", d),
        (1, "length_gate", s1),
        (2, "stopword_gate", s2),
        (3, "exact_dedup", s3),
    ]
    counts = None
    for stage, name, df in rows:
        c = df.agg(F.count(F.lit(1)).alias("docs")).select(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(name).alias("name"),
            F.col("docs").cast("long").alias("docs"),
        )
        counts = c if counts is None else counts.unionByName(c)
    wlead = Window.orderBy("stage")  # 4 rows — constant-sized window
    return counts.select(
        "stage",
        "name",
        "docs",
        (F.col("docs") - F.lead("docs").over(wlead))
        .cast("long")
        .alias("removed_next"),
        F.round(
            F.col("docs").cast("double")
            / F.first("docs").over(
                wlead.rowsBetween(Window.unboundedPreceding, 0)
            ),
            12,
        ).alias("survival_rate"),
    )




@query(
    "curation_pack_straddle_audit",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - n_tokens AS tokens_before
      FROM t
    ), placed AS (
      SELECT doc_id, n_tokens,
             tokens_before // 2048 AS pack_id,
             tokens_before % 2048 AS pack_offset
      FROM c
    )
    SELECT pack_id,
           CAST(count(*) AS BIGINT) AS n_docs_starting,
           CAST(sum(CASE WHEN pack_offset + n_tokens > 2048
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
           CAST(sum(CASE WHEN pack_offset + n_tokens > 2048
                         THEN pack_offset + n_tokens - 2048
                         ELSE 0 END) AS BIGINT) AS straddle_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_starting
    FROM placed GROUP BY pack_id
    """,
)
def curation_pack_straddle_audit(spark: SparkSession, sf: str) -> DataFrame:
    """PACK-BOUNDARY STRADDLE audit for concat-then-chunk packing
    (curation_pack_sequences' layout): per 2048-token pack, how many
    documents start in it, how many run past its boundary, and how
    much token mass crosses — exactly the contamination a cross-
    document attention mask (or boundary-resetting position ids) must
    handle, and the quantity that decides whether best-fit packing is
    worth its shuffle. Same exact prefix-sum math as the packer, and
    (round 13) the same DISTRIBUTED device: ranked_prefix_sum's
    range-sharded two-pass cumsum replaces the corpus-grain global
    window, then one extra map-combinable groupBy."""
    from ..functions.ranks import ranked_prefix_sum

    d = load(spark, sf, "documents")
    t = d.select(
        "doc_id", tx.token_count("text").cast("long").alias("n_tokens")
    )
    placed = ranked_prefix_sum(
        t, ["doc_id"], "n_tokens", out_col="_ps"
    ).withColumn(
        "tokens_before", F.col("_ps") - F.col("n_tokens")
    ).select(
        "n_tokens",
        F.expr("tokens_before div 2048").alias("pack_id"),
        (F.col("tokens_before") % 2048).alias("pack_offset"),
    )
    over = F.col("pack_offset") + F.col("n_tokens") - 2048
    return placed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_starting"),
        F.sum(F.when(over > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_straddling"),
        F.sum(F.when(over > 0, over).otherwise(0))
        .cast("long")
        .alias("straddle_tokens"),
        F.sum("n_tokens").cast("long").alias("tokens_starting"),
    )




@query(
    "curation_dedup_quality_confusion",
    oracle="""
    WITH flagged AS (
      SELECT doc_id, n_chars >= 300 AS high_quality,
             count(*) OVER (PARTITION BY text) > 1 AS is_dup
      FROM documents
    ),
    cells AS (
      SELECT high_quality, is_dup, CAST(count(*) AS BIGINT) AS n_docs
      FROM flagged GROUP BY high_quality, is_dup
    ),
    tot AS (
      SELECT CAST(coalesce(sum(CASE WHEN high_quality AND is_dup
                                    THEN n_docs END), 0) AS BIGINT) AS a,
             CAST(coalesce(sum(CASE WHEN high_quality AND NOT is_dup
                                    THEN n_docs END), 0) AS BIGINT) AS b,
             CAST(coalesce(sum(CASE WHEN NOT high_quality AND is_dup
                                    THEN n_docs END), 0) AS BIGINT) AS c,
             CAST(coalesce(sum(CASE WHEN NOT high_quality AND NOT is_dup
                                    THEN n_docs END), 0) AS BIGINT) AS d
      FROM cells
    )
    SELECT a AS hi_dup, b AS hi_unique, c AS lo_dup, d AS lo_unique,
           round(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))),
                 9) AS log_odds_ratio
    FROM tot
    """,
)
def curation_dedup_quality_confusion(
    spark: SparkSession, sf: str
) -> DataFrame:
    """DEDUP × QUALITY confusion — does deduplication disproportionately
    remove GOOD documents? The 2×2 census of (high-quality: n_chars ≥
    300) × (exact-dup member) with the Haldane–Anscombe (+0.5) log
    odds ratio: strongly negative = duplication concentrates in the
    low-quality tail (safe to dedup hard), positive = the dedup pass
    is eating curated content (the classic template-site trap). The
    dup flag is one window over the text hash partition; cells are a
    4-cell census; ln of the corrected ratio is the only float
    (round 9)."""
    d = load(spark, sf, "documents")
    flagged = d.select(
        (F.col("n_chars") >= 300).alias("high_quality"),
        (
            F.count(F.lit(1)).over(Window.partitionBy("text")) > 1
        ).alias("is_dup"),
    )
    cells = flagged.groupBy("high_quality", "is_dup").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = cells.agg(
        *[
            F.coalesce(
                F.sum(F.when(cond, F.col("n_docs"))), F.lit(0)
            )
            .cast("long")
            .alias(name)
            for name, cond in [
                ("a", F.col("high_quality") & F.col("is_dup")),
                ("b", F.col("high_quality") & ~F.col("is_dup")),
                ("c", ~F.col("high_quality") & F.col("is_dup")),
                ("d", ~F.col("high_quality") & ~F.col("is_dup")),
            ]
        ]
    )
    lor = F.log(
        ((F.col("a") + 0.5) * (F.col("d") + 0.5))
        / ((F.col("b") + 0.5) * (F.col("c") + 0.5))
    )
    return tot.select(
        F.col("a").alias("hi_dup"),
        F.col("b").alias("hi_unique"),
        F.col("c").alias("lo_dup"),
        F.col("d").alias("lo_unique"),
        F.round(lor, 9).alias("log_odds_ratio"),
    )




@query(
    "curation_soft_dedup_weights",
    oracle="""
    WITH sized AS (
      SELECT doc_id, source,
             CAST(count(*) OVER (PARTITION BY text) AS BIGINT)
               AS cluster_size
      FROM documents
    ),
    weighted AS (
      SELECT doc_id, source, cluster_size,
             CAST(1000 // cluster_size AS BIGINT) AS weight_milli
      FROM sized
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup_members,
           CAST(sum(weight_milli) AS BIGINT) AS effective_milli,
           CAST(min(CASE WHEN cluster_size > 1 THEN doc_id END)
             AS BIGINT) AS sample_dup_doc
    FROM weighted GROUP BY source
    """,
)
def curation_soft_dedup_weights(spark: SparkSession, sf: str) -> DataFrame:
    """SOFT DEDUPLICATION weights — instead of dropping duplicates,
    downweight each copy by 1/cluster_size (the per-example loss
    weight or sampling probability that keeps one effective copy of
    every text while preserving corpus shape; the gentler alternative
    to keep-one dedup when duplication correlates with quality).
    Weights are integer milli-units (1000 DIV c, exact), summed per
    source into the EFFECTIVE corpus size a token-budget planner
    consumes. One window over the text-hash partition + one
    groupBy."""
    d = load(spark, sf, "documents")
    sized = d.select(
        "doc_id",
        "source",
        F.count(F.lit(1))
        .over(Window.partitionBy("text"))
        .cast("long")
        .alias("cluster_size"),
    )
    weighted = sized.select(
        "doc_id",
        "source",
        "cluster_size",
        F.expr("1000 div cluster_size").cast("long").alias("weight_milli"),
    )
    return weighted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_members"),
        F.sum("weight_milli").cast("long").alias("effective_milli"),
        F.min(
            F.when(F.col("cluster_size") > 1, F.col("doc_id"))
        )
        .cast("long")
        .alias("sample_dup_doc"),
    )




@query(
    "curation_sample_size_planner",
    oracle="""
    WITH flagged AS (
      SELECT source,
             count(*) OVER (PARTITION BY text) > 1 AS is_dup
      FROM documents
    ),
    per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dups
      FROM flagged GROUP BY source
    )
    SELECT source, n_docs, n_dups,
           CAST(n_dups * 1000 // n_docs AS BIGINT) AS dup_milli,
           CAST(ceil(9604.0 * (CAST(n_dups AS DOUBLE) / n_docs)
                     * (1.0 - CAST(n_dups AS DOUBLE) / n_docs))
             AS BIGINT) AS n_required,
           n_docs >= CAST(ceil(9604.0 * (CAST(n_dups AS DOUBLE) / n_docs)
                               * (1.0 - CAST(n_dups AS DOUBLE) / n_docs))
                       AS BIGINT) AS sample_sufficient
    FROM per
    """,
)
def curation_sample_size_planner(
    spark: SparkSession, sf: str
) -> DataFrame:
    """SAMPLE-SIZE PLANNER for per-source QA audits: given each
    source's observed dup rate p, the sample size needed to estimate
    it within ±2% at 95% confidence — n = z²p(1−p)/w² with z²=3.8416,
    w=0.02 (constants documented; the planner shape, not the
    constants, is the op) — and whether the source's own volume
    already suffices. p is one exact division; n_required is a
    mirrored ceil. The audit-budgeting step every human-review loop
    runs before sampling."""
    d = load(spark, sf, "documents")
    flagged = d.select(
        "source",
        (
            F.count(F.lit(1)).over(Window.partitionBy("text")) > 1
        ).alias("is_dup"),
    )
    per = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_dups"),
    )
    p = F.col("n_dups").cast("double") / F.col("n_docs")
    n_req = F.ceil(F.lit(9604.0) * p * (F.lit(1.0) - p)).cast("long")
    return per.select(
        "source",
        "n_docs",
        "n_dups",
        F.expr("n_dups * 1000 div n_docs").cast("long").alias("dup_milli"),
        n_req.alias("n_required"),
        (F.col("n_docs") >= n_req).alias("sample_sufficient"),
    )




@query(
    "curation_token_budget_audit",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_tok > 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_budget,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(least(n_tok, 64)) AS BIGINT) AS tokens_kept,
           CAST(sum(greatest(n_tok - 64, 0)) AS BIGINT) AS tokens_lost,
           round(CAST(sum(greatest(n_tok - 64, 0)) AS DOUBLE)
                 / sum(n_tok), 9) AS loss_share
    FROM d GROUP BY source
    """,
)
def curation_token_budget_audit(
    spark: SparkSession, sf: str
) -> DataFrame:
    """TOKEN-BUDGET TRUNCATION AUDIT per source — before packing
    sequences at a 64-token context budget, how much text would a
    hard truncate throw away and from where? (A source losing 30% of
    its tokens to truncation needs chunking, not clipping — this is
    the decision input for curation_pack_sequences vs
    curation_chunk_overlap.) Whitespace token counts and min/max
    clips are exact BIGINTs in one map-combinable groupBy; loss share
    is the single display double, round 9. Pure scan + aggregate,
    pushdown-friendly."""
    d = load(spark, sf, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    b = d.select("source", n_tok.alias("n_tok"))
    return b.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_tok") > 64, 1).otherwise(0))
        .cast("long")
        .alias("n_over_budget"),
        F.sum("n_tok").cast("long").alias("tokens_total"),
        F.sum(F.least(F.col("n_tok"), F.lit(64).cast("long")))
        .cast("long")
        .alias("tokens_kept"),
        F.sum(
            F.greatest(F.col("n_tok") - 64, F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("tokens_lost"),
        F.round(
            F.sum(
                F.greatest(F.col("n_tok") - 64, F.lit(0).cast("long"))
            ).cast("double")
            / F.sum("n_tok"),
            9,
        ).alias("loss_share"),
    )




@query(
    "curation_shard_balance_audit",
    oracle="""
    WITH sh AS (
      SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
               AS BIGINT) AS shard,
             length(text) AS n_bytes
      FROM documents
    ),
    per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_bytes) AS BIGINT) AS bytes
      FROM sh GROUP BY shard
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS td,
             CAST(sum(bytes) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS k,
             CAST(max(n_docs) AS BIGINT) AS mx,
             CAST(max(bytes) AS BIGINT) AS mxb
      FROM per
    )
    SELECT p.shard, p.n_docs, p.bytes,
           p.n_docs * t.k * 1000 // t.td AS doc_balance_milli,
           p.bytes * t.k * 1000 // t.tb AS byte_balance_milli,
           t.mx * t.k * 1000 // t.td AS worst_doc_balance_milli
    FROM per p, tot t
    """,
)
def curation_shard_balance_audit(
    spark: SparkSession, sf: str
) -> DataFrame:
    """SHARD BALANCE AUDIT — per md5-shard document and byte load vs
    the uniform ideal (1000 milli = perfectly balanced; the worst
    shard's ratio is THE number that bounds straggler tail latency in
    every downstream fan-out). Hash sharding is the partition
    strategy this whole engine leans on, so the audit that proves the
    shards actually balance is first-class. Integer milli ratios via
    cross-multiplied floor-div (DuckDB // ≡ Spark div on positives);
    one groupBy over the 16-shard domain."""
    d = load(spark, sf, "documents")
    shard = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("long")
    per = d.select(
        shard.alias("shard"), F.length("text").alias("n_bytes")
    ).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("bytes"),
    )
    per = per.localCheckpoint(eager=False)  # consumed twice
    tot = per.agg(
        F.sum("n_docs").alias("td"),
        F.sum("bytes").alias("tb"),
        F.count(F.lit(1)).alias("k"),
        F.max("n_docs").alias("mx"),
    )
    j = per.crossJoin(F.broadcast(tot))
    return j.select(
        "shard",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("bytes").cast("long").alias("bytes"),
        F.expr("n_docs * k * 1000 div td").cast("long").alias(
            "doc_balance_milli"
        ),
        F.expr("bytes * k * 1000 div tb").cast("long").alias(
            "byte_balance_milli"
        ),
        F.expr("mx * k * 1000 div td").cast("long").alias(
            "worst_doc_balance_milli"
        ),
    )




@query(
    "curation_dedup_savings_forecast",
    oracle="""
    WITH cl AS (
      SELECT source, md5(text) AS th,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) - 1 AS BIGINT) AS removable,
             CAST((count(*) - 1) * any_value(length(text)) AS BIGINT)
               AS bytes_removable
      FROM documents GROUP BY source, md5(text)
    )
    SELECT source,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(removable) AS BIGINT) AS dup_docs_removable,
           CAST(sum(bytes_removable) AS BIGINT) AS bytes_removable,
           round(CAST(sum(removable) AS DOUBLE) / sum(n_docs), 9)
             AS doc_savings_share
    FROM cl GROUP BY source
    """,
)
def curation_dedup_savings_forecast(
    spark: SparkSession, sf: str
) -> DataFrame:
    """DEDUP SAVINGS FORECAST per source — documents and bytes an
    exact within-source dedup would remove (keep-one-per-cluster),
    BEFORE running the dedup: the capacity-planning number that
    decides whether the dedup pass pays for itself on a given source.
    Identical texts have identical lengths, so cluster bytes are
    (size−1)·len exactly; one md5 groupBy then one source rollup, all
    exact BIGINTs, pushdown-friendly."""
    d = load(spark, sf, "documents")
    cl = d.groupBy("source", F.md5("text").alias("th")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - 1).alias("removable"),
        ((F.count(F.lit(1)) - 1) * F.max(F.length("text"))).alias(
            "bytes_removable"
        ),
    )
    return cl.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("removable").cast("long").alias("dup_docs_removable"),
        F.sum("bytes_removable").cast("long").alias("bytes_removable"),
        F.round(
            F.sum("removable").cast("double") / F.sum("n_docs"), 9
        ).alias("doc_savings_share"),
    )




@query(
    "curation_padding_waste_curve",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    budgets AS (SELECT unnest([32, 64, 128]) AS budget),
    w AS (
      SELECT b.budget, d.source, d.n_tok,
             CAST((d.n_tok + b.budget - 1) // b.budget AS BIGINT)
               AS n_seqs,
             CAST((d.n_tok + b.budget - 1) // b.budget * b.budget
                  - d.n_tok AS BIGINT) AS pad_tokens
      FROM d, budgets b
    )
    SELECT CAST(budget AS BIGINT) AS budget, source,
           CAST(sum(n_seqs) AS BIGINT) AS n_sequences,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(sum(pad_tokens) AS BIGINT) AS pad_tokens,
           round(CAST(sum(pad_tokens) AS DOUBLE)
                 / (sum(n_tok) + sum(pad_tokens)), 9) AS waste_share
    FROM w GROUP BY budget, source
    """,
)
def curation_padding_waste_curve(
    spark: SparkSession, sf: str
) -> DataFrame:
    """PADDING-WASTE CURVE — if each document is chunked to fixed
    sequences of {32, 64, 128} tokens and the tail padded, what share
    of the compute is padding, per source and budget? The chart that
    justifies sequence PACKING (curation_pack_sequences): waste at
    the chosen budget IS the training-throughput loss. Ceil-div and
    pad counts are exact integers (DuckDB `//` ≡ Spark `div` on
    positives); the budget fan-out is a 3-row broadcast."""
    d = load(spark, sf, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    docs = d.select("source", n_tok.alias("n_tok"))
    budgets = spark.createDataFrame([(32,), (64,), (128,)], "budget int")
    w = docs.crossJoin(F.broadcast(budgets)).select(
        "budget",
        "source",
        "n_tok",
        F.expr("(n_tok + budget - 1) div budget").alias("n_seqs"),
        F.expr(
            "(n_tok + budget - 1) div budget * budget - n_tok"
        ).alias("pad_tokens"),
    )
    return w.groupBy("budget", "source").agg(
        F.sum("n_seqs").cast("long").alias("n_sequences"),
        F.sum("n_tok").cast("long").alias("real_tokens"),
        F.sum("pad_tokens").cast("long").alias("pad_tokens"),
        F.round(
            F.sum("pad_tokens").cast("double")
            / (F.sum("n_tok") + F.sum("pad_tokens")),
            9,
        ).alias("waste_share"),
    ).select(
        F.col("budget").cast("long").alias("budget"),
        "source",
        "n_sequences",
        "real_tokens",
        "pad_tokens",
        "waste_share",
    )




@query(
    "curation_source_mix_entropy",
    oracle="""
    WITH cnt AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS n_bytes
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS td,
             CAST(sum(n_bytes) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS k
      FROM cnt
    ),
    terms AS (
      SELECT round((CAST(n_docs AS DOUBLE) / t.td)
                   * ln(CAST(n_docs AS DOUBLE) / t.td), 12) AS hd,
             round((CAST(n_bytes AS DOUBLE) / t.tb)
                   * ln(CAST(n_bytes AS DOUBLE) / t.tb), 12) AS hb
      FROM cnt, tot t
    )
    SELECT (SELECT k FROM tot) AS n_sources,
           round(-list_reduce(list_sort(list(hd)), (x, y) -> x + y), 9)
             AS doc_mix_entropy_nats,
           round(exp(-list_reduce(list_sort(list(hd)), (x, y) -> x + y)),
                 9) AS effective_sources_docs,
           round(-list_reduce(list_sort(list(hb)), (x, y) -> x + y), 9)
             AS byte_mix_entropy_nats,
           round(exp(-list_reduce(list_sort(list(hb)), (x, y) -> x + y)),
                 9) AS effective_sources_bytes
    FROM terms
    """,
)
def curation_source_mix_entropy(
    spark: SparkSession, sf: str
) -> DataFrame:
    """SOURCE-MIX ENTROPY — Shannon entropy of the corpus's source
    distribution (docs AND bytes) with its exp(H) 'effective source
    count': THE one-number diversity health metric a mixing-weights
    change is judged by (20 sources at effective 3.2 means the mix is
    really three sources wearing twenty hats). Counts exact BIGINTs;
    the −p·ln p terms pre-round at 12 and fold SORTED (the KL
    device), round 9. One groupBy over the source domain."""
    d = load(spark, sf, "documents")
    cnt = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_bytes"),
    )
    cnt = cnt.localCheckpoint(eager=False)  # consumed twice
    tot = cnt.agg(
        F.sum("n_docs").alias("td"),
        F.sum("n_bytes").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    j = cnt.crossJoin(F.broadcast(tot))
    pd_ = F.col("n_docs").cast("double") / F.col("td")
    pb = F.col("n_bytes").cast("double") / F.col("tb")
    terms = j.select(
        "k",
        F.round(pd_ * F.log(pd_), 12).alias("hd"),
        F.round(pb * F.log(pb), 12).alias("hb"),
    )

    def fold(col: str):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return terms.agg(
        F.max("k").alias("n_sources"),
        F.round(-fold("hd"), 9).alias("doc_mix_entropy_nats"),
        F.round(F.exp(-fold("hd")), 9).alias("effective_sources_docs"),
        F.round(-fold("hb"), 9).alias("byte_mix_entropy_nats"),
        F.round(F.exp(-fold("hb")), 9).alias("effective_sources_bytes"),
    )


__all__ = sorted(n for n in dir() if not n.startswith("__"))
