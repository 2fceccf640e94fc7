"""Catalog family: text analysis, tokenization, quality scoring and language modeling.

Mechanically split from the monolithic plans/catalog.py (round
12); query definition order within the family is the original
file order, and all shared helpers come from ``_qshared``.
"""

from __future__ import annotations

from ._qshared import *  # noqa: F401,F403




# --- Text analysis -----------------------------------------------------------


@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
               t -> t IN ('the','a','an','of','and','to','in','is','it','that')))
             AS n_stopwords,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
               t -> t IN ('the','a','an','of','and','to','in','is','it','that')))
             AS DOUBLE) / len(string_split_regex(trim(text), '\\s+'))
             AS stopword_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return tx.with_text_stats(d).select(
        "doc_id", "n_chars_calc", "n_tokens", "n_stopwords", "stopword_ratio"
    )




@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", tx.token_count("text").alias("n_tokens"))




@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", tx.md5_fingerprint("text").alias("fp"))




@query(
    "text_langid",
    oracle="""
    WITH hits AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t IN ('the','a','an','of','and','to','in','is','it','that'))) AS h_en,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t IN ('der','die','das','und','ist','ein','zu','den','mit','von'))) AS h_de,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t IN ('el','la','de','que','y','en','un','es','se','no'))) AS h_es,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t IN ('le','la','de','et','les','des','un','une','est','que'))) AS h_fr,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t IN ('的','了','是','在','我','有','和','就','不','人'))) AS h_zh
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN h_en >= greatest(h_de, h_es, h_fr, h_zh, 1) THEN 'en'
                WHEN h_de >= greatest(h_es, h_fr, h_zh, 1) THEN 'de'
                WHEN h_es >= greatest(h_fr, h_zh, 1) THEN 'es'
                WHEN h_fr >= greatest(h_zh, 1) THEN 'fr'
                WHEN h_zh >= 1 THEN 'zh'
                ELSE 'und' END AS lang_pred
    FROM hits
    """,
)
def text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-hit arg-max language ID with deterministic priority."""
    d = load(spark, sf, "documents")
    return tx.lang_id(d).select("doc_id", "lang_pred")




@query(
    "text_quality",
    oracle="""
    WITH stats AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                 t -> t IN ('the','a','an','of','and','to','in','is','it','that')))
               AS DOUBLE) / len(string_split_regex(trim(text), '\\s+'))
               AS stopword_ratio,
             CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
               AS DOUBLE) / length(text) AS punct_ratio,
             CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
               / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len
      FROM documents
    )
    SELECT doc_id, n_tokens, stopword_ratio, punct_ratio, avg_token_len,
           (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN stopword_ratio >= 0.01 THEN 1.0 ELSE 0.0 END
            + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END
            + CASE WHEN avg_token_len >= 2 AND avg_token_len <= 12
                   THEN 1.0 ELSE 0.0 END) / 4.0 AS quality_score
    FROM stats
    """,
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-flavored composite quality score (length, stopword,
    punctuation, token-shape gates)."""
    d = load(spark, sf, "documents")
    out = tx.quality_score(tx.with_text_stats(d))
    return out.select(
        "doc_id", "n_tokens", "stopword_ratio", "punct_ratio",
        "avg_token_len", "quality_score",
    )




@query(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-word-ish token counts: word runs + individual symbols via
    match extraction (RE2-portable — the earlier lookaround split was
    Java-regex-only and forced a rows-only check; outputs verified
    identical)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id", tx.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens")
    )




@query(
    "text_pii_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               text || ' contact: user' || doc_id ||
               '@example.com +1-555-000-' || lpad(CAST(doc_id AS VARCHAR), 4, '0'),
               '[A-Za-z0-9._%+e-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g') AS redacted
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing for training data: email + phone redaction with
    RE2-compatible patterns (portable to the oracle — no lookarounds).
    Synthetic PII is appended deterministically so the op has real work."""
    d = load(spark, sf, "documents")
    with_pii = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"), F.col("doc_id").cast("string"),
            F.lit("@example.com +1-555-000-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("t"),
    )
    email = r"[A-Za-z0-9._%+e-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
    return with_pii.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("t"), email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
    )




@query(
    "text_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bigram
      FROM toks WHERE len(t) >= 2
    ), counts AS (
      SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      FROM bg GROUP BY bigram
    )
    SELECT bigram, n, n_docs FROM (
      SELECT bigram, n, n_docs,
             row_number() OVER (ORDER BY n DESC, bigram ASC) AS rn
      FROM counts
    ) WHERE rn <= 50
    """,
)
def text_top_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide collocation extraction: top-50 word bigrams by
    occurrence (with document frequency) — deterministic tiebreak."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = tx.tokens("text")
    sz = F.size(toks)
    zipped = F.arrays_zip(
        F.slice(toks, 1, sz - F.lit(1)), F.slice(toks, 2, sz - F.lit(1))
    )
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    bg = explode_strict(
        d,
        F.when(sz >= 2, grams).otherwise(F.array().cast("array<string>")),
        "bigram",
        keep=("doc_id",),
    )
    counts = bg.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    w = Window.orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("bigram", "n", "n_docs")
    )




@query(
    "text_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents
    ), freq AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t
    ), ranked AS (
      SELECT t, n,
             row_number() OVER (ORDER BY n DESC, t ASC) AS rnk,
             CAST(sum(n) OVER (ORDER BY n DESC, t ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_n,
             CAST((SELECT sum(n) FROM freq) AS BIGINT) AS total_n
      FROM freq
    )
    SELECT t AS token, n, rnk AS rank,
           CAST(cum_n AS DOUBLE) / total_n AS cum_share
    FROM ranked WHERE rnk <= 100
    """,
)
def text_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf check for tokenizer/vocab planning: top-100 tokens with
    cumulative corpus coverage. Counts and cumulative sums stay exact
    BIGINT (window over ordered longs); only the final share is one
    IEEE division — bit-reproducible cross-engine."""
    d = load(spark, sf, "documents")
    freq = (
        explode_strict(d, tx.tokens("text"), "t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("t").asc())
    total = freq.agg(F.sum("n").alias("total_n"))
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_n",
            F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("rank") <= 100)
        .crossJoin(F.broadcast(total))
        .select(
            F.col("t").alias("token"),
            "n",
            "rank",
            (F.col("cum_n").cast("double") / F.col("total_n")).alias("cum_share"),
        )
    )




@query(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
           unnest(range(1, len(t) - 1)) AS r(i)
    ), per AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS n FROM grams
      GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_grams,
           CAST(max(n) AS BIGINT) AS max_gram,
           CAST(max(n) AS DOUBLE) / sum(n) AS repetition_ratio
    FROM per GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Degenerate-repetition signal (the '3-gram repetition ratio'
    quality filter for LLM corpora): share of a doc's 3-grams taken by
    its single most repeated 3-gram. All-occurrence grams (not
    distinct), exact integer counts, one IEEE division."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = tx.tokens("text")
    sz = F.size(toks)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, sz - F.lit(2)) for i in range(3)]
    )
    grams = F.when(
        sz >= 3,
        F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"])),
    )
    per = (
        explode_strict(d, grams, "g", keep=("doc_id",))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per.groupBy("doc_id").agg(
        F.sum("n").alias("n_grams"),
        F.max("n").alias("max_gram"),
        (F.max("n").cast("double") / F.sum("n")).alias("repetition_ratio"),
    )




@query(
    "text_gopher_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t,
             length(regexp_replace(trim(text), '\\s+', '', 'g')) AS no_ws
      FROM documents
    ), f AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(no_ws AS DOUBLE) / len(t) AS avg_token_len,
             CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / len(t) AS alpha_ratio,
             CAST(len(list_filter(t, x -> list_contains(
                  ['the','a','an','of','and','to','in','is','it','that'],
                  lower(x)))) AS BIGINT) AS stop_hits
      FROM t
    )
    SELECT doc_id, n_tokens, avg_token_len, alpha_ratio, stop_hits,
           n_tokens >= 50 AND n_tokens <= 100000 AS flag_len,
           avg_token_len >= 3.0 AND avg_token_len <= 10.0 AS flag_avg_len,
           alpha_ratio > 0.8 AS flag_alpha,
           stop_hits >= 2 AS flag_stop,
           (n_tokens >= 50 AND n_tokens <= 100000)
             AND (avg_token_len >= 3.0 AND avg_token_len <= 10.0)
             AND alpha_ratio > 0.8 AND stop_hits >= 2 AS gopher_pass
    FROM f
    """,
)
def text_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher rule-set quality filter (length, mean token length,
    alpha-word ratio, stopword floor) with per-rule flags."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    return tx.gopher_flags(d).select(
        "doc_id", "n_tokens", "avg_token_len", "alpha_ratio", "stop_hits",
        "flag_len", "flag_avg_len", "flag_alpha", "flag_stop", "gopher_pass",
    )




@query(
    "text_ngram_novelty",
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
    ), firstd AS (
      SELECT gram, min(doc_id) AS first_doc FROM ex GROUP BY gram
    )
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_grams,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS novelty
    FROM ex e JOIN firstd f ON e.gram = f.gram
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-order n-gram novelty (the curation signal behind 'is this
    document new information or a remix'): per doc, the share of its
    distinct 8-grams whose global first occurrence (min doc_id) is this
    very doc. Inverted-index shape — one shuffle of (gram, doc_id)
    pairs to find per-gram first owners, one equi-join back, one
    per-doc agg. Novelty divides two exact BIGINTs in double."""
    from ..functions.dedup import word_shingles
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    ex = explode_strict(
        d,
        F.array_distinct(word_shingles("text", 8)),
        "gram",
        keep=("doc_id",),
    )
    firstd = ex.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        ex.join(firstd, on="gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("long").alias("novel_grams"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
    )




@query(
    "text_source_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT source,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                            t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                            t[i+6] || ' ' || t[i+7]
                            for i in range(1, len(t) - 6)]) AS g
      FROM toks WHERE len(t) >= 8
    ), sg AS (
      SELECT DISTINCT source, unnest(g) AS gram FROM grams
    ), sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM sg
      GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
      GROUP BY src_a, src_b
    )
    SELECT i.src_a, i.src_b, i.n_common,
           sa.n_grams AS grams_a, sb.n_grams AS grams_b,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.n_grams + sb.n_grams - i.n_common AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
)
def text_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source contamination matrix: 8-gram Jaccard overlap
    between every pair of corpus sources — the dataset-level view of
    `curation_decontaminate` (which checks documents against a single
    eval set). Inverted-index shape: distinct (source, gram) pairs
    shuffle once; the pair join is per-gram with source<source
    dedup, so a gram shared by k sources yields k(k-1)/2 counted
    pairs, never a cross join of documents. Set sizes join back
    broadcast (one row per source). Jaccard divides exact BIGINTs."""
    from ..functions.dedup import word_shingles
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    sg = explode_strict(
        d,
        F.array_distinct(word_shingles("text", 8)),
        "gram",
        keep=("source",),
    ).distinct()
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.alias("a")
    b = sg.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("sa_src"), F.col("n_grams").alias("grams_a")
    )
    sb = sizes.select(
        F.col("source").alias("sb_src"), F.col("n_grams").alias("grams_b")
    )
    return (
        inter.join(F.broadcast(sa), F.col("src_a") == F.col("sa_src"))
        .join(F.broadcast(sb), F.col("src_b") == F.col("sb_src"))
        .select(
            "src_a",
            "src_b",
            "n_common",
            "grams_a",
            "grams_b",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("grams_a") + F.col("grams_b") - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
        )
    )




@query(
    "text_bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS tot_len
      FROM dl
    ), tf AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok
      WHERE t IN ('join', 'filter', 'scan') GROUP BY doc_id, t
    ), idf AS (
      SELECT t, ln((CAST(s.n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
                   / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) AS idf
      FROM (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t)
      CROSS JOIN stats s
    ), contrib AS (
      SELECT tf.doc_id,
             idf.idf * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
             / (tf.tf + CAST(1.2 AS DOUBLE)
                * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * dl.dl
                     / (CAST(s.tot_len AS DOUBLE) / s.n_docs))) AS c
      FROM tf JOIN idf USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
    )
    SELECT doc_id, score, rank FROM (
      SELECT doc_id,
             round(list_reduce(list_sort(list(c)), (x, y) -> x + y), 12)
               AS score,
             row_number() OVER (
               ORDER BY round(list_reduce(list_sort(list(c)), (x, y) -> x + y), 12) DESC,
                        doc_id ASC) AS rank
      FROM contrib GROUP BY doc_id)
    WHERE rank <= 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed 3-term
    query — the keyword-search ranking a corpus pipeline runs from an
    inverted index, never a cross join: term filter → per-(doc, term)
    tf → broadcast idf/avgdl scalars → per-doc sorted fold of ≤|q|
    contributions. Exact integer tf/df/dl; each contribution is one
    identical float expression tree; ln() ULP skew absorbed by the
    12-decimal round (ranking happens on the rounded score with a
    doc_id tiebreak, so order is engine-stable)."""
    terms = ["join", "filter", "scan"]
    toks = explode_strict(
        load(spark, sf, "documents"),
        tx.tokens("text"),
        "t",
        keep=("doc_id",),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_len")
    )
    tf = (
        toks.filter(F.col("t").isin(terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "t",
            F.log(
                (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ).alias("idf"),
        )
    )
    avgdl = F.col("tot_len").cast("double") / F.col("n_docs")
    contrib = (
        tf.join(F.broadcast(idf), on="t")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (F.lit(1.2) + F.lit(1.0)))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / avgdl)
                )
            ).alias("c"),
        )
    )
    score = F.round(
        F.aggregate(
            F.array_sort(F.collect_list("c")), F.lit(0.0), lambda a, x: a + x
        ),
        12,
    )
    wr = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        contrib.groupBy("doc_id")
        .agg(score.alias("score"))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "score", "rank")
    )




@query(
    "text_rake_keywords",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id, lower(t[CAST(gs.pos AS INT)]) AS w,
             CAST(gs.pos AS BIGINT) AS pos
      FROM d, unnest(range(1, len(t) + 1)) AS gs(pos)
    ),
    flagged AS (
      SELECT doc_id, w, pos,
             CASE WHEN w IN ('the','a','an','of','and','to','in','is',
                             'it','that') THEN 1 ELSE 0 END AS stop
      FROM toks
    ),
    seg AS (
      SELECT doc_id, w, pos, stop,
             sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
      FROM flagged
    ),
    members AS (SELECT doc_id, phrase_id, w, pos FROM seg WHERE stop = 0),
    plen AS (
      SELECT doc_id, phrase_id, CAST(count(*) AS BIGINT) AS n_words
      FROM members GROUP BY doc_id, phrase_id
    ),
    wstat AS (
      SELECT m.w, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(p.n_words) AS BIGINT) AS deg
      FROM members m JOIN plen p USING (doc_id, phrase_id)
      GROUP BY m.w
    ),
    scored AS (
      SELECT m.doc_id, m.phrase_id,
             string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
             round(list_reduce(list_sort(
               list(CAST(s.deg AS DOUBLE) / s.freq)), (x, y) -> x + y), 6)
               AS score
      FROM members m JOIN wstat s ON s.w = m.w
      GROUP BY m.doc_id, m.phrase_id
    ),
    agg AS (
      SELECT phrase, score, CAST(count(*) AS BIGINT) AS n_occur
      FROM scored GROUP BY phrase, score
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, phrase) AS INT)
             AS rank,
           phrase, score, n_occur
    FROM agg
    ORDER BY score DESC, phrase
    LIMIT 50
    """,
)
def text_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): stopwords cut each
    document into candidate phrases; every word scores deg/freq over
    the phrase co-occurrence graph; a phrase scores the sum of its
    member word scores. Top-50 corpus phrases.

    Scale shape: segmentation is a doc-partitioned running sum (rides
    the posexplode, no corpus-wide shuffle); word stats are one
    map-combinable groupBy over phrase members; the phrase score is a
    sorted float fold (deg/freq is one exact-int division per word,
    but the SUM order must match the oracle) rounded at 6 decimals —
    scores reach ~10³, and rounding at 12 would ask round() to operate
    at 10¹⁵ where DuckDB's multiply-round-divide loses the last digit
    vs Spark's exact decimal rounding (the entropy queries can afford
    12 only because their magnitudes are ~1);
    the global top-50 is orderBy+limit — only 50 rows ever sort on one
    node. Word scores are corpus-global, so equal phrase TEXT implies
    equal score and the (phrase, score) rollup is well-defined."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = posexplode_strict(
        d, tx.tokens("text"), "pos", "w", keep=("doc_id",)
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("pos"),
        F.lower("w").alias("w"),
    )
    stoplist = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]
    flagged = toks.withColumn(
        "stop", F.when(F.col("w").isin(stoplist), 1).otherwise(0)
    )
    wseg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    members = flagged.withColumn(
        "phrase_id", F.sum("stop").over(wseg)
    ).filter(F.col("stop") == 0)
    plen = members.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    wstat = (
        members.join(plen, on=["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("deg"),
        )
    )
    scored = (
        members.join(wstat, on="w")
        .withColumn("wscore", F.col("deg").cast("double") / F.col("freq"))
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("wscore")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("score"),
        )
    )
    agg = scored.groupBy("phrase", "score").agg(
        F.count(F.lit(1)).alias("n_occur")
    )
    top = agg.orderBy(F.col("score").desc(), F.col("phrase").asc()).limit(50)
    w = Window.orderBy(F.col("score").desc(), F.col("phrase"))
    return top.select(
        F.row_number().over(w).alias("rank"), "phrase", "score", "n_occur"
    )




@query(
    "text_zipf_fit",
    oracle="""
    WITH wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    top AS (
      SELECT w, freq,
             CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT)
               AS rnk
      FROM wc ORDER BY freq DESC, w LIMIT 1000
    ),
    xy AS (
      SELECT round(ln(CAST(rnk AS DOUBLE)), 12) AS x,
             round(ln(CAST(freq AS DOUBLE)), 12) AS y
      FROM top
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_sort(list(x)), (a, b) -> a + b) AS sx,
             list_reduce(list_sort(list(y)), (a, b) -> a + b) AS sy,
             list_reduce(list_sort(list(x * y)), (a, b) -> a + b) AS sxy,
             list_reduce(list_sort(list(x * x)), (a, b) -> a + b) AS sxx
      FROM xy
    )
    SELECT n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9)
             AS zipf_intercept
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: OLS slope of
    ln(freq) on ln(rank) over the top-1000 vocabulary — the corpus
    health check (natural text ≈ −1; a slope collapsing toward 0
    flags template/boilerplate floods, steeper than −1.5 flags
    degenerate repetition).

    Scale shape: word counts are one map-combinable groupBy; only the
    TOP-1000 rows (orderBy+limit — k rows, never the vocabulary) see
    the rank window; the regression is four sorted float folds over
    1000 terms with the ln inputs pre-rounded at 12 (so the folds sum
    identical doubles on both engines) and the slope/intercept rounded
    at 9."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    wc = (
        explode_strict(d, tx.tokens("text"), "w")
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = wc.orderBy(F.col("freq").desc(), F.col("w").asc()).limit(1000)
    wr = Window.orderBy(F.col("freq").desc(), F.col("w"))
    xy = top.select(
        F.round(F.log(F.row_number().over(wr).cast("double")), 12).alias(
            "x"
        ),
        F.round(F.log(F.col("freq").cast("double")), 12).alias("y"),
    )

    def fold(col: F.Column) -> F.Column:
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        fold(F.col("x")).alias("sx"),
        fold(F.col("y")).alias("sy"),
        fold(F.col("x") * F.col("y")).alias("sxy"),
        fold(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "n",
        F.round(slope, 9).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias(
            "zipf_intercept"
        ),
    )





# ===========================================================================
# Coverage round 4: segment-level corpus cleaning (CCNet-style)
# ===========================================================================


@query(
    "text_boilerplate_removal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(t[(i*3+1):(i*3+3)], ' ') AS segment
      FROM toks,
           unnest(range(0, greatest(CAST(ceil(len(t)/3.0) AS BIGINT), 1)))
             AS u(i)
    ),
    hot AS (
      SELECT segment FROM (SELECT DISTINCT segment, doc_id FROM segs)
      GROUP BY segment HAVING count(*) > 5
    ),
    kept AS (
      SELECT s.* FROM segs s
      WHERE s.segment NOT IN (SELECT segment FROM hot)
    ),
    tot AS (
      SELECT doc_id, count(*) AS n_segments FROM segs GROUP BY doc_id
    ),
    reb AS (
      SELECT doc_id, count(*) AS kept_n,
             string_agg(segment, ' ' ORDER BY seg_idx) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_segments,
           t.n_segments - COALESCE(r.kept_n, 0) AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
)
def text_boilerplate_removal(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style cross-document boilerplate removal: 3-token segments
    occurring in >5 distinct docs are dropped, the rest reassembled in
    order. The boilerplate dictionary broadcast + ordered rebuild is
    the pattern the newline-structured web-corpus version uses
    verbatim (segments would be lines)."""
    d = load(spark, sf, "documents")
    return tx.remove_boilerplate(
        d, "doc_id", "text", seg_tokens=3, max_doc_freq=5
    )




@query(
    "text_intradoc_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(t[(i*3+1):(i*3+3)], ' ') AS segment
      FROM toks,
           unnest(range(0, greatest(CAST(ceil(len(t)/3.0) AS BIGINT), 1)))
             AS u(i)
    ),
    first_occ AS (
      SELECT doc_id, seg_idx, segment,
             row_number() OVER (PARTITION BY doc_id, segment
                                ORDER BY seg_idx) AS rn
      FROM segs
    )
    SELECT s.doc_id,
           count(*) AS n_segments,
           count(*) - k.kept_n AS n_intra_dups,
           k.dedup_text
    FROM segs s
    JOIN (
      SELECT doc_id, count(*) AS kept_n,
             string_agg(segment, ' ' ORDER BY seg_idx) AS dedup_text
      FROM first_occ WHERE rn = 1 GROUP BY doc_id
    ) k USING (doc_id)
    GROUP BY s.doc_id, k.kept_n, k.dedup_text
    """,
)
def text_intradoc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition removal (templating-loop cleanup):
    keep each distinct 3-token segment's first occurrence in order."""
    d = load(spark, sf, "documents")
    return tx.dedup_intradoc_segments(d, "doc_id", "text", seg_tokens=3)




@query("text_bpe_train_merges", oracle=_bpe_merges_oracle(_BPE_N_MERGES))
def text_bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    """First 10 BPE merges learned from the documents corpus
    (merge_rank, lhs, rhs, merged, pair_count). The oracle replays the
    training loop unrolled in SQL, so every iteration's argmax and
    every replace are hash-checked — a distributed tokenizer trainer
    whose training TRACE is verified, not just its output counts."""
    d = load(spark, sf, "documents")
    return bpe.bpe_merges(d, n_merges=_BPE_N_MERGES)




@query("text_bpe_segment_counts", oracle=_bpe_segment_oracle(_BPE_N_MERGES))
def text_bpe_segment_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Apply the 10 learned merges to the corpus: per-doc whitespace
    word count vs BPE token count (the compression the tokenizer buys
    at this merge budget). Merges fold into one chained JVM replace
    per word — a single corpus map, zero joins."""
    d = load(spark, sf, "documents")
    m = bpe.bpe_merges(d, n_merges=_BPE_N_MERGES)
    return bpe.bpe_segment(d, m)




@query(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    trans AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) g
      WHERE len(t) >= 2
    ),
    c2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2
      FROM trans GROUP BY w1, w2
    ),
    c1 AS (SELECT w1, CAST(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY w1),
    v AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS vs
      FROM (SELECT unnest(t) AS w FROM toks)
    ),
    scored AS (
      SELECT tr.doc_id,
             ln((c2.n2 + 0.5) / (c1.n1 + 0.5 * v.vs)) AS lp
      FROM trans tr JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_transitions,
           round(-list_reduce(list_sort(list(lp)), (x, y) -> x + y)
                 / count(*), 9) AS cross_entropy_nats
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained add-α word-
    bigram LM — the relational twin of the KenLM-perplexity quality
    filter CCNet-style pipelines run (low score = fluent/common text,
    high = gibberish or boilerplate-stitched). Training IS the query:
    bigram counts and context counts are two map-side-combinable
    groupBys over one (w1, w2) explode; scoring is two equi-joins back
    (w1 hot keys → AQE skew-split territory, no broadcast of the model
    needed at any corpus size) plus one broadcast scalar (vocab size).
    P(w2|w1) = (C(w1,w2)+0.5) / (C(w1)+0.5·V) with C(w1) the context
    count (row sum of the bigram table), so the model is
    self-consistent and every transition scores against mass that
    sums to 1. Float discipline: the ln argument is bit-identical on
    both engines (integer+0.5 arithmetic, one division); ln itself
    differs ≤1 ulp (Math.log vs libm), so per-doc terms fold
    smallest-first and the mean rounds to 9 decimals (tighter than
    the entropy query's 12 because ~100 ln terms of magnitude ~10
    accumulate more ulp drift than entropy's ≤2-nat sums)."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    # lazy pin on trans (narrow: id + two words): it feeds the count
    # aggregation AND the scoring join, which otherwise re-run
    # tokenize + arrays_zip + explode over the corpus (r14: the
    # duplicated subtrees were the two hottest stages of this query's
    # profile). toks stays unpinned — materializing the full token
    # arrays cost more than the one re-tokenize the vocab count pays
    # (measured +0.3 s on the perplexity wrapper).
    toks = d.select("doc_id", tx.tokens("text").alias("_t"))
    sz = F.size("_t")
    zipped = F.arrays_zip(
        F.slice("_t", 1, sz - 1), F.slice("_t", 2, sz - 1)
    )
    trans = (
        explode_strict(toks.filter(sz >= 2), zipped, "_p", keep=("doc_id",))
        .select(
            "doc_id",
            F.col("_p.0").alias("w1"),
            F.col("_p.1").alias("w2"),
        )
        .localCheckpoint(eager=False)
    )
    c2 = trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    v = explode_strict(toks, "_t", "w").agg(
        F.count_distinct("w").alias("vs")
    )
    lp = F.log(
        (F.col("n2") + F.lit(0.5))
        / (F.col("n1") + F.lit(0.5) * F.col("vs"))
    )
    scored = (
        trans.join(c2, on=["w1", "w2"])
        .join(c1, on="w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", lp.alias("_lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(
            -F.aggregate(
                F.array_sort(F.collect_list("_lp")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)),
            9,
        ).alias("cross_entropy_nats"),
    )




@query(
    "text_cdc_chunks",
    oracle=_CDC_CHUNK_SQL + "SELECT * FROM chunks",
)
def text_cdc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined chunking (LBFS/Venti rolling boundary): token
    position p ends a chunk iff the md5-derived hash of the k=3-token
    window ending at p is ≡ 0 mod 16 — boundaries follow CONTENT, so an
    edit perturbs only nearby chunks and identical slabs shared across
    documents re-chunk identically once boundaries re-synchronize.
    Fully oracle-paired: every boundary decision is the engine-portable
    md5 device. See functions/text.cdc_chunks for the scale shape (JVM
    flag projection + one doc-partitioned window + one groupBy; no
    corpus-wide shuffle)."""
    d = load(spark, sf, "documents")
    return tx.cdc_chunks(d, k=3, modulus=16)




@query(
    "text_perplexity_buckets",
    oracle=_BIGRAM_CE_CTES
    + """
    SELECT c.doc_id, d.lang,
           c.ce AS cross_entropy_nats,
           CASE ntile(3) OVER (PARTITION BY d.lang
                               ORDER BY c.ce, c.doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM ce c JOIN documents d USING (doc_id)
    """,
)
def text_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): per language,
    split documents into head/middle/tail tertiles of their LM
    cross-entropy — the standard quality gate that keeps 'head',
    samples 'middle', and drops 'tail'. The LM is the corpus-trained
    add-α bigram model of text_bigram_lm_score; the 9-decimal-rounded
    entropy makes the ntile ordering (entropy, doc_id) engine-exact.
    One extra per-language window over the per-doc score table —
    |docs| rows, not corpus tokens."""
    ce = text_bigram_lm_score(spark, sf).select(
        "doc_id", F.col("cross_entropy_nats")
    )
    d = load(spark, sf, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.col("cross_entropy_nats").asc(), F.col("doc_id").asc()
    )
    nt = F.ntile(3).over(w)
    return ce.join(d, on="doc_id").select(
        "doc_id",
        "lang",
        "cross_entropy_nats",
        F.when(nt == 1, F.lit("head"))
        .when(nt == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )




@query(
    "text_hashed_linear_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 262144
               AS bucket
      FROM toks WHERE w <> ''
    ),
    scored AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('w:' || CAST(bucket AS VARCHAR)),
                   1, 8)) AS BIGINT) % 2001 - 1000 AS wgt
      FROM feat
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(wgt) AS BIGINT) AS raw_score
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, raw_score,
           CAST(raw_score AS DOUBLE)
             / (CAST(1000 AS DOUBLE) * CAST(n_tokens AS DOUBLE))
             AS norm_score,
           CAST(raw_score AS DOUBLE)
             / (CAST(1000 AS DOUBLE) * CAST(n_tokens AS DOUBLE)) > 0
             AS keep
    FROM agg
    """,
)
def text_hashed_linear_score(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-feature LINEAR CLASSIFIER INFERENCE — the fastText /
    logistic-quality-filter serving shape (CCNet, DCLM quality
    gates): token → 2^18 hash bucket → fixed weight, document score =
    mean bucket weight, keep = sign. The weight table is IMPLICIT
    (weight derived from the bucket id by md5 arithmetic — a stand-in
    for broadcasting a trained coefficient vector), so inference is
    explode → two md5 hashes → one groupBy per doc: no model join, no
    UDF, whole-stage codegen end to end, and the exact shape scales
    to 100 TB (a real trained model swaps the md5 weight expr for a
    broadcast 2^18-entry map lookup). Integer accumulation throughout;
    the single final division is mirrored in the oracle."""
    d = load(spark, sf, "documents")
    toks = explode_strict(
        d,
        F.split(F.trim(F.col("text")), r"\s+"),
        "w",
        keep=("doc_id",),
    ).filter(F.col("w") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % 262144
    )
    wgt = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )
    agg = toks.select("doc_id", wgt.alias("wgt")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("wgt").alias("raw_score"),
    )
    norm = F.col("raw_score").cast("double") / (
        F.lit(1000).cast("double") * F.col("n_tokens").cast("double")
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "raw_score",
        norm.alias("norm_score"),
        (norm > 0).alias("keep"),
    )




@query(
    "text_textrank_keywords",
    oracle=_pagerank_oracle(3, edges_sql=_WORD_EDGES_SQL),
)
def text_textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — the
    graph-centrality alternative to RAKE (`text_rake_keywords`):
    corpus-wide word graph from ADJACENT-token co-occurrence (window
    2, undirected, distinct), then the SAME deterministic 3-iteration
    PageRank device as graph_pagerank_top20 (smallest-first sorted
    folds → bit-identical to the oracle's list_sort + list_reduce),
    top-20 words. One lead() window per doc builds the edges — no
    self-join on the token table; graph size is vocabulary-bounded,
    not corpus-bounded, so the PR iterations run on a small edge
    set whatever the input size."""
    d = load(spark, sf, "documents")
    toks = posexplode_strict(
        d,
        F.split(F.trim(F.col("text")), r"\s+"),
        "pos",
        "w",
        keep=("doc_id",),
    )
    wn = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    pairs = toks.withColumn("wn", wn).filter(
        F.col("wn").isNotNull()
        & (F.col("w") != "")
        & (F.col("wn") != "")
        & (F.col("w") != F.col("wn"))
    )
    edges = pairs.select(
        F.least("w", "wn").alias("src"), F.greatest("w", "wn").alias("dst")
    ).distinct()
    pr = gr.pagerank(
        gr.undirected_edges(edges),
        iterations=3,
        damping=0.85,
        deterministic=True,
    )
    w20 = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        pr.withColumn("rank", F.row_number().over(w20).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )




@query(
    "text_kl_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, g AS term
      FROM (SELECT source,
                   unnest(string_split_regex(trim(text), '\\s+')) AS g
            FROM documents)
    ),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
          FROM tok GROUP BY source, term),
    ts AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot_s
           FROM c GROUP BY source),
    cw AS (SELECT term, CAST(sum(n) AS BIGINT) AS n_w
           FROM c GROUP BY term),
    nt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
    contrib AS (
      SELECT c.source,
             (CAST(c.n AS DOUBLE) / ts.tot_s)
               * ln(CAST(c.n * nt.tot AS DOUBLE)
                    / CAST(ts.tot_s * cw.n_w AS DOUBLE)) AS t
      FROM c
      JOIN ts USING (source)
      JOIN cw USING (term)
      CROSS JOIN nt
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(list_reduce(list_sort(list(t)), (x, y) -> x + y), 12)
             AS kl_nats
    FROM contrib GROUP BY source
    """,
)
def text_kl_source_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """KL(source ‖ corpus) over unigram distributions — the
    domain-shift detector a data-mixing pipeline runs per source
    (high KL = niche vocabulary; near-zero = indistinguishable from
    the mix). Each term's contribution is p·ln(p/q) with the ratio as
    ONE division of exact integer products (n·tot)/(tot_s·n_w), then
    the per-source sum folds smallest-first and rounds to 12 (the
    entropy/PSI ln discipline). Shape: one explode + three hash aggs
    + a vocab-keyed join — every aggregate map-side combines; nothing
    is quadratic in corpus size."""
    d = load(spark, sf, "documents")
    tok = explode_strict(d, tx.tokens("text"), "term", keep=("source",))
    c = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    ts_ = c.groupBy("source").agg(F.sum("n").alias("tot_s"))
    cw = c.groupBy("term").agg(F.sum("n").alias("n_w"))
    nt = c.agg(F.sum("n").alias("tot"))
    contrib = (
        c.join(ts_, on="source")
        .join(cw, on="term")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            (
                (F.col("n").cast("double") / F.col("tot_s"))
                * F.log(
                    (F.col("n") * F.col("tot")).cast("double")
                    / (F.col("tot_s") * F.col("n_w")).cast("double")
                )
            ).alias("t"),
        )
    )
    return contrib.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("t")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            12,
        ).alias("kl_nats"),
    )




@query(
    "text_bigram_entropy_rate",
    oracle="""
    WITH tok AS (
      SELECT doc_id, g AS w, pos
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS g,
                   generate_subscripts(
                     string_split_regex(trim(text), '\\s+'), 1) AS pos
            FROM documents)
    ),
    big AS (
      SELECT a.w AS w1, b.w AS w2
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
            FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1
           FROM c12 GROUP BY w1),
    nt AS (SELECT CAST(sum(n12) AS BIGINT) AS n FROM c12),
    terms AS (
      SELECT (CAST(c12.n12 AS DOUBLE) / nt.n)
               * ln(CAST(c1.n1 AS DOUBLE) / c12.n12) AS t
      FROM c12 JOIN c1 USING (w1) CROSS JOIN nt
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM c12) AS n_bigrams,
           (SELECT n FROM nt) AS n_tokens,
           round(list_reduce(list_sort(list(t)), (x, y) -> x + y), 12)
             AS cond_entropy_nats
    FROM terms
    """,
)
def text_bigram_entropy_rate(spark: SparkSession, sf: str) -> DataFrame:
    """BIGRAM CONDITIONAL ENTROPY H(w₂|w₁) — the corpus
    predictability number (low = templated/boilerplate-heavy text,
    high = diverse prose; the information-theoretic cousin of
    text_repetition). H = Σ p(w₁w₂)·ln(n₁/n₁₂) with the ratio ONE
    division of exact integers; the global sum folds smallest-first
    and rounds to 12 (the entropy discipline). Shape: one lead
    window per doc for bigrams, two hash aggregates, a vocab-keyed
    join — nothing quadratic."""
    d = load(spark, sf, "documents")
    toks = posexplode_strict(
        d, tx.tokens("text"), "pos", "w", keep=("doc_id",)
    )
    wn = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    big = toks.select("w", wn.alias("w2")).filter(F.col("w2").isNotNull())
    c12 = big.groupBy(
        F.col("w").alias("w1"), "w2"
    ).agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    nt = c12.agg(F.sum("n12").alias("n"))
    terms = (
        c12.join(c1, on="w1")
        .crossJoin(F.broadcast(nt))
        .select(
            (
                (F.col("n12").cast("double") / F.col("n"))
                * F.log(F.col("n1").cast("double") / F.col("n12"))
            ).alias("t"),
            F.col("n"),
        )
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.max("n").alias("n_tokens"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("t")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            12,
        ).alias("cond_entropy_nats"),
    )




@query(
    "text_pmi_cooccurrence",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w, df FROM (
        SELECT w, count(*) AS df,
               row_number() OVER (ORDER BY count(*) DESC, w ASC) AS r
        FROM toks GROUP BY w
      ) WHERE r <= 100
    ),
    ft AS (
      SELECT t.doc_id, t.w, v.df FROM toks t JOIN vocab v USING (w)
    ),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, a.df AS df1, b.df AS df2,
             count(*) AS c12
      FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2, 3, 4
    ),
    n AS (SELECT count(*) AS nd FROM documents)
    SELECT w1, w2,
           CAST(c12 AS BIGINT) AS c12,
           CAST(df1 AS BIGINT) AS df1,
           CAST(df2 AS BIGINT) AS df2,
           round(ln(CAST(c12 * nd AS DOUBLE)
                    / (CAST(df1 AS DOUBLE) * df2)), 12) AS pmi
    FROM pairs CROSS JOIN n WHERE c12 >= 5
    """,
)
def text_pmi_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """POINTWISE MUTUAL INFORMATION of word pairs at document level —
    the collocation/topic-association signal (Church & Hanks 1990):
    pmi(w1,w2) = ln(N·c12 / (df1·df2)) over documents as contexts.
    The pair fan-out is BOUNDED BY THE VOCABULARY, not the corpus:
    tokens first filter through the top-100-df vocab (broadcast), so
    the per-doc self-join touches ≤100 tokens/doc regardless of
    document length — the max_df/top-k capping discipline the dedup
    family uses. Support floor c12 ≥ 5; the PMI ratio is one integer
    quotient inside a single ln, round 12."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = explode_strict(
        d, tx.tokens("text"), "w", keep=("doc_id",)
    ).distinct()
    wv = Window.orderBy(F.col("df").desc(), F.col("w").asc())
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= 100)
        .drop("r")
    )
    ft = toks.join(F.broadcast(vocab), on="w")
    a = ft.select(
        "doc_id", F.col("w").alias("w1"), F.col("df").alias("df1")
    )
    b = ft.select(
        "doc_id", F.col("w").alias("w2"), F.col("df").alias("df2")
    )
    pairs = (
        a.join(b, on="doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    return pairs.crossJoin(F.broadcast(nd)).select(
        "w1",
        "w2",
        F.col("c12").cast("long").alias("c12"),
        F.col("df1").cast("long").alias("df1"),
        F.col("df2").cast("long").alias("df2"),
        F.round(
            F.log(
                (F.col("c12") * F.col("nd")).cast("double")
                / (F.col("df1").cast("double") * F.col("df2"))
            ),
            12,
        ).alias("pmi"),
    )




@query(
    "text_burrows_delta",
    oracle="""
    WITH toks AS (
      SELECT d.source,
             unnest(string_split_regex(trim(d.text), '\\s+')) AS w
      FROM documents d
    ),
    cnt AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    stot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS tok FROM cnt GROUP BY 1
    ),
    top AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (
                 ORDER BY sum(c) DESC, w ASC) AS r
        FROM cnt GROUP BY w
      ) WHERE r <= 30
    ),
    dense AS (
      SELECT s.source, t.w,
             1000.0 * coalesce(c.c, 0) / s.tok AS f
      FROM stot s CROSS JOIN top t
      LEFT JOIN cnt c ON c.source = s.source AND c.w = t.w
    ),
    mu AS (
      SELECT w,
             list_reduce(list_sort(list(f)), (x, y) -> x + y)
               / count(*) AS mu
      FROM dense GROUP BY w
    ),
    sig AS (
      SELECT d.w,
             sqrt(list_reduce(
               list_sort(list((d.f - m.mu) * (d.f - m.mu))),
               (x, y) -> x + y) / count(*)) AS sig
      FROM dense d JOIN mu m ON d.w = m.w GROUP BY d.w
    ),
    z AS (
      SELECT d.source, d.w, (d.f - m.mu) / s.sig AS z
      FROM dense d
      JOIN mu m ON d.w = m.w
      JOIN sig s ON d.w = s.w
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round(list_reduce(list_sort(list(abs(a.z - b.z))),
                             (x, y) -> x + y) / 30, 9) AS delta
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def text_burrows_delta(spark: SparkSession, sf: str) -> DataFrame:
    """BURROWS' DELTA stylometric distance between every pair of the
    20 sources (Burrows 2002): z-score each source's per-mille rate
    of the 30 highest-frequency words against the across-source
    mean/σ, then delta = mean |z₁ − z₂| — the authorship/provenance
    fingerprint. Counts stay BIGINT; every float reduction (μ per
    word, σ per word, the 30-term pair sum) folds smallest-first,
    round 9. The pair join is keyed on the 30-word vocab, so the
    fan-out is sources²·30 — vocabulary-bounded like
    text_pmi_cooccurrence, independent of corpus size."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = explode_strict(
        d, tx.tokens("text"), "w", keep=("source",)
    )
    cnt = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = cnt.localCheckpoint(eager=False)  # feeds totals, top, dense
    stot = cnt.groupBy("source").agg(F.sum("c").alias("tok"))
    # top-30 vocabulary as orderBy().limit() → TakeOrderedAndProject:
    # the row_number window form was a single-partition sort of the
    # WHOLE vocabulary (r15; same device as graph_butterfly_support's
    # top-20 tail). Same (tc desc, w asc) total order, same 30 rows.
    top = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("w").asc())
        .limit(30)
        .select("w")
    )
    dense = (
        stot.crossJoin(F.broadcast(top))
        .join(cnt, on=["source", "w"], how="left")
        .select(
            "source",
            "w",
            (
                F.lit(1000.0) * F.coalesce(F.col("c"), F.lit(0))
                / F.col("tok")
            ).alias("f"),
        )
    )
    dense = dense.localCheckpoint(eager=False)  # consumed thrice
    fold = lambda col: F.aggregate(  # noqa: E731
        F.array_sort(F.collect_list(col)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    mu = dense.groupBy("w").agg(
        (fold(F.col("f")) / F.count(F.lit(1))).alias("mu")
    )
    sig = (
        dense.join(F.broadcast(mu), on="w")
        .groupBy("w")
        .agg(
            F.sqrt(
                fold(
                    (F.col("f") - F.col("mu"))
                    * (F.col("f") - F.col("mu"))
                )
                / F.count(F.lit(1))
            ).alias("sig")
        )
    )
    z = (
        dense.join(F.broadcast(mu), on="w")
        .join(F.broadcast(sig), on="w")
        .select(
            "source",
            "w",
            ((F.col("f") - F.col("mu")) / F.col("sig")).alias("z"),
        )
    )
    z = z.localCheckpoint(eager=False)  # both sides of the pair join
    a = z.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "w", F.col("z").alias("zb")
    )
    return (
        a.join(b, on="w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                fold(F.abs(F.col("za") - F.col("zb"))) / 30, 9
            ).alias("delta")
        )
    )




@query(
    "text_word_burstiness",
    oracle="""
    WITH toks AS (
      SELECT d.doc_id % 30 AS day,
             unnest(string_split_regex(trim(d.text), '\\s+')) AS w
      FROM documents d
    ),
    cnt AS (
      SELECT w, day, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    top AS (
      SELECT w, total FROM (
        SELECT w, CAST(sum(c) AS BIGINT) AS total,
               row_number() OVER (ORDER BY sum(c) DESC, w ASC) AS r
        FROM cnt GROUP BY w
      ) WHERE r <= 20
    ),
    g AS (
      SELECT t.w, t.total,
             sum(c.c * c.c) AS s2,
             min(CASE WHEN c.c = pk.peak THEN c.day END) AS peak_day,
             any_value(pk.peak) AS peak
      FROM top t
      JOIN cnt c ON c.w = t.w
      JOIN (SELECT w, max(c) AS peak FROM cnt GROUP BY w) pk
        ON pk.w = t.w
      GROUP BY t.w, t.total
    )
    SELECT w, total,
           CAST(peak AS BIGINT) AS peak_count,
           CAST(peak_day AS BIGINT) AS peak_day,
           round((CAST(s2 AS DOUBLE) / 30
                  - (CAST(total AS DOUBLE) / 30)
                    * (CAST(total AS DOUBLE) / 30))
                 / (CAST(total AS DOUBLE) / 30), 9) AS fano_factor,
           round(CAST(peak AS DOUBLE) / total * 100, 6) AS peak_share_pct
    FROM g
    """,
)
def text_word_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """WORD BURSTINESS for the 20 highest-frequency words: Fano factor
    (var/mean of per-day counts over the 30-bucket grid — 1 ≈
    Poissonian usage, ≫1 = bursty topic words) plus the peak bucket
    and its share; doc_id % 30 stands in for the publication day the
    corpus lacks. Counts and Σc² are EXACT BIGINTs — absent
    (word, day) cells contribute 0 to both sums, so the sparse count
    table IS the dense one for var/mean and no grid join is needed.
    Vocabulary-bounded: the top-20 broadcast filter caps everything
    downstream."""
    from ..util import spread

    d = spread(load(spark, sf, "documents"))
    toks = explode_strict(
        d,
        tx.tokens("text"),
        "w",
        keep=((F.col("doc_id") % 30).alias("day"),),
    )
    cnt = toks.groupBy("w", "day").agg(F.count(F.lit(1)).alias("c"))
    cnt = cnt.localCheckpoint(eager=False)  # top + stats consumers
    wv = Window.orderBy(F.col("total").desc(), F.col("w").asc())
    top = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("total"))
        .withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= 20)
        .drop("r")
    )
    pk = cnt.groupBy("w").agg(F.max("c").alias("peak"))
    g = (
        cnt.join(F.broadcast(top), on="w")
        .join(F.broadcast(pk), on="w")
        .groupBy("w", "total")
        .agg(
            F.sum(F.col("c") * F.col("c")).alias("s2"),
            F.min(
                F.when(F.col("c") == F.col("peak"), F.col("day"))
            ).alias("peak_day"),
            F.first("peak").alias("peak"),
        )
    )
    mean = F.col("total").cast("double") / 30
    return g.select(
        "w",
        F.col("total").cast("long").alias("total"),
        F.col("peak").cast("long").alias("peak_count"),
        F.col("peak_day").cast("long").alias("peak_day"),
        F.round(
            (F.col("s2").cast("double") / 30 - mean * mean) / mean, 9
        ).alias("fano_factor"),
        F.round(
            F.col("peak").cast("double") / F.col("total") * 100, 6
        ).alias("peak_share_pct"),
    )




@query(
    "text_hapax_ratio",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    wc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, w
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c) AS BIGINT) AS tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 12) AS hapax_vocab_ratio,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / sum(c), 12) AS hapax_token_share
    FROM wc GROUP BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """HAPAX-LEGOMENA census per source: vocabulary size, token
    count, words occurring exactly once, and the two classic
    vocabulary-health ratios (hapax/vocab tracks productive
    vocabulary; hapax/tokens spikes on OCR noise and mojibake — a
    cheap corpus-quality tripwire next to text_zipf_fit). One
    explode + two stacked map-combinable groupBys; ratios are
    integer-over-integer in mirrored doubles, round 12."""
    d = load(spark, sf, "documents")
    toks = explode_strict(
        d, F.split(F.trim("text"), r"\s+"), "w", keep=("source",)
    )
    wc = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    one = F.when(F.col("c") == 1, F.lit(1)).otherwise(F.lit(0))
    g = wc.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("c").alias("tokens"),
        F.sum(one).alias("hapax"),
    )
    return g.select(
        "source",
        F.col("vocab").cast("long").alias("vocab"),
        F.col("tokens").cast("long").alias("tokens"),
        F.col("hapax").cast("long").alias("hapax"),
        F.round(
            F.col("hapax").cast("double") / F.col("vocab"), 12
        ).alias("hapax_vocab_ratio"),
        F.round(
            F.col("hapax").cast("double") / F.col("tokens"), 12
        ).alias("hapax_token_share"),
    )




@query(
    "text_js_divergence_sources",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
          FROM tok GROUP BY source, term),
    ts AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot_s
           FROM c GROUP BY source),
    cw AS (SELECT term, CAST(sum(n) AS BIGINT) AS n_w
           FROM c GROUP BY term),
    nt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
    contrib AS (
      SELECT c.source,
             (CAST(c.n AS DOUBLE) / ts.tot_s)
               * ln(CAST(2 * c.n * nt.tot AS DOUBLE)
                    / CAST(c.n * nt.tot + cw.n_w * ts.tot_s AS DOUBLE))
               AS tp,
             (CAST(cw.n_w AS DOUBLE) / nt.tot)
               * ln(CAST(2 * cw.n_w * ts.tot_s AS DOUBLE)
                    / CAST(c.n * nt.tot + cw.n_w * ts.tot_s AS DOUBLE))
               AS tq,
             CAST(cw.n_w AS DOUBLE) / nt.tot AS qmass
      FROM c
      JOIN ts USING (source)
      JOIN cw USING (term)
      CROSS JOIN nt
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_sort(list(tp))), (x, y) -> x + y)
                 + 0.5 * (list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_sort(list(tq))), (x, y) -> x + y)
                   + ln(2) * (1 - list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                         list_sort(list(qmass))), (x, y) -> x + y))),
                 12) AS js_nats
    FROM contrib GROUP BY source
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf: str) -> DataFrame:
    """JENSEN–SHANNON divergence between each source's unigram
    distribution and the corpus mix — the SYMMETRIC, bounded
    (≤ ln 2) sibling of text_kl_source_divergence, preferred for
    data-mixing dashboards because it never blows up on
    source-exclusive words. Sparse-join device: only terms PRESENT
    in the source are joined; the corpus-side tail over absent terms
    collapses to ln2·(1 − Σ_present q) exactly, so no dense
    source×vocab product exists. Each ln ratio is ONE division of
    exact integer products; the three per-source sums fold
    smallest-first (sorted-fold ≡ DuckDB list_reduce∘list_sort),
    round 12."""
    d = load(spark, sf, "documents")
    tok = explode_strict(d, tx.tokens("text"), "term", keep=("source",))
    c = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    ts_ = c.groupBy("source").agg(F.sum("n").alias("tot_s"))
    cw = c.groupBy("term").agg(F.sum("n").alias("n_w"))
    nt = c.agg(F.sum("n").alias("tot"))
    den = (
        F.col("n") * F.col("tot") + F.col("n_w") * F.col("tot_s")
    ).cast("double")
    contrib = (
        c.join(ts_, on="source")
        .join(cw, on="term")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            (
                (F.col("n").cast("double") / F.col("tot_s"))
                * F.log(
                    (2 * F.col("n") * F.col("tot")).cast("double") / den
                )
            ).alias("tp"),
            (
                (F.col("n_w").cast("double") / F.col("tot"))
                * F.log(
                    (2 * F.col("n_w") * F.col("tot_s")).cast("double")
                    / den
                )
            ).alias("tq"),
            (F.col("n_w").cast("double") / F.col("tot")).alias("qmass"),
        )
    )

    def fold(col: str) -> F.Column:
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda a, v: a + v,
        )

    import math

    return contrib.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            0.5 * fold("tp")
            + 0.5
            * (fold("tq") + math.log(2) * (1 - fold("qmass"))),
            12,
        ).alias("js_nats"),
    )




@query(
    "text_simpson_diversity",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    wc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY source, w
    ),
    g AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(n * (n - 1)) AS BIGINT) AS coincide
      FROM wc GROUP BY source
    )
    SELECT source, tokens, vocab, coincide,
           round(1 - CAST(coincide AS DOUBLE)
                     / (tokens * (tokens - 1)), 12)
             AS simpson_diversity
    FROM g
    """,
)
def text_simpson_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """SIMPSON DIVERSITY per source: 1 − Σn_w(n_w−1)/(N(N−1)) — the
    probability two random tokens differ, the repetition-robust
    companion to Shannon entropy (entropy rewards long tails;
    Simpson punishes a single dominant token — template spam shows
    up here first). The coincidence count Σn(n−1) is an EXACT
    BIGINT, so the index is one division, round 12. One explode +
    two stacked map-combinable groupBys (the hapax shape)."""
    d = load(spark, sf, "documents")
    toks = explode_strict(
        d, F.split(F.trim("text"), r"\s+"), "w", keep=("source",)
    )
    wc = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    g = wc.groupBy("source").agg(
        F.sum("n").alias("tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("coincide"),
    )
    return g.select(
        "source",
        F.col("tokens").cast("long").alias("tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.col("coincide").cast("long").alias("coincide"),
        F.round(
            1
            - F.col("coincide").cast("double")
            / (F.col("tokens") * (F.col("tokens") - 1)),
            12,
        ).alias("simpson_diversity"),
    )




@query(
    "text_log_odds_terms",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
          FROM tok GROUP BY source, term),
    ts AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot_s
           FROM c GROUP BY source),
    cw AS (SELECT term, CAST(sum(n) AS BIGINT) AS n_w
           FROM c GROUP BY term),
    nt AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                  CAST(count(DISTINCT term) AS BIGINT) AS vocab
           FROM c),
    scored AS (
      SELECT c.source, c.term, c.n,
             ln(CAST(2 * c.n + 1 AS DOUBLE)
                / (2 * (ts.tot_s - c.n) + nt.vocab))
             - ln(CAST(2 * (cw.n_w - c.n) + 1 AS DOUBLE)
                  / (2 * (nt.tot - ts.tot_s - (cw.n_w - c.n))
                     + nt.vocab)) AS log_odds
      FROM c
      JOIN ts USING (source)
      JOIN cw USING (term)
      CROSS JOIN nt
    )
    SELECT source, rnk, term, n, round(log_odds, 12) AS log_odds
    FROM (
      SELECT source, term, n, log_odds,
             row_number() OVER (PARTITION BY source
                                ORDER BY log_odds DESC, term ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """,
)
def text_log_odds_terms(spark: SparkSession, sf: str) -> DataFrame:
    """SIGNATURE TERMS per source by smoothed LOG-ODDS (the Monroe
    et al. "fightin' words" device with a flat +½ prior): which
    words does this source use disproportionately vs the REST of
    the corpus? — the per-provider fingerprint a mixing dashboard
    shows next to KL/JS scalars. Each score is
    ln((2n+1)/(2(rest_in)+V)) − ln((2n_out+1)/(2(rest_out)+V)) with
    every argument an exact integer (halves cleared by doubling),
    so the only float step is two ln calls and a subtract, round 12.
    Top-3 per source via a source-keyed rank window (groups are
    sources — the window is distributed on them)."""
    d = load(spark, sf, "documents")
    tok = explode_strict(d, tx.tokens("text"), "term", keep=("source",))
    c = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    ts_ = c.groupBy("source").agg(F.sum("n").alias("tot_s"))
    cw = c.groupBy("term").agg(F.sum("n").alias("n_w"))
    nt = c.agg(
        F.sum("n").alias("tot"),
        F.countDistinct("term").alias("vocab"),
    )
    n_out = F.col("n_w") - F.col("n")
    scored = (
        c.join(ts_, on="source")
        .join(cw, on="term")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            "term",
            "n",
            (
                F.log(
                    (2 * F.col("n") + 1).cast("double")
                    / (2 * (F.col("tot_s") - F.col("n")) + F.col("vocab"))
                )
                - F.log(
                    (2 * n_out + 1).cast("double")
                    / (
                        2
                        * (
                            F.col("tot")
                            - F.col("tot_s")
                            - n_out
                        )
                        + F.col("vocab")
                    )
                )
            ).alias("log_odds"),
        )
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("log_odds").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .select("source", "rnk", "term", "n",
                F.round("log_odds", 12).alias("log_odds"))
    )




@query(
    "text_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    cw AS (SELECT w, CAST(count(*) AS BIGINT) AS f
           FROM tok GROUP BY w),
    vocab AS (
      SELECT w FROM cw ORDER BY f DESC, w ASC LIMIT 20
    ),
    marked AS (
      SELECT t.source, t.w,
             CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN vocab v ON v.w = t.w
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS tokens,
           CAST(sum(oov) AS BIGINT) AS oov_tokens,
           round(CAST(sum(oov) AS DOUBLE) / count(*), 12) AS oov_rate
    FROM marked GROUP BY source
    """,
)
def text_oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    """OUT-OF-VOCABULARY rate per source against the corpus's top-20
    token vocabulary — the tokenizer-budget question ("how much of
    each source does a K-entry vocab actually cover?") that decides
    vocab size before a BPE train (bpe.py) is even run. Vocabulary =
    TakeOrdered top-20 by frequency (broadcast); OOV marking is one
    broadcast left join over the token stream; counts exact, rate
    one division, round 12."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, tx.tokens("text"), "w", keep=("source",)
    )
    tok = tok.localCheckpoint(eager=False)  # counted + marked
    cw = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    vocab = (
        cw.orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(20)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    marked = tok.join(F.broadcast(vocab), on="w", how="left")
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("oov_tokens"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)),
            12,
        ).alias("oov_rate"),
    )




@query(
    "text_flesch_reading_ease",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             AS BIGINT) AS n_syllables,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
             AS BIGINT) AS n_sentences,
           round(206.835
                 - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
                    / greatest(len(regexp_extract_all(text, '[.!?]')), 1))
                 - 84.6 * (CAST(len(regexp_extract_all(lower(text),
                                                       '[aeiouy]+'))
                                AS DOUBLE)
                           / len(string_split(text, ' '))), 9) AS fre
    FROM documents
    """,
)
def text_flesch_reading_ease(spark: SparkSession, sf: str) -> DataFrame:
    """FLESCH READING EASE per document — 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words) with the standard vowel-group
    syllable heuristic (`[aeiouy]+` runs, backreference-free so both
    regex engines agree) and a ≥1 sentence floor for unpunctuated
    text. Counts are exact BIGINTs; the score is two mirrored IEEE
    divisions folded in the same order both sides, round 9. Pure
    column expressions — whole-stage-codegen row-local work, no
    shuffle at any scale."""
    d = load(spark, sf, "documents")
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_syll = F.regexp_count(
        F.lower(F.col("text")), F.lit("[aeiouy]+")
    ).cast("long")
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]")), F.lit(1)
    ).cast("long")
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        n_sent.alias("n_sentences"),
        F.round(fre, 9).alias("fre"),
    )




@query(
    "text_yule_k",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    types AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    per AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM types GROUP BY source
    )
    SELECT source, n_tokens, n_types, sum_c2,
           round(10000.0 * (sum_c2 - n_tokens)
                 / (CAST(n_tokens AS DOUBLE) * n_tokens), 9) AS yule_k
    FROM per
    """,
)
def text_yule_k(spark: SparkSession, sf: str) -> DataFrame:
    """YULE'S CHARACTERISTIC K per source — 10⁴·(Σc² − N)/N² over the
    type frequency spectrum: the length-robust vocabulary-richness
    constant (higher = more repetitive), the classic companion to
    hapax ratio and Simpson diversity for corpus-mix fingerprinting.
    Both moments are exact BIGINTs off one token groupBy; K is a
    single mirrored double, round 9. The token count table is the
    same map-combinable shape as the tf-idf/vocab passes — linear
    scan, one shuffle on (source, word)."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, F.split(F.col("text"), " "), "w", keep=("source",)
    )
    types = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = types.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    k = (
        F.lit(10000.0)
        * (F.col("sum_c2") - F.col("n_tokens"))
        / (F.col("n_tokens").cast("double") * F.col("n_tokens"))
    )
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        "sum_c2",
        F.round(k, 9).alias("yule_k"),
    )




@query(
    "text_mattr_sliding",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ),
    eligible AS (SELECT * FROM toks WHERE n >= 10),
    win AS (
      SELECT doc_id, n,
             CAST(len(list_distinct(t[(s.i + 1):(s.i + 10)]))
               AS BIGINT) AS d
      FROM eligible, unnest(range(0, n - 9)) AS s(i)
    ),
    agg_ AS (
      SELECT doc_id, CAST(min(n) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(d) AS BIGINT) AS sum_distinct
      FROM win GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_windows, sum_distinct,
           round(CAST(sum_distinct AS DOUBLE) / (n_windows * 10), 12)
             AS mattr
    FROM agg_
    """,
)
def text_mattr_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """MATTR — moving-average type-token ratio, window 10: the
    length-invariant lexical-diversity measure (plain TTR collapses
    as documents grow; averaging distinct-counts over every 10-token
    window removes the length artifact). The window distinct-counts
    are computed entirely with JVM higher-order array functions
    (transform + slice + array_distinct — no explode of the window
    fan-out, no Python), summed per document as exact BIGINTs; MATTR
    is one mirrored division. Row-local per document, so it scales as
    a pure map pass."""
    d = load(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).withColumn("n", F.size("t").cast("long"))
    eligible = toks.filter(F.col("n") >= 10)
    dsum = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), (F.col("n") - 10).cast("int")),
            lambda s: F.size(
                F.array_distinct(F.slice(F.col("t"), s + 1, 10))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    agg_ = eligible.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        (F.col("n") - 9).alias("n_windows"),
        dsum.alias("sum_distinct"),
    )
    return agg_.select(
        "doc_id",
        "n_tokens",
        "n_windows",
        "sum_distinct",
        F.round(
            F.col("sum_distinct").cast("double")
            / (F.col("n_windows") * 10),
            12,
        ).alias("mattr"),
    )




@query(
    "text_topk_coverage_curve",
    oracle="""
    WITH wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_total FROM wc),
    ranked AS (
      SELECT freq,
             CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT)
               AS rnk,
             CAST(sum(freq) OVER (ORDER BY freq DESC, w
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM wc
    ),
    ks AS (SELECT unnest([1, 2, 5, 10, 20, 50, 100, 500]) AS k)
    SELECT k,
           CAST(max(rnk) AS BIGINT) AS n_types_used,
           CAST(max(cum) AS BIGINT) AS cum_tokens,
           CAST(max(cum) * 1000 // (SELECT n_total FROM tot) AS BIGINT)
             AS coverage_milli
    FROM ks JOIN ranked ON ranked.rnk <= ks.k
    GROUP BY k
    """,
)
def text_topk_coverage_curve(spark: SparkSession, sf: str) -> DataFrame:
    """TOP-K TOKEN COVERAGE curve: what share of the corpus token mass
    the k most frequent types cover, at k ∈ {1,2,5,10,20,50,100,500}
    — the vocabulary-sizing curve behind tokenizer budgets and
    stopword cutoffs (BPE sizing reads exactly this shape). Counts are
    one map-combinable groupBy; only the ranked vocabulary (types,
    not tokens) sees the cumulative window; coverage is an exact
    integer milli-share. Checkpoints clamp to the vocabulary size, so
    the output is k-bounded."""
    d = load(spark, sf, "documents")
    wc = (
explode_strict(
        d, F.split(F.col("text"), " "), "w"
    )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wc = wc.localCheckpoint(eager=False)  # ranked + total
    tot = wc.agg(F.sum("freq").cast("long").alias("n_total"))
    wrank = Window.orderBy(F.col("freq").desc(), F.col("w"))
    ranked = wc.select(
        F.row_number().over(wrank).cast("long").alias("rnk"),
        F.sum("freq")
        .over(wrank.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    ks = spark.createDataFrame(
        [(k,) for k in (1, 2, 5, 10, 20, 50, 100, 500)], ["k"]
    )
    return (
        F.broadcast(ks)
        .join(ranked, ranked.rnk <= ks.k)
        .groupBy("k")
        .agg(
            F.max("rnk").cast("long").alias("n_types_used"),
            F.max("cum").cast("long").alias("cum_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_types_used",
            "cum_tokens",
            F.expr("cum_tokens * 1000 div n_total")
            .cast("long")
            .alias("coverage_milli"),
        )
    )




@query(
    "text_heaps_bigram_fit",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             CAST(row_number() OVER (ORDER BY
               md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS p
      FROM documents
    ),
    ntok AS (
      SELECT p, CAST(len(t) AS BIGINT) AS nt,
             CAST(count(*) OVER () AS BIGINT) AS n_docs
      FROM docs
    ),
    cum AS (
      SELECT p, n_docs,
             CAST(sum(nt) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_n
      FROM ntok
    ),
    grams AS (
      SELECT p, unnest(list_distinct(
               [t[i] || ' ' || t[i + 1] for i in range(1, len(t))]))
               AS g
      FROM docs WHERE len(t) >= 2
    ),
    firsts AS (SELECT g, CAST(min(p) AS BIGINT) AS fp FROM grams
               GROUP BY g),
    cps AS (
      SELECT DISTINCT (n_docs * u.k + 9) // 10 AS cp
      FROM cum, unnest(range(1, 11)) AS u(k)
    ),
    pts AS (
      SELECT c.cp,
             (SELECT cum_n FROM cum WHERE p = c.cp) AS big_n,
             (SELECT CAST(count(*) AS BIGINT) FROM firsts
              WHERE fp <= c.cp) AS v
      FROM cps c
    ),
    xy AS (
      SELECT round(ln(CAST(big_n AS DOUBLE)), 12) AS x,
             round(ln(CAST(v AS DOUBLE)), 12) AS y
      FROM pts
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             list_reduce(list_sort(list(x)), (a, b) -> a + b) AS sx,
             list_reduce(list_sort(list(y)), (a, b) -> a + b) AS sy,
             list_reduce(list_sort(list(x * y)), (a, b) -> a + b) AS sxy,
             list_reduce(list_sort(list(x * x)), (a, b) -> a + b) AS sxx
      FROM xy
    )
    SELECT n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
             AS heaps_beta,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 9) AS heaps_lnk
    FROM s
    """,
)
def text_heaps_bigram_fit(spark: SparkSession, sf: str) -> DataFrame:
    """HEAPS'-LAW fit V(N) = K·N^β over BIGRAM types: vocabulary-growth
    checkpoints at corpus deciles (documents in md5(doc_id) order — a
    deterministic shuffle of arrival order), log-log OLS via the same
    pre-rounded sorted-fold device as text_zipf_fit. β far below the
    one seen on held-out text flags vocabulary saturation (template
    floods); the K/β pair also forecasts unique-type storage for
    tokenizer and dedup-index sizing. First-occurrence positions are
    one groupBy(min); checkpoint lookups are 10-row broadcasts."""
    d = load(spark, sf, "documents")
    worder = Window.orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    docs = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("t"),
        F.row_number().over(worder).cast("long").alias("p"),
    )
    docs = docs.localCheckpoint(eager=False)  # cum + grams
    cum = docs.select(
        "p",
        F.sum(F.size("t").cast("long"))
        .over(
            Window.orderBy("p").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long")
        .alias("cum_n"),
    )
    cum = cum.localCheckpoint(eager=False)  # n_docs + checkpoint join
    n_docs = cum.agg(F.max("p").alias("n_docs"))
    grams = explode_strict(
        docs.filter(F.size("t") >= 2),
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ',"
                " element_at(t, i + 1)))"
            )
        ),
        "g",
        keep=("p",),
    )
    firsts = grams.groupBy("g").agg(F.min("p").cast("long").alias("fp"))
    cps = (
        n_docs.crossJoin(
            F.broadcast(
                spark.range(1, 11).select(F.col("id").alias("k"))
            )
        )
        .select(
            F.expr("(n_docs * k + 9) div 10").cast("long").alias("cp")
        )
        .distinct()
    )
    cps = cps.localCheckpoint(eager=False)  # two joins
    pts = (
        cps.join(cum, cps.cp == cum.p)
        .select("cp", F.col("cum_n").alias("big_n"))
        .join(
            firsts.join(F.broadcast(cps), firsts.fp <= cps.cp)
            .groupBy("cp")
            .agg(F.count(F.lit(1)).cast("long").alias("v")),
            "cp",
        )
    )
    xy = pts.select(
        F.round(F.log(F.col("big_n").cast("double")), 12).alias("x"),
        F.round(F.log(F.col("v").cast("double")), 12).alias("y"),
    )

    def fold(col: F.Column) -> F.Column:
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    s = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fold(F.col("x")).alias("sx"),
        fold(F.col("y")).alias("sy"),
        fold(F.col("x") * F.col("y")).alias("sxy"),
        fold(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "n",
        F.round(slope, 9).alias("heaps_beta"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 9
        ).alias("heaps_lnk"),
    )




@query(
    "text_rbo_vocab_overlap",
    oracle=f"""
    WITH wc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY source, w
    ),
    ranked AS (
      SELECT source, w,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY freq DESC, w) AS BIGINT) AS rnk
      FROM wc
    ),
    pair AS (
      SELECT a.w, a.rnk AS ra, b.rnk AS rb
      FROM (SELECT * FROM ranked WHERE source = 'src0'
            AND rnk <= {_RBO_D}) a
      JOIN (SELECT * FROM ranked WHERE source = 'src1'
            AND rnk <= {_RBO_D}) b ON a.w = b.w
    ),
    depths AS (
      SELECT d.d,
             CAST((SELECT count(*) FROM pair
                   WHERE greatest(ra, rb) <= d.d) AS BIGINT) AS overlap
      FROM unnest(range(1, {_RBO_D + 1})) AS d(d)
    )
    SELECT CAST(max(overlap) AS BIGINT) AS overlap_at_50,
           round(list_reduce(list_sort(list(
                   overlap * ({_RBO_W_SQL})[d])), (a, b) -> a + b), 9)
             AS rbo_ub
    FROM depths
    """,
)
def text_rbo_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """RANK-BIASED OVERLAP (Webber et al. 2010, p=0.9, truncated at
    depth 50) between two sources' frequency-ranked vocabularies —
    the top-weighted list-similarity measure for comparing rankings
    that plain Jaccard treats as flat sets (two sources can share
    90% of vocabulary yet order it completely differently). Overlap
    counts at each depth are exact integers; the geometric weights
    (1−p)·p^(d−1)/d are python literals injected into BOTH engines
    and the 50 weighted terms fold sorted — the Goertzel-table
    discipline applied to IR weighting. Full (freq, word) tiebreaks
    make both rankings total."""
    d = load(spark, sf, "documents")
    wc = (
explode_strict(
        d, F.split(F.col("text"), " "), "w", keep=("source",)
    )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("w")
    )
    ranked = wc.select(
        "source", "w", F.row_number().over(wr).cast("long").alias("rnk")
    ).filter(F.col("rnk") <= _RBO_D)
    a = ranked.filter(F.col("source") == "src0").select(
        "w", F.col("rnk").alias("ra")
    )
    b = ranked.filter(F.col("source") == "src1").select(
        "w", F.col("rnk").alias("rb")
    )
    pair = a.join(b, "w").select(
        F.greatest("ra", "rb").alias("rmax")
    )
    depths = (
        F.broadcast(
            spark.range(1, _RBO_D + 1).select(
                F.col("id").cast("long").alias("d")
            )
        )
        .join(pair, F.col("rmax") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("rmax").cast("long").alias("overlap"))
    )
    warr = F.array(*[F.lit(w) for w in _RBO_W])
    weighted = depths.select(
        "overlap",
        (
            F.col("overlap")
            * F.element_at(warr, F.col("d").cast("int"))
        ).alias("term"),
    )
    return weighted.agg(
        F.max("overlap").cast("long").alias("overlap_at_50"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("term")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ).alias("rbo_ub"),
    )




@query(
    "text_richness_panel",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    types AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    per AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dis
      FROM types GROUP BY source
    )
    SELECT source, n_tokens, n_types, n_hapax, n_dis,
           round(n_types / sqrt(CAST(n_tokens AS DOUBLE)), 9) AS guiraud_r,
           round(ln(CAST(n_types AS DOUBLE))
                 / ln(CAST(n_tokens AS DOUBLE)), 9) AS herdan_c,
           CASE WHEN n_hapax < n_types
                THEN round(100.0 * ln(CAST(n_tokens AS DOUBLE))
                           / (1.0 - CAST(n_hapax AS DOUBLE) / n_types), 9)
           END AS honore_r,
           round(CAST(n_dis AS DOUBLE) / n_types, 9) AS sichel_s
    FROM per
    """,
)
def text_richness_panel(spark: SparkSession, sf: str) -> DataFrame:
    """VOCABULARY-RICHNESS PANEL per source — the four classic
    length-corrected lexical diversity constants side by side:
    Guiraud's R = V/√N, Herdan's C = lnV/lnN, Honoré's R = 100·lnN/
    (1 − V₁/V) (hapax-sensitive; NULL when every type is a hapax),
    and Sichel's S = V₂/V (dislegomena share). Together with the
    Yule's K / MATTR / hapax ops already in the catalog this closes
    the stylometric fingerprint family — the per-source mix audit
    for 'did this source's vocabulary collapse after dedup'. All
    spectrum counts are exact BIGINTs off ONE token groupBy; each
    constant is a single mirrored double expression, round 9."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, F.split(F.col("text"), " "), "w", keep=("source",)
    )
    types = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    per = types.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dis"),
    )
    nt = F.col("n_tokens").cast("double")
    nv = F.col("n_types").cast("double")
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        "n_dis",
        F.round(nv / F.sqrt(nt), 9).alias("guiraud_r"),
        F.round(F.log(nv) / F.log(nt), 9).alias("herdan_c"),
        F.when(
            F.col("n_hapax") < F.col("n_types"),
            F.round(
                F.lit(100.0)
                * F.log(nt)
                / (F.lit(1.0) - F.col("n_hapax").cast("double") / nv),
                9,
            ),
        ).alias("honore_r"),
        F.round(F.col("n_dis").cast("double") / nv, 9).alias("sichel_s"),
    )




@query(
    "text_char_entropy_by_source",
    oracle="""
    WITH chars AS (
      SELECT source, substr(text, CAST(i AS INT), 1) AS ch
      FROM documents,
           unnest(range(1, length(text) + 1)) AS s(i)
    ),
    cnt AS (
      SELECT source, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars GROUP BY source, ch
    ),
    tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct_chars
      FROM cnt GROUP BY source
    ),
    terms AS (
      SELECT cnt.source,
             round((CAST(c AS DOUBLE) / n)
                   * ln(CAST(c AS DOUBLE) / n), 12) AS term
      FROM cnt JOIN tot ON cnt.source = tot.source
    )
    SELECT t.source, tot.n AS n_chars, tot.n_distinct_chars,
           round(-list_reduce(list_sort(list(t.term)), (a, b) -> a + b), 9)
             AS char_entropy_nats
    FROM terms t JOIN tot ON t.source = tot.source
    GROUP BY t.source, tot.n, tot.n_distinct_chars
    """,
)
def text_char_entropy_by_source(
    spark: SparkSession, sf: str
) -> DataFrame:
    """CHARACTER-UNIGRAM ENTROPY per source — the encoding-level mix
    fingerprint (mojibake, base64 blobs, and template boilerplate all
    shift it) complementing the word-level bigram entropy rate. The
    per-character explode is expressed identically on both engines
    (substr over a 1..len index — Spark `sequence`/`posexplode` ≡
    DuckDB `unnest(range(...))`); character counts are exact BIGINTs
    over a ~30-symbol domain, and the −Σp·ln p terms are pre-rounded
    at 12 and folded SORTED (the KL-divergence device), round 9. Two
    map-combinable groupBys; the explode fan-out is linear in corpus
    bytes."""
    d = load(spark, sf, "documents")
    chars = explode_strict(
        d,
        F.expr(
            "transform(sequence(1, length(text)),"
            " i -> substring(text, i, 1))"
        ),
        "ch",
        keep=("source",),
    )
    cnt = chars.groupBy("source", "ch").agg(F.count(F.lit(1)).alias("c"))
    cnt = cnt.localCheckpoint(eager=False)  # consumed twice
    tot = cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
    )
    p = F.col("c").cast("double") / F.col("n")
    terms = cnt.join(tot, "source").select(
        "source", "n", "n_distinct_chars",
        F.round(p * F.log(p), 12).alias("term"),
    )
    return terms.groupBy("source", "n", "n_distinct_chars").agg(
        F.round(
            -F.aggregate(
                F.array_sort(F.collect_list("term")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ).alias("char_entropy_nats")
    ).select(
        "source",
        F.col("n").alias("n_chars"),
        "n_distinct_chars",
        "char_entropy_nats",
    )




@query(
    "text_gunning_fog",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS sents
      FROM documents
    ),
    c AS (
      SELECT doc_id, sents,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(len(list_filter(
               [len(regexp_extract_all(lower(x), '[aeiouy]+'))
                for x in ws],
               s -> s >= 3)) AS BIGINT) AS n_complex
      FROM w
    )
    SELECT doc_id, n_words, CAST(sents AS BIGINT) AS n_sentences,
           n_complex,
           round(0.4 * (CAST(n_words AS DOUBLE) / sents
                        + 100.0 * n_complex / n_words), 9) AS fog_index
    FROM c
    """,
)
def text_gunning_fog(spark: SparkSession, sf: str) -> DataFrame:
    """GUNNING FOG INDEX per document — 0.4·(words/sentences +
    100·complex/words) with 'complex' = ≥3 vowel-group syllables
    (the same backreference-free `[aeiouy]+` heuristic as the Flesch
    op, applied per word through a higher-order array expression —
    no explode). The second of the two canonical readability scores;
    disagreement between Fog and Flesch flags syllable-heuristic-
    sensitive documents worth a human look. Counts exact BIGINTs,
    the index one mirrored double (round 9); pure row-local
    whole-stage-codegen work, no shuffle."""
    d = load(spark, sf, "documents")
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]")), F.lit(1)
    ).cast("long")
    n_complex = F.expr(
        "cast(size(filter(transform(split(text, ' '),"
        " x -> regexp_count(lower(x), '[aeiouy]+')),"
        " s -> s >= 3)) as bigint)"
    )
    fog = F.lit(0.4) * (
        n_words.cast("double") / n_sent
        + F.lit(100.0) * n_complex / n_words
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_complex.alias("n_complex"),
        F.round(fog, 9).alias("fog_index"),
    )




@query(
    "text_tfidf_source_signatures",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tf AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY source, w
    ),
    df AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
    ),
    ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n FROM tf),
    scored AS (
      SELECT t.source, t.w, t.tf, d.df,
             round(t.tf * ln((ns.n + 1.0) / (d.df + 1.0)), 9) AS tfidf
      FROM tf t JOIN df d ON d.w = t.w, ns
    )
    SELECT source, w AS term, tf, df,
           tfidf,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY tfidf DESC, w) AS BIGINT) AS rk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY source
              ORDER BY tfidf DESC, w) <= 5
    """,
)
def text_tfidf_source_signatures(
    spark: SparkSession, sf: str
) -> DataFrame:
    """TF-IDF SOURCE SIGNATURES — each source's 5 most
    source-distinctive terms under smoothed idf ln((N+1)/(df+1)) with
    sources as the 'documents': the at-a-glance corpus-mix label
    (what IS src7 about?) and the drift anchor a weekly diff watches.
    Counts exact BIGINTs off one token groupBy; tf·idf is one
    mirrored expression (round 9) feeding a full-tiebreak top-5
    window over the source-bounded score table. The df side is
    vocabulary-bounded — the same inverted-index economics as the
    tf-idf/BM25 ops."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, F.split(F.col("text"), " "), "w", keep=("source",)
    )
    tf = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)  # consumed thrice
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ns = tf.agg(F.countDistinct("source").alias("n"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "w",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                ),
                9,
            ).alias("tfidf"),
        )
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("w")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("source", F.col("w").alias("term"), "tf", "df", "tfidf", "rk")
    )




@query(
    "text_word_length_histogram",
    oracle="""
    WITH w AS (
      SELECT source, length(unnest(string_split(text, ' '))) AS wl
      FROM documents
    ),
    cells AS (
      SELECT source, CAST(least(wl, 15) AS BIGINT) AS word_len,
             CAST(count(*) AS BIGINT) AS n_words
      FROM w GROUP BY source, least(wl, 15)
    )
    SELECT source, word_len, n_words,
           round(CAST(n_words AS DOUBLE)
                 / sum(n_words) OVER (PARTITION BY source), 9) AS share
    FROM cells
    """,
)
def text_word_length_histogram(
    spark: SparkSession, sf: str
) -> DataFrame:
    """WORD-LENGTH HISTOGRAM per source (capped at 15+) — the cheapest
    tokenizer-health fingerprint: a source whose length mass shifts
    is emitting concatenated/unsplit tokens (or a different language)
    long before quality scores move; per-source shares make the
    sources comparable. One explode + map-combinable groupBy over a
    15-bucket domain, a dim-sized share window."""
    d = load(spark, sf, "documents")
    w = explode_strict(
        d, F.split(F.col("text"), " "), "tok", keep=("source",)
    ).select(
        "source",
        F.least(F.length("tok"), F.lit(15)).cast("long").alias(
            "word_len"
        ),
    )
    cells = w.groupBy("source", "word_len").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    ws = Window.partitionBy("source")
    return cells.select(
        "source",
        "word_len",
        F.col("n_words").cast("long").alias("n_words"),
        F.round(
            F.col("n_words").cast("double") / F.sum("n_words").over(ws),
            9,
        ).alias("share"),
    )




@query(
    "text_nb_lang_classifier",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS m
      FROM tok GROUP BY doc_id, lang, w
    ),
    cnt AS (
      SELECT lang AS clang, w, CAST(count(*) AS BIGINT) AS n_wl
      FROM tok GROUP BY lang, w
    ),
    tot AS (
      SELECT clang, CAST(sum(n_wl) AS BIGINT) AS n_l FROM cnt GROUP BY clang
    ),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM tok),
    nl AS (
      SELECT lang AS clang, CAST(count(*) AS BIGINT) AS n_docs_l
      FROM documents GROUP BY lang
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    terms AS (
      SELECT m.doc_id, m.lang, nl.clang,
             round(m.m * round(ln(CAST(coalesce(cnt.n_wl, 0) + 1 AS DOUBLE)
                                   / (tot.n_l + v.vocab)), 12), 12) AS t
      FROM m
      CROSS JOIN nl
      LEFT JOIN cnt ON cnt.clang = nl.clang AND cnt.w = m.w
      JOIN tot ON tot.clang = nl.clang
      CROSS JOIN v
    ),
    scores AS (
      SELECT terms.doc_id, terms.lang, terms.clang,
             round(round(ln(CAST(nl.n_docs_l AS DOUBLE) / nt.n_docs), 12)
                   + list_reduce(list_sort(list(t)), (a, b) -> a + b),
                   9) AS score
      FROM terms
      JOIN nl ON nl.clang = terms.clang
      CROSS JOIN nt
      GROUP BY terms.doc_id, terms.lang, terms.clang, nl.n_docs_l,
               nt.n_docs
    ),
    pred AS (
      SELECT doc_id, lang, clang,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, clang ASC
             ) AS rk
      FROM scores
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN clang = lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(CAST(sum(CASE WHEN clang = lang THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*), 9) AS accuracy
    FROM pred WHERE rk = 1 GROUP BY lang
    """,
)
def text_nb_lang_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """TRAINED MULTINOMIAL NAIVE BAYES language classifier — train on
    the whole corpus (Laplace-smoothed token likelihoods + doc priors,
    all exact BIGINT counts), score every document against every
    class, and report per-language train accuracy: the fastText-style
    quality/language gate of a curation pipeline expressed as pure
    relational algebra, with the ENTIRE training loop inside the
    engine (no driver state — counts are two groupBys, scoring is a
    blocked join against the 5-row class table). Mirrored floats via
    the established ladder: ln terms pre-round at 12, per-(doc,class)
    fold SORTED, score round 9, argmax with the (score DESC, class
    ASC) total tiebreak. At 100 TB the token-class count table
    partitions by token and the doc-term join is the same
    shuffle-on-w equi-join the PMI/TF-IDF family already runs."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, F.split(F.trim("text"), r"\s+"), "w", keep=("doc_id", "lang",)
    )
    m = tok.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    cnt = tok.groupBy(F.col("lang").alias("clang"), "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_wl")
    )
    tot = cnt.groupBy("clang").agg(F.sum("n_wl").alias("n_l"))
    v = tok.agg(F.countDistinct("w").cast("long").alias("vocab"))
    nl = d.groupBy(F.col("lang").alias("clang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_l")
    )
    nt = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    grid = m.crossJoin(F.broadcast(nl.select("clang")))
    j = (
        grid.join(cnt, ["clang", "w"], "left")
        .join(F.broadcast(tot), "clang")
        .crossJoin(F.broadcast(v))
    )
    loglik = F.round(
        F.log(
            (F.coalesce(F.col("n_wl"), F.lit(0)) + 1).cast("double")
            / (F.col("n_l") + F.col("vocab"))
        ),
        12,
    )
    terms = j.select(
        "doc_id", "lang", "clang", F.round(F.col("m") * loglik, 12).alias("t")
    )
    fold = F.aggregate(
        F.array_sort(F.collect_list("t")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    prior = F.round(
        F.log(F.col("n_docs_l").cast("double") / F.col("n_docs")), 12
    )
    scores = (
        terms.groupBy("doc_id", "lang", "clang")
        .agg(fold.alias("s"))
        .join(F.broadcast(nl), "clang")
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id", "lang", "clang",
            F.round(prior + F.col("s"), 9).alias("score"),
        )
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("clang").asc()
    )
    pred = scores.withColumn("rk", F.row_number().over(w_pred)).filter(
        F.col("rk") == 1
    )
    hit = F.when(F.col("clang") == F.col("lang"), 1).otherwise(0)
    return pred.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count(F.lit(1)), 9
        ).alias("accuracy"),
    )




@query(
    "text_nb_per_class_f1",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS m
      FROM tok GROUP BY doc_id, lang, w
    ),
    cnt AS (
      SELECT lang AS clang, w, CAST(count(*) AS BIGINT) AS n_wl
      FROM tok GROUP BY lang, w
    ),
    tot AS (
      SELECT clang, CAST(sum(n_wl) AS BIGINT) AS n_l FROM cnt GROUP BY clang
    ),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM tok),
    nl AS (
      SELECT lang AS clang, CAST(count(*) AS BIGINT) AS n_docs_l
      FROM documents GROUP BY lang
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    terms AS (
      SELECT m.doc_id, m.lang, nl.clang,
             round(m.m * round(ln(CAST(coalesce(cnt.n_wl, 0) + 1 AS DOUBLE)
                                   / (tot.n_l + v.vocab)), 12), 12) AS t
      FROM m
      CROSS JOIN nl
      LEFT JOIN cnt ON cnt.clang = nl.clang AND cnt.w = m.w
      JOIN tot ON tot.clang = nl.clang
      CROSS JOIN v
    ),
    scores AS (
      SELECT terms.doc_id, terms.lang, terms.clang,
             round(round(ln(CAST(nl.n_docs_l AS DOUBLE) / nt.n_docs), 12)
                   + list_reduce(list_sort(list(t)), (a, b) -> a + b),
                   9) AS score
      FROM terms
      JOIN nl ON nl.clang = terms.clang
      CROSS JOIN nt
      GROUP BY terms.doc_id, terms.lang, terms.clang, nl.n_docs_l,
               nt.n_docs
    ),
    pred AS (
      SELECT doc_id, lang, clang AS pred_lang
      FROM (SELECT doc_id, lang, clang,
                   row_number() OVER (
                     PARTITION BY doc_id ORDER BY score DESC, clang ASC
                   ) AS rk
            FROM scores)
      WHERE rk = 1
    ),
    per AS (
      SELECT nl.clang AS lang,
             (SELECT CAST(count(*) AS BIGINT) FROM pred p
              WHERE p.lang = nl.clang AND p.pred_lang = nl.clang) AS tp,
             (SELECT CAST(count(*) AS BIGINT) FROM pred p
              WHERE p.lang = nl.clang) AS support,
             (SELECT CAST(count(*) AS BIGINT) FROM pred p
              WHERE p.pred_lang = nl.clang) AS predicted
      FROM nl
    )
    SELECT lang, support, predicted, tp,
           round(CASE WHEN predicted = 0 THEN 0.0
                      ELSE CAST(tp AS DOUBLE) / predicted END, 9)
             AS precision_,
           round(CAST(tp AS DOUBLE) / support, 9) AS recall_,
           round(CASE WHEN tp = 0 THEN 0.0
                      ELSE 2.0 * tp / (predicted + support) END, 9)
             AS f1
    FROM per
    """,
)
def text_nb_per_class_f1(spark: SparkSession, sf: str) -> DataFrame:
    """PER-CLASS PRECISION / RECALL / F1 for the engine-trained NB
    language classifier — the evaluation half of
    ``text_nb_lang_classifier`` (train accuracy alone hides the
    minority-class collapse that per-class F1 exposes; here the en
    prior dominates and the small langs pay for it, exactly the
    readout a curation gate needs before trusting the lang filter).
    Same fully-relational train+score pipeline, then tp/support/
    predicted as exact BIGINTs and the P/R/F1 ladder as single
    mirrored divisions (F1 = 2·tp/(pred+sup) — the harmonic identity
    that avoids a P·R/(P+R) float chain), round 9."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, F.split(F.trim("text"), r"\s+"), "w", keep=("doc_id", "lang",)
    )
    m = tok.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    cnt = tok.groupBy(F.col("lang").alias("clang"), "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_wl")
    )
    tot = cnt.groupBy("clang").agg(F.sum("n_wl").alias("n_l"))
    v = tok.agg(F.countDistinct("w").cast("long").alias("vocab"))
    nl = d.groupBy(F.col("lang").alias("clang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_l")
    )
    nt = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    grid = m.crossJoin(F.broadcast(nl.select("clang")))
    j = (
        grid.join(cnt, ["clang", "w"], "left")
        .join(F.broadcast(tot), "clang")
        .crossJoin(F.broadcast(v))
    )
    loglik = F.round(
        F.log(
            (F.coalesce(F.col("n_wl"), F.lit(0)) + 1).cast("double")
            / (F.col("n_l") + F.col("vocab"))
        ),
        12,
    )
    terms = j.select(
        "doc_id", "lang", "clang", F.round(F.col("m") * loglik, 12).alias("t")
    )
    fold = F.aggregate(
        F.array_sort(F.collect_list("t")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    prior = F.round(
        F.log(F.col("n_docs_l").cast("double") / F.col("n_docs")), 12
    )
    scores = (
        terms.groupBy("doc_id", "lang", "clang")
        .agg(fold.alias("s"))
        .join(F.broadcast(nl), "clang")
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id", "lang", "clang",
            F.round(prior + F.col("s"), 9).alias("score"),
        )
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("clang").asc()
    )
    pred = (
        scores.withColumn("rk", F.row_number().over(w_pred))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("clang").alias("pred_lang"))
    )
    pred = pred.localCheckpoint(eager=False)  # consumed three ways
    sup = pred.groupBy(F.col("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    prd = pred.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("predicted")
    )
    tp = (
        pred.filter(F.col("lang") == F.col("pred_lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
    )
    per = (
        nl.select(F.col("clang").alias("lang"))
        .join(sup, "lang", "left")
        .join(prd, "lang", "left")
        .join(tp, "lang", "left")
        .select(
            "lang",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    return per.select(
        "lang", "support", "predicted", "tp",
        F.round(
            F.when(F.col("predicted") == 0, F.lit(0.0)).otherwise(
                F.col("tp").cast("double") / F.col("predicted")
            ),
            9,
        ).alias("precision_"),
        F.round(F.col("tp").cast("double") / F.col("support"), 9).alias(
            "recall_"
        ),
        F.round(
            F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
                2.0 * F.col("tp") / (F.col("predicted") + F.col("support"))
            ),
            9,
        ).alias("f1"),
    )




@query(
    "text_nb_margin_reliability",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS m
      FROM tok GROUP BY doc_id, lang, w
    ),
    cnt AS (
      SELECT lang AS clang, w, CAST(count(*) AS BIGINT) AS n_wl
      FROM tok GROUP BY lang, w
    ),
    tot AS (
      SELECT clang, CAST(sum(n_wl) AS BIGINT) AS n_l FROM cnt GROUP BY clang
    ),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM tok),
    nl AS (
      SELECT lang AS clang, CAST(count(*) AS BIGINT) AS n_docs_l
      FROM documents GROUP BY lang
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    terms AS (
      SELECT m.doc_id, m.lang, nl.clang,
             round(m.m * round(ln(CAST(coalesce(cnt.n_wl, 0) + 1 AS DOUBLE)
                                   / (tot.n_l + v.vocab)), 12), 12) AS t
      FROM m
      CROSS JOIN nl
      LEFT JOIN cnt ON cnt.clang = nl.clang AND cnt.w = m.w
      JOIN tot ON tot.clang = nl.clang
      CROSS JOIN v
    ),
    scores AS (
      SELECT terms.doc_id, terms.lang, terms.clang,
             round(round(ln(CAST(nl.n_docs_l AS DOUBLE) / nt.n_docs), 12)
                   + list_reduce(list_sort(list(t)), (a, b) -> a + b),
                   9) AS score
      FROM terms
      JOIN nl ON nl.clang = terms.clang
      CROSS JOIN nt
      GROUP BY terms.doc_id, terms.lang, terms.clang, nl.n_docs_l,
               nt.n_docs
    ),
    ranked AS (
      SELECT doc_id, lang, clang, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, clang ASC
             ) AS rk
      FROM scores
    ),
    docs AS (
      SELECT a.doc_id,
             CASE WHEN a.clang = a.lang THEN 1 ELSE 0 END AS hit,
             round(a.score - b.score, 9) AS margin
      FROM ranked a JOIN ranked b
        ON b.doc_id = a.doc_id AND a.rk = 1 AND b.rk = 2
    ),
    buck AS (
      SELECT hit, margin,
             ntile(5) OVER (ORDER BY margin ASC, doc_id ASC) AS q
      FROM docs
    )
    SELECT q AS margin_quintile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(margin), 9) AS min_margin,
           round(max(margin), 9) AS max_margin,
           round(CAST(sum(hit) AS DOUBLE) / count(*), 9) AS accuracy
    FROM buck GROUP BY q
    """,
)
def text_nb_margin_reliability(
    spark: SparkSession, sf: str
) -> DataFrame:
    """CONFIDENCE CALIBRATION of the engine-trained NB classifier via
    score MARGINS — accuracy per quintile of the top1−top2 log-score
    gap: a rising curve says the margin is a usable confidence signal
    (keep high-margin docs, route low-margin ones to a stronger
    model — the cascade-routing decision every lang/quality gate
    makes); a flat curve says thresholding on it is theater. The
    margin is a DIFFERENCE of two already-mirrored rounded-9 scores —
    no softmax, so no cross-engine exp() hazard — and quintiles use
    the (margin, doc_id) total order. Same relational train+score
    pipeline; the extra cost is one self-join on the rank pair.

    Scale note (STRESS.md r12): the quintile bucketing originally ran
    a GLOBAL ordered ntile (one task sorts every margin row — exp 0.52
    at K=10, the family's steepest); it now uses
    functions.ranks.ranked_ntile — range-sharded local ranks + an
    offset table — which is bit-identical to SQL NTILE (the oracle is
    unchanged) with no single-partition row sort."""
    d = load(spark, sf, "documents")
    tok = explode_strict(
        d, F.split(F.trim("text"), r"\s+"), "w", keep=("doc_id", "lang",)
    )
    m = tok.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    cnt = tok.groupBy(F.col("lang").alias("clang"), "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_wl")
    )
    tot = cnt.groupBy("clang").agg(F.sum("n_wl").alias("n_l"))
    v = tok.agg(F.countDistinct("w").cast("long").alias("vocab"))
    nl = d.groupBy(F.col("lang").alias("clang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_l")
    )
    nt = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    grid = m.crossJoin(F.broadcast(nl.select("clang")))
    j = (
        grid.join(cnt, ["clang", "w"], "left")
        .join(F.broadcast(tot), "clang")
        .crossJoin(F.broadcast(v))
    )
    loglik = F.round(
        F.log(
            (F.coalesce(F.col("n_wl"), F.lit(0)) + 1).cast("double")
            / (F.col("n_l") + F.col("vocab"))
        ),
        12,
    )
    terms = j.select(
        "doc_id", "lang", "clang", F.round(F.col("m") * loglik, 12).alias("t")
    )
    fold = F.aggregate(
        F.array_sort(F.collect_list("t")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    prior = F.round(
        F.log(F.col("n_docs_l").cast("double") / F.col("n_docs")), 12
    )
    scores = (
        terms.groupBy("doc_id", "lang", "clang")
        .agg(fold.alias("s"))
        .join(F.broadcast(nl), "clang")
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id", "lang", "clang",
            F.round(prior + F.col("s"), 9).alias("score"),
        )
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("clang").asc()
    )
    ranked = scores.withColumn("rk", F.row_number().over(w_pred))
    ranked = ranked.localCheckpoint(eager=False)  # consumed twice
    a = ranked.filter(F.col("rk") == 1).select(
        "doc_id",
        F.when(F.col("clang") == F.col("lang"), 1).otherwise(0).alias("hit"),
        F.col("score").alias("s1"),
    )
    b = ranked.filter(F.col("rk") == 2).select(
        "doc_id", F.col("score").alias("s2")
    )
    docs = a.join(b, "doc_id").select(
        "doc_id", "hit", F.round(F.col("s1") - F.col("s2"), 9).alias("margin")
    )
    from ..functions.ranks import ranked_ntile

    buck = ranked_ntile(
        docs, [F.col("margin").asc(), F.col("doc_id").asc()], 5, out_col="q"
    )
    return buck.groupBy(F.col("q").alias("margin_quintile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.min("margin"), 9).alias("min_margin"),
        F.round(F.max("margin"), 9).alias("max_margin"),
        F.round(
            F.sum("hit").cast("double") / F.count(F.lit(1)), 9
        ).alias("accuracy"),
    )


__all__ = sorted(n for n in dir() if not n.startswith("__"))
