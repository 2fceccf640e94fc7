"""Text-analysis operators for LLM-data pipelines.

All hot-path expressions are JVM-side higher-order functions
(``split`` / ``filter`` / ``transform`` / ``aggregate``) — no Python
UDFs — so they stay inside whole-stage codegen and scale linearly with
input splits (no shuffle at all except where noted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small public stopword samples per language (top function words).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}

# Deterministic language priority for arg-max ties.
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count (a cheap proxy for BPE): word runs plus
    individual non-word non-space chars. Match-extraction instead of
    lookaround splitting — verified equal on the corpus, and RE2-safe so
    an ANSI oracle can reproduce it (lookarounds aren't portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"\w+|[^\w\s]"), F.lit(0)))


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens that are in ``words`` (duplicates counted)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def with_text_stats(
    df: DataFrame, text_col: str = "text", stop_lang: str = "en"
) -> DataFrame:
    """Length / token / stopword / punctuation quality features.

    Ratios are raw IEEE divisions (bit-reproducible across engines).
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop = stopword_hits(toks, STOPWORDS[stop_lang])
    n_ch = F.length(F.col(text_col))
    n_punct = n_ch - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    return (
        df.withColumn("n_chars_calc", n_ch)
        .withColumn("n_tokens", n_tok)
        .withColumn("n_stopwords", stop)
        .withColumn("stopword_ratio", stop.cast("double") / n_tok)
        .withColumn("punct_ratio", n_punct.cast("double") / n_ch)
        .withColumn(
            "avg_token_len",
            (F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")))
            .cast("double")
            / n_tok,
        )
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Composite heuristic quality score in [0,1] (Gopher-rule flavor):
    rewards mid-length docs with some stopwords and low punctuation."""
    len_ok = F.when(
        (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(F.col("stopword_ratio") >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when(
        (F.col("avg_token_len") >= 2) & (F.col("avg_token_len") <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return df.withColumn(
        "quality_score", (len_ok + stop_ok + punct_ok + tok_ok) / F.lit(4.0)
    )


def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style per-document quality rules (Rae et al. 2021, public
    rule set), each as an independent boolean plus the conjunction:

    - ``flag_len``:     token count in [50, 100000]
    - ``flag_avg_len``: mean token length in [3, 10]
    - ``flag_alpha``:   >80% of tokens contain an ASCII letter
    - ``flag_stop``:    ≥2 (lowercased) English stopword hits
    - ``gopher_pass``:  all of the above

    All JVM higher-order expressions (no shuffle, no Python). Ratios
    are raw IEEE divisions so an ANSI twin reproduces boundary cases
    bit-for-bit.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    no_ws = F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
    avg_len = no_ws.cast("double") / n_tok
    alpha_ratio = alpha.cast("double") / n_tok
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("avg_token_len", avg_len)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stop_hits", stop.cast("long"))
        .withColumn("flag_len", (n_tok >= 50) & (n_tok <= 100000))
        .withColumn("flag_avg_len", (avg_len >= 3.0) & (avg_len <= 10.0))
        .withColumn("flag_alpha", alpha_ratio > 0.8)
        .withColumn("flag_stop", stop >= 2)
        .withColumn(
            "gopher_pass",
            F.col("flag_len")
            & F.col("flag_avg_len")
            & F.col("flag_alpha")
            & F.col("flag_stop"),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """N-gram-free heuristic language ID: arg-max of per-language
    stopword hit counts, 'und' (undetermined) when all zero.

    Deterministic tiebreak by LANG_PRIORITY order (strict > when
    comparing later languages)."""
    toks = tokens(text_col)
    hits = {lang: stopword_hits(toks, ws) for lang, ws in STOPWORDS.items()}
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # iterate in reverse priority so earlier languages win ties via >=
    for lang in reversed(LANG_PRIORITY):
        h = hits[lang]
        take = h >= F.greatest(best_hits, F.lit(1))
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(best_hits, h)
    return df.withColumn(out_col, best_lang)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: 64-bit rolling-hash analog —
    xxhash64 over the token-normalized text (whitespace collapsed,
    lowercased). Content-defined, whitespace-insensitive."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def md5_fingerprint(col: Column | str) -> Column:
    """Portable (ANSI-SQL-reproducible) fingerprint: md5 hex of the
    whitespace-normalized lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


# --- Segment-level cleaning (CCNet-style paragraph ops) ---------------------
#
# The reference corpus-curation recipe for web text removes (a)
# boilerplate lines that repeat across MANY documents (headers, nav
# bars, cookie banners) and (b) lines repeated WITHIN a document
# (templating loops). Documents here carry no newline structure, so the
# segment unit is a fixed-width token window — the operators are the
# same shapes: explode → frequency → anti-join → ordered reassembly.


def segment_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 3,
) -> DataFrame:
    """(id, seg_idx, segment): fixed-width token segments, JVM-side
    (split + transform + posexplode — no shuffle beyond the local
    spread, no Python)."""
    from ..util import posexplode_strict, spread

    df = spread(df)
    toks = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), F.greatest(nseg - 1, F.lit(0))),
        lambda i: F.array_join(
            F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
        ),
    )
    return posexplode_strict(
        df, segs, "seg_idx", "segment", keep=(F.col(id_col),)
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 3,
    max_doc_freq: int = 5,
) -> DataFrame:
    """Cross-document boilerplate removal: drop every segment that
    occurs in more than ``max_doc_freq`` DISTINCT documents, keep the
    rest in order. Returns (id, n_segments, n_removed, clean_text).

    100 TB shape: the segment explode is map-local; the document-
    frequency aggregate is the one corpus-wide shuffle (map-side
    combinable count-distinct via the (segment, id) pre-distinct); the
    boilerplate dictionary that survives the HAVING is tiny relative
    to the corpus (boilerplate is by definition few distinct strings)
    so the removal anti-join broadcasts. Reassembly groups by doc —
    partition-pruned if the corpus is already bucketed by id."""
    # lazy pin: the segment table feeds THREE branches (the df
    # aggregate, the anti-join, per-doc totals) — without it each
    # branch re-runs the split + transform + slice segmentation over
    # the corpus, and the tripled codegen surface alone measurably
    # degrades long-lived JVMs (r14: runs in one session went
    # 4.4 → 12 → 20 s)
    segs = segment_table(df, id_col, text_col, seg_tokens).localCheckpoint(
        eager=False
    )
    hot = (
        segs.select("segment", id_col)
        .distinct()
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("segment")
    )
    # r15: flag-and-fuse — one broadcast LEFT join marks hot segments,
    # then ONE groupBy(doc) computes totals, removed count and the
    # ordered rebuild together (collect_list skips the NULL structs the
    # `when` leaves on hot rows). Replaces two separate aggregation
    # passes over `segs` joined back on doc (guide §2.4: the totals
    # aggregate, the rebuilt aggregate and its broadcast exchange all
    # collapse into the one pass); a doc whose segments are all hot
    # yields _kept rows = [] → clean_text '' exactly like the old
    # left-join + coalesce.
    flagged = segs.join(
        F.broadcast(hot.withColumn("_hot", F.lit(True))),
        on="segment",
        how="left",
    )
    kept_seg = F.when(F.col("_hot").isNull(), F.struct("seg_idx", "segment"))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.count("_hot").cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_seg)),
                lambda s: s.segment,
            ),
            " ",
        ).alias("clean_text"),
    )


def dedup_intradoc_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 3,
) -> DataFrame:
    """Within-document repetition removal: keep each distinct segment's
    FIRST occurrence, preserving order. Returns (id, n_segments,
    n_intra_dups, dedup_text). One shuffle (by id for the window +
    reassembly — the window partitions by (id, segment) which the id
    shuffle already co-locates)."""
    # r15 fuse: the window output feeds ONE groupBy(doc) that computes
    # totals, the first-occurrence count and the ordered rebuild
    # together (collect_list skips the NULL structs `when` leaves on
    # repeat rows) — previously two aggregation passes over the segment
    # table joined back on doc (guide §2.4). With a single consumer the
    # segment-table pin is pure overhead and is dropped.
    segs = segment_table(df, id_col, text_col, seg_tokens)
    w = Window.partitionBy(id_col, "segment").orderBy("seg_idx")
    first = segs.withColumn("_rn", F.row_number().over(w))
    first_seg = F.when(F.col("_rn") == 1, F.struct("seg_idx", "segment"))
    return (
        first.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.count(first_seg).cast("long").alias("_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(first_seg)),
                    lambda s: s.segment,
                ),
                " ",
            ).alias("dedup_text"),
        )
        .select(
            id_col,
            "n_segments",
            (F.col("n_segments") - F.col("_kept")).cast("long").alias(
                "n_intra_dups"
            ),
            "dedup_text",
        )
    )


# --- Content-defined chunking (LBFS/Venti rolling-boundary style) -----------


def _md5_h32(col: Column) -> Column:
    """uint32 from the first 8 md5 hex chars — the engine-portable hash
    device (DuckDB: CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    modulus: int = 16,
) -> DataFrame:
    """Content-defined chunking (the LBFS/Venti rolling-boundary
    scheme, re-expressed relationally): a token position p ends a chunk
    iff the hash of the k-token window ending at p hits the boundary
    condition h % modulus == 0 — so chunk boundaries are a function of
    CONTENT, not offsets, and an insertion early in a document only
    perturbs the chunks it touches (the property fixed-size chunking
    lacks, and the reason storage/dedup pipelines use CDC). Expected
    chunk length ≈ modulus tokens.

    Returns (id, chunk_idx, chunk_start, n_tokens, chunk_hash) — the
    hash is md5 of the space-joined chunk text, so identical content
    slabs shared between documents chunk to identical hashes wherever
    the boundaries re-synchronize (within k·modulus tokens of an edit,
    in expectation).

    Scale shape: the boundary flags are a JVM projection over the
    token array (zip-of-k-shifted-slices, same device as
    dedup._window_hashes); the cumulative chunk index is ONE
    doc-partitioned window pass and the chunk assembly ONE
    (doc, chunk) groupBy — both bounded by document length, with no
    corpus-wide shuffle at all (cross-doc dedup of the resulting
    chunk hashes is the caller's one groupBy). The md5 device keeps
    every boundary decision reproducible in ANSI SQL."""
    from ..util import spread

    base = spread(df).select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_t")
    )
    sz = F.size(F.col("_t"))
    # window ending at position e (0-based) exists for e >= k-1; its
    # string is tokens[e-k+1 .. e]. Build per-END-position flags.
    zipped = F.arrays_zip(
        *[F.slice(F.col("_t"), i + 1, sz - F.lit(k - 1)) for i in range(k)]
    )
    win_str = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])
    )
    # flags[e] for e in 0..n-1: first k-1 positions can't end a window
    flags = F.concat(
        F.array_repeat(F.lit(0), k - 1),
        F.transform(
            win_str,
            lambda w: F.when(_md5_h32(w) % modulus == 0, F.lit(1)).otherwise(
                F.lit(0)
            ),
        ),
    )
    from ..util import posexplode_strict

    toks = posexplode_strict(
        base,
        F.arrays_zip(F.col("_t").alias("tok"), flags.alias("f")),
        "pos",
        "z",
        keep=("_id",),
    ).select(
        "_id", "pos", F.col("z.tok").alias("tok"), F.col("z.f").alias("f")
    )
    w = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = toks.withColumn(
        "chunk_idx", F.coalesce(F.sum("f").over(w), F.lit(0)).cast("long")
    )
    return (
        toks.groupBy("_id", "chunk_idx")
        .agg(
            F.min("pos").alias("chunk_start"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_hash"),
        )
        .select(
            F.col("_id").alias(id_col),
            "chunk_idx",
            "chunk_start",
            "n_tokens",
            "chunk_hash",
        )
    )
