"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; the GPT-2
tokenizer's training loop) — the tokenizer-fitting step of an LLM data
pipeline, expressed Spark-first.

The critical scale observation: after ONE corpus pass builds the
word-frequency table, every BPE iteration operates on that VOCAB-sized
table (10⁵–10⁶ distinct words at 100 TB, regardless of corpus size).
The corpus is never touched again, so training cost is
O(corpus one pass + n_merges × vocab) — the same shape every
production BPE trainer (fastBPE, HuggingFace tokenizers) exploits,
here with the vocab table distributed instead of in one process's
memory.

Representation: a word's symbol sequence is kept as a single string
with every symbol wrapped in its own spaces — ``"low"`` →
``" l  o  w "``. Merging pair (a, b) is then plain
``replace(r, ' a  b ', ' ab ')``: because each symbol carries its own
boundary spaces, consecutive merge sites never share characters, so
the engine's standard left-to-right non-overlapping ``replace`` both
in Spark and in DuckDB applies the merge to every site in one call
(the classic " a b a b " overlap bug cannot occur). That keeps the
whole loop in JVM string expressions — no Python, no UDF — and makes
the training loop expressible in pure SQL for the oracle twin.

No end-of-word marker is appended (byte/char-level BPE à la GPT-2
rather than Sennrich's ``</w>`` variant); merges never cross word
boundaries because each word is its own row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import explode_strict, spread
from .text import tokens


def bpe_word_freqs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass → ``(w, freq)`` word-frequency table (the only
    corpus-sized shuffle in BPE training; map-side combinable)."""
    return (
        explode_strict(spread(df), tokens(text_col), "w")
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _wrapped(word) -> F.Column:
    """``"low"`` → ``" l  o  w "`` (every symbol wrapped in its own
    spaces; see module docstring for why this defeats replace-overlap)."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.concat(F.lit(" "), F.concat_ws("  ", chars), F.lit(" "))


def _adjacent_pairs(s) -> F.Column:
    """Symbol array → array<struct<a,b>> of adjacent pairs."""
    return F.transform(
        F.slice(s, 1, F.size(s) - 1),
        lambda c, i: F.struct(
            c.alias("a"), F.element_at(s, i + F.lit(2)).alias("b")
        ),
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus:
    ``(merge_rank, lhs, rhs, merged, pair_count)``, rank 1 = first
    (most frequent) merge. Ties broken (count DESC, lhs ASC, rhs ASC)
    so training is deterministic on both engines.

    Each iteration over the vocab table: adjacent-pair counts (ONE
    groupBy, map-side combinable, weighted by word freq) → argmax pair
    via ``orderBy + limit(1) + collect()`` — a ONE-row driver collect
    per round, n_merges rows total, the same bounded-by-construction
    envelope as ``bpe_segment``'s merge-table collect (and far under
    the ≤4096-row centroid-sample precedent) → ``replace`` the pair in
    every word as a LITERAL expression. Round 13 switched the winner
    from localCheckpoint + broadcast-crossJoin to this bounded
    collect: the old form cost two jobs per round (eager checkpoint +
    isEmpty) plus a crossJoin node per round in the vocab lineage; a
    driver round-trip for one row costs one job and keeps the lineage
    a flat literal-replace chain — measured ~1.9× faster end-to-end at
    sf0.1 with bit-identical output (the argmax ordering is the same
    total order either way). The vocab table itself is checkpointed
    ONCE (eager) after the only corpus-sized pass; per-round work
    stays vocab-sized and distributed. Stops early when no pair
    remains (vocab fully merged)."""
    spark = df.sparkSession
    vocab = (
        bpe_word_freqs(df, text_col)
        .select("freq", _wrapped(F.col("w")).alias("r"))
        .localCheckpoint(eager=True)
    )
    rows: list[tuple] = []
    cur = vocab
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("r")), "  ")
        counts = (
            explode_strict(cur, _adjacent_pairs(syms), "p", keep=("freq",))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = counts.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).take(1)
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, best[0].cnt
        rows.append((rank, a, b, a + b, cnt))
        cur = cur.select(
            "freq",
            F.replace(
                F.col("r"),
                F.lit(f" {a}  {b} "),
                F.lit(f" {a}{b} "),
            ).alias("r"),
        )
    return spark.createDataFrame(
        rows,
        "merge_rank INT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count LONG",
    )


def bpe_segment(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merges (in rank order) to the corpus → per-doc
    BPE token count vs whitespace-word count:
    ``(doc_id, n_words, n_bpe_tokens)``. The merge table is tiny
    (n_merges rows) and is folded into ONE chained JVM replace
    expression via a bounded driver collect (n_merges rows — same
    bounded-by-construction envelope as the ≤4096-row centroid
    sample), so encoding is a single corpus map with zero joins."""
    ranked = sorted(
        merges.select("merge_rank", "lhs", "rhs").collect(),
        key=lambda r: r.merge_rank,
    )

    def _apply(col):
        e = col
        for m in ranked:
            e = F.replace(
                e,
                F.lit(" " + m.lhs + "  " + m.rhs + " "),
                F.lit(" " + m.lhs + m.rhs + " "),
            )
        return e

    words = tokens(text_col)
    # merges are applied PER WORD (inside the transform lambda) so a
    # word-final symbol can never merge with the next word's first
    per_word = F.transform(
        words,
        lambda w: F.size(F.split(F.trim(_apply(_wrapped(w))), "  ")),
    )
    n_bpe = F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)
    return spread(df).select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
    )
