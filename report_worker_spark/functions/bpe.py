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

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import spread
from .text import tokens


def bpe_word_freqs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass → ``(w, freq)`` word-frequency table (the only
    corpus-sized shuffle in BPE training; map-side combinable)."""
    return (
        spread(df)
        .select(F.explode(tokens(text_col)).alias("w"))
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
    (orderBy+limit(1), stays distributed — the winner is crossJoin'd
    back as a broadcast 1-row side, never collected) → ``replace`` the
    pair in every word. Only the 1-row ``best`` is localCheckpoint'ed
    each round: with the winners as materialized leaves, the vocab
    lineage grows LINEARLY (one crossJoin+replace per round), so the
    exponential-plan hazard that forces connected_components to cut
    its full frontier every round does not arise — and skipping the
    vocab-sized checkpoint halves the per-round job count. Stops early
    when no pair remains (vocab fully merged)."""
    vocab = (
        bpe_word_freqs(df, text_col)
        .select("freq", _wrapped(F.col("w")).alias("r"))
        .localCheckpoint(eager=True)
    )
    out: list[DataFrame] = []
    cur = vocab
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("r")), "  ")
        counts = (
            cur.select("freq", F.explode(_adjacent_pairs(syms)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = (
            counts.orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if best.isEmpty():
            break
        out.append(
            best.select(
                F.lit(rank).alias("merge_rank"),
                F.col("a").alias("lhs"),
                F.col("b").alias("rhs"),
                F.concat("a", "b").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        cur = (
            cur.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("a").alias("_ma"), F.col("b").alias("_mb")
                    )
                )
            )
            .select(
                "freq",
                F.replace(
                    F.col("r"),
                    F.concat(
                        F.lit(" "), "_ma", F.lit("  "), "_mb", F.lit(" ")
                    ),
                    F.concat(F.lit(" "), "_ma", "_mb", F.lit(" ")),
                ).alias("r"),
            )
        )
    # Seed the union with an empty merges frame: if the very first
    # iteration finds no adjacent pair (empty corpus, or every word a
    # single symbol) ``out`` is empty and a bare reduce would raise
    # TypeError instead of returning zero merges (ADVICE_r5).
    empty = df.sparkSession.createDataFrame(
        [],
        "merge_rank INT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count LONG",
    )
    return reduce(DataFrame.unionByName, out, empty)


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
