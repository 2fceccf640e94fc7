"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB:

- Exact dedup is one hash-aggregate — the map-side partial aggregation
  means only (hash, min_id, count) tuples shuffle, not documents.
- Jaccard / MinHash use an *inverted-index* join (explode shingle →
  equi-join on shingle) rather than a cross join: cost is
  Σ_shingle df(s)², so frequent shingles are the scale hazard — the
  ``max_df`` document-frequency cap drops them (standard blocking),
  trading recall for a hard bound on join fan-out.
- MinHash signatures are 64 JVM ``min(xxhash64(...))`` aggregates in a
  single groupBy pass (one shuffle), then LSH banding turns candidate
  generation into an equi-join on (band, band_hash) — no cross join
  anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import spread
from .text import tokens


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via content hash: one row per distinct text with the
    canonical (minimum) id and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one (min-id) row per distinct text."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of whitespace-tokenized text."""
    toks = tokens(col)
    if n == 1:
        return F.array_distinct(toks)
    # Zip n shifted slices and concat per element: references the token
    # array a constant number of times (an index-sequence + slice lambda
    # re-evaluates the outer split per gram — measured ~3× slower), and
    # the n-1 shortfall guard falls out of slice() semantics. Guard
    # size>=n explicitly: slice with a negative length errors / Spark's
    # sequence() would descend for short docs.
    sz = F.size(toks)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, sz - F.lit(n - 1)) for i in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    empty = F.array().cast("array<string>")
    return F.when(sz >= F.lit(n), F.array_distinct(grams)).otherwise(empty)


def _shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int, max_df: int | None
) -> DataFrame:
    """(id, shingle) inverted index, with size per doc and an optional
    document-frequency cap on hot shingles (scale guard)."""
    df = spread(df)
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    ).withColumn("_sz", F.size("_sh"))
    ex = sh.select("_id", "_sz", F.explode("_sh").alias("_s"))
    if max_df is not None:
        hot = (
            ex.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("_s")
        )
        ex = ex.join(F.broadcast(hot), on="_s", how="left_anti")
    return ex


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) whose distinct word-n-gram Jaccard ≥ threshold.

    Inverted-index self-join: shuffle cost Σ_shingle df(s)². Exact when
    ``max_df=None`` (oracle-comparable); set ``max_df`` at scale.
    """
    ex = _shingle_table(df, id_col, text_col, n, max_df)
    a = ex.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("sz_a"), F.col("_s")
    )
    b = ex.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("sz_b"), F.col("_s")
    )
    inter = (
        a.join(b, on="_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """64-permutation MinHash signature per document in ONE shuffle:
    explode shingles, hash each shingle ONCE (xxhash64), then apply
    ``num_hashes`` linear permutations of the two 32-bit halves —
    64 long mul/adds per row instead of 64 string hashes (~2× faster
    end-to-end), all map-side-combinable min aggregates.

    Coefficients stay < 2^20 and halves < 2^32, so products are < 2^53:
    no long overflow (Spark 4 runs ANSI mode, where overflow throws)."""
    ex = _shingle_table(df, id_col, text_col, n, max_df=None).select("_id", "_s")
    base = F.xxhash64(F.col("_s"))
    h1 = base.bitwiseAND(F.lit(0xFFFFFFFF))
    h2 = F.shiftrightunsigned(base, 32)
    ex = ex.select("_id", h1.alias("_h1"), h2.alias("_h2"))
    import random

    rng = random.Random(0x5EED)
    coefs = [
        (rng.randrange(1, 1 << 20) | 1, rng.randrange(1, 1 << 20) | 1,
         rng.randrange(0, 1 << 20))
        for _ in range(num_hashes)
    ]
    aggs = [
        F.min(
            F.col("_h1") * F.lit(a) + F.col("_h2") * F.lit(c) + F.lit(b)
        ).alias(f"mh_{i}")
        for i, (a, c, b) in enumerate(coefs)
    ]
    sig = ex.groupBy("_id").agg(*aggs)
    return sig.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("minhash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature (bands × rows),
    equi-join on (band, band-hash) for candidates, then estimate Jaccard
    from full-signature agreement and keep ≥ threshold.

    With 64 hashes / 16 bands (r=4): P(candidate) = 1-(1-j⁴)¹⁶ — ~0.99
    at j=0.8. Candidate generation is a pure equi-join (shuffle on band
    hash), never a cross join.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("minhash")[bi * rows + r] for r in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "minhash", "b.band", "b.bh")
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("minhash").alias("mh_a"), "band", "bh"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("minhash").alias("mh_b"), "band", "bh"
    )
    cand = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "mh_a", "mh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.size("mh_a")
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "est_jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: explode tokens,
    per-bit ±1 sums (map-side combinable), sign → bit, assemble."""
    df = spread(df)
    ex = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    sums = ex.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    val = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = bit * F.lit(2**i if i < 63 else -(2**63)).cast("long")
        val = term if val is None else (val + term)
    return sums.select(F.col("_id").alias(id_col), val.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Candidate blocking: split the 64-bit hash into max_hamming+1 chunks;
    pigeonhole ⇒ any pair within distance ≤ max_hamming agrees on at
    least one chunk, so candidates come from equi-joins on (chunk_idx,
    chunk_value) — no cross join.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sh = simhash(df, id_col, text_col)
    pieces = sh.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), ci * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("cv"),
                    )
                    for ci in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("_id", "simhash", "c.ci", "c.cv")
    a = pieces.select(F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"), "ci", "cv")
    b = pieces.select(F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"), "ci", "cv")
    cand = (
        a.join(b, on=["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


# --- Connected components / canonicalization ---------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, component) with
    component = min id reachable. The canonical-document selection step
    that turns pairwise similarity into dedup groups.

    Large-star/small-star style label propagation: every node adopts
    the minimum label in its neighborhood, iterated to fixpoint.
    Deterministic; converges in O(diameter) rounds (near-dup clusters
    are tiny, so 2-3 rounds in practice — the driver loop checks a
    convergence count per round, each round is two shuffles).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        # localCheckpoint (not cache): iterative algorithms grow the
        # logical plan exponentially — lineage must be CUT each round or
        # analysis time alone blows up by ~iteration 15
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("component"))


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one canonical row (min id) per near-dup component; rows in
    no component survive untouched. The end-to-end fuzzy-dedup story:
    candidate pairs (minhash/simhash/jaccard) → components → filter."""
    comps = connected_components(pairs)
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
