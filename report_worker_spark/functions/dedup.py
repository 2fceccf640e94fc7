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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import explode_strict, posexplode_strict, spread
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


def cross_source_cluster_profile(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """CROSS-SOURCE DUPLICATE CLUSTERS — of the exact-dup clusters at
    each size, how many span MULTIPLE sources? Within-source dups are
    usually crawler artifacts (safe to collapse); cross-source dups
    are syndicated/boilerplate content whose 'source diversity' is
    illusory — exactly the clusters that inflate mixing weights if
    counted per source. One md5-groupBy + one size-bounded rollup,
    all exact BIGINTs.

    CLEAN detector (no fixture fault injection — ADVICE r13: the
    harness-only syndication injection lives in plans/_qshared
    `_syndicated_documents`, composed explicitly by the catalog
    entry)."""
    cl = (
        corpus.groupBy(F.md5(text_col).alias("th"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(source_col).alias("n_sources"),
            F.min(id_col).alias("canonical_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )
    return cl.groupBy(F.col("n_docs").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_cross_source"),
        F.round(
            F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            9,
        ).alias("cross_source_share"),
        F.min("canonical_doc").cast("long").alias("sample_canonical"),
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
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | None,
    with_df: bool = False,
    hashed: bool = False,
) -> DataFrame:
    """(id, shingle) inverted index, with size per doc and an optional
    document-frequency cap on hot shingles (scale guard).

    ``with_df=True`` keeps each shingle's global document frequency as
    a ``_df`` column. The prefix-filter callers need df for their
    rarest-first ranking anyway, so computing it HERE means one
    df pass serves both the hot-shingle cap and the ranking
    (VERDICT_r5 item 4 — previously the cap ran its own groupBy and
    the ranking re-counted the filtered index). Dropping capped
    shingles removes whole (shingle) groups, never partial ones, so
    pre-filter dfs equal post-filter dfs and reusing them is exact.

    ``hashed=True`` replaces each shingle string with its xxhash64
    BEFORE any shuffle: every downstream stage (df groupBy, prefix
    equi-join, verification collect_list/array_intersect) then moves
    8-byte longs instead of ~25-byte n-gram strings — the standard
    set-similarity-at-scale representation. Results are identical
    modulo 64-bit collisions (the same assumption the exact-substring
    family makes; oracle parity against the string-keyed SQL twin
    certifies collision-freedom on the corpus), and the prefix filter
    only needs a SHARED total order, which (df, hash) provides."""
    df = spread(df)
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    ).withColumn("_sz", F.size("_sh"))
    ex = explode_strict(sh, "_sh", "_s", keep=("_id", "_sz"))
    if hashed:
        ex = ex.select("_id", "_sz", F.xxhash64("_s").alias("_s"))
    if max_df is not None or with_df:
        dfreq = ex.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
        ex = ex.join(dfreq, on="_s")
        if max_df is not None:
            ex = ex.filter(F.col("_df") <= max_df)
        if not with_df:
            ex = ex.drop("_df")
    # The index feeds 3-4 downstream branches (document frequencies,
    # prefix ranking, exact verification sets); without a persist each
    # branch re-tokenizes and re-explodes the corpus — measured ~1.5 s
    # per pass at sf0.1, the dominant cost of the whole pair join. At
    # 100 TB this is the "materialize the inverted index once" step
    # (a production pipeline writes it out between stages);
    # MEMORY_AND_DISK spills instead of OOMing on big corpora.
    # Every persist is registered so callers can release executor
    # memory once the returned plan has been materialized — see
    # release_shingle_caches().
    from pyspark import StorageLevel

    ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_INDEXES.append(ex)
    return ex


_PERSISTED_INDEXES: list[DataFrame] = []


def release_shingle_caches() -> int:
    """Unpersist every inverted index persisted by the pair-join family
    since the last call. The persist inside _shingle_table is needed
    while the returned plan executes (several branches share it);
    afterwards it would pin executor memory/disk for the session
    lifetime. Call this once the pair DataFrame has been materialized
    (collected / written). Returns the number of indexes released."""
    n = 0
    while _PERSISTED_INDEXES:
        _PERSISTED_INDEXES.pop().unpersist()
        n += 1
    return n


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) whose distinct word-n-gram Jaccard ≥ threshold.

    Prefix-filtered inverted index (the published AllPairs/PPJoin
    candidate bound): order every doc's shingles rarest-first by global
    document frequency, explode only the first
    ``|S| - ceil(t·sz) + 1`` of them, and equi-join prefixes — any
    pair with J ≥ t must collide inside both prefixes under a shared
    total order, so there are NO false negatives, while the naive
    Σ df(s)² self-join cost (which went ~30× superlinear on the 10×
    near-dup stress corpus even with ``max_df``) collapses to
    collisions on RARE shingles. Candidates then verify exactly and
    JVM-side: one join back to the per-doc shingle array and
    ``size(array_intersect)`` — identical output to the all-pairs
    formulation. ``max_df`` still drops globally hot shingles from the
    index first (documented approximation, scale guard; prefix length
    shrinks with the capped set while ``sz`` keeps the full
    denominator, which only lengthens prefixes — still exact w.r.t.
    the capped intersection)."""
    ex = _shingle_table(
        df, id_col, text_col, n, max_df, with_df=True, hashed=True
    )
    ranked = ex
    wrk = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_s").asc())
    # ceil with an epsilon guard: t·sz computed in float64 can land an
    # ULP above an exact integer (0.8·10 → 8.000…002) and a raw ceil
    # would shorten the prefix below the exactness bound
    need = F.ceil(F.col("_sz") * F.lit(threshold) - F.lit(1e-9))
    prefix = (
        ranked.withColumn("_rn", F.row_number().over(wrk))
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy("_id")))
        .filter(F.col("_rn") <= F.col("_cnt") - need + 1)
        .select("_id", "_sz", "_s")
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("sz_a"), F.col("_s")
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("sz_b"), F.col("_s")
    )
    cand = (
        a.join(b, on="_s")
        .filter(F.col("id_a") < F.col("id_b"))
        # AllPairs LENGTH filter (exact, published with the prefix
        # bound): J ≥ t forces t·max(|A|,|B|) ≤ |A∩B| ≤ min(|A|,|B|),
        # so size-mismatched collisions are pruned BEFORE the
        # dedup + verify joins ever see them. The epsilon keeps the
        # float product from pruning a boundary-exact pair (same
        # guard as the prefix-length ceil above). Cheapest right at
        # the collision stream: scalar compare, no extra shuffle.
        .filter(
            F.least("sz_a", "sz_b").cast("double")
            >= F.greatest("sz_a", "sz_b") * F.lit(threshold) - F.lit(1e-9)
        )
        .select("id_a", "sz_a", "id_b", "sz_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = ex.groupBy("_id").agg(F.collect_list("_s").alias("_set"))
    inter = (
        cand.join(
            sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("set_a")),
            on="id_a",
        )
        .join(
            sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("set_b")),
            on="id_b",
        )
        .withColumn(
            "n_common", F.size(F.array_intersect("set_a", "set_b"))
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def ngram_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) whose overlap coefficient
    ``|A∩B| / min(|A|,|B|)`` ≥ threshold — the containment detector
    for sub/superset near-dups (a quote, an excerpt, a page wrapped in
    boilerplate) that Jaccard structurally misses: a 50-gram doc fully
    contained in a 500-gram doc has J ≈ 0.1 but overlap = 1.0.

    Candidates come from the same prefix-filter bound as
    :func:`ngram_jaccard_pairs`, applied to the SMALLER set of each
    pair: under a shared rarest-first total order, a pair with
    ``|A∩B| ≥ t·min(sz)`` must collide within the first
    ``sz_small − ceil(t·sz_small) + 1`` shingles of the smaller doc
    (at most ``sz_small − t·sz_small`` of them can be missed by the
    bigger doc). The smaller side therefore explodes only its prefix;
    the bigger side indexes everything. Pair roles are decided by
    (sz, id) rank so each unordered pair is generated exactly once —
    no dedup shuffle. Verification is exact and JVM-side:
    ``size(array_intersect)`` after a join back to the full shingle
    arrays."""
    ex = _shingle_table(
        df, id_col, text_col, n, max_df, with_df=True, hashed=True
    )
    ranked = ex
    wrk = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_s").asc())
    need = F.ceil(F.col("_sz") * F.lit(threshold) - F.lit(1e-9))
    prefix = (
        ranked.withColumn("_rn", F.row_number().over(wrk))
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy("_id")))
        .filter(F.col("_rn") <= F.col("_cnt") - need + 1)
        .select("_id", "_sz", "_s")
    )
    small = prefix.select(
        F.col("_id").alias("id_s"), F.col("_sz").alias("sz_s"), F.col("_s")
    )
    big = ex.select(
        F.col("_id").alias("id_b_"), F.col("_sz").alias("sz_b_"), F.col("_s")
    )
    smaller_first = (F.col("sz_s") < F.col("sz_b_")) | (
        (F.col("sz_s") == F.col("sz_b_")) & (F.col("id_s") < F.col("id_b_"))
    )
    cand = (
        small.join(big, on="_s")
        .filter(smaller_first)
        .select(
            F.least("id_s", "id_b_").alias("id_a"),
            F.greatest("id_s", "id_b_").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = ex.groupBy("_id").agg(
        F.collect_list("_s").alias("_set"), F.max("_sz").alias("_setsz")
    )
    inter = (
        cand.join(
            sets.select(
                F.col("_id").alias("id_a"),
                F.col("_set").alias("set_a"),
                F.col("_setsz").alias("sz_a"),
            ),
            on="id_a",
        )
        .join(
            sets.select(
                F.col("_id").alias("id_b"),
                F.col("_set").alias("set_b"),
                F.col("_setsz").alias("sz_b"),
            ),
            on="id_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")))
    )
    ov = F.col("n_common").cast("double") / F.least("sz_a", "sz_b").cast(
        "double"
    )
    return (
        inter.withColumn("overlap", ov)
        .filter(F.col("overlap") >= F.lit(threshold))
        .select("id_a", "id_b", "n_common", "overlap")
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
    explode shingles, hash each shingle ONCE (xxhash64 of the string),
    then derive each permutation as ``xxhash64(i, base)`` — a fixed-width
    re-hash, far cheaper than 64 string hashes, and statistically
    independent across permutations. (An earlier linear-combination
    family ``a·h1 + c·h2 + b`` over the base's two halves was ~2×
    faster per row but its permutations are linearly DEPENDENT: on
    small shingle sets the per-position mins correlate, and a pair at
    true Jaccard 0.9 was observed to agree on 0 of 16 bands — recall
    collapses exactly where near-dup detection matters.) All aggregates
    are map-side-combinable mins; no overflow anywhere (pure hashing,
    no arithmetic — Spark 4's ANSI mode throws on long overflow)."""
    ex = _shingle_table(df, id_col, text_col, n, max_df=None).select("_id", "_s")
    ex = ex.select("_id", F.xxhash64(F.col("_s")).alias("_b"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_b"))).alias(f"mh_{i}")
        for i in range(num_hashes)
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


def minhash_lsh_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """LSH-then-verify: MinHash banding generates candidates (equi-join
    on band hash — never a cross join), then each candidate pair is
    verified with the EXACT n-gram Jaccard before the threshold filter.

    This is the production fuzzy-dedup shape (candidates are approximate,
    admissions are exact): the output is bit-comparable to a brute-force
    all-pairs oracle whenever banding recall is 1 on the data, which
    makes the whole LSH pipeline driver-checkable end to end. With
    r=4/b=16, P(candidate | j=0.8) ≈ 0.9998 per pair.

    Scale: verification joins only candidate pairs back to their
    distinct-shingle arrays — two equi-joins on id, O(candidates).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sig.select(
        F.col(id_col).alias("_id"),
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
    ).select("_id", "b.band", "b.bh")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bh"])
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = spread(df).select(
        F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh")
    )
    cand = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), on="id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), on="id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: explode tokens,
    per-bit ±1 sums (map-side combinable), sign → bit, assemble."""
    df = spread(df)
    ex = explode_strict(
        df, tokens(text_col), "_t", keep=(F.col(id_col).alias("_id"),)
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


_HEX = "0123456789abcdef"


def simhash_md5(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Oracle-reproducible 64-bit SimHash: per-token bits come from the
    md5 hex digits (computable identically in ANSI SQL), packed as two
    non-negative 32-bit halves ``(sh_hi, sh_lo)`` so no sign-bit games
    are needed in Spark's ANSI mode.

    Same shuffle shape as :func:`simhash` (explode tokens → 64 map-side
    combinable ±1 sums in ONE groupBy); xxhash64 is marginally faster
    per token, so :func:`simhash` remains the default scale path and
    this variant exists to make the algorithm cross-engine checkable.
    """
    df = spread(df)
    ex = explode_strict(
        df, tokens(text_col), "_t", keep=(F.col(id_col).alias("_id"),)
    ).select("_id", F.md5("_t").alias("_h"))
    # 16 hex-digit values (4 bits each), materialized once per token
    ex = ex.select(
        "_id",
        *[
            F.expr(f"instr('{_HEX}', substr(_h, {j + 1}, 1)) - 1").alias(f"_d{j}")
            for j in range(16)
        ],
    )
    sums = ex.groupBy("_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"_d{i // 4}"), i % 4).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(64)
        ]
    )
    def _half(lo_bit: int) -> Column:
        val: Column | None = None
        for i in range(32):
            term = F.when(
                F.col(f"s{lo_bit + i}") > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            val = term if val is None else (val + term)
        return val

    return sums.select(
        F.col("_id").alias(id_col),
        _half(32).alias("sh_hi"),
        _half(0).alias("sh_lo"),
    )


def simhash_md5_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with EXACT recall by construction: the
    64-bit hash splits into ``max_hamming + 1`` chunks, and by
    pigeonhole any pair within Hamming ≤ max_hamming agrees exactly on
    at least one chunk — so the chunk equi-join provably generates every
    qualifying pair and the post-filter on true Hamming distance makes
    the result identical to a brute-force all-pairs scan (the oracle).
    No cross join anywhere: candidates are an equi-join on (chunk_idx,
    chunk_value)."""
    assert max_hamming == 3, "chunking below assumes 4×16-bit pieces"
    sh = simhash_md5(df, id_col, text_col)
    mask = (1 << 16) - 1
    piece = [
        F.col("sh_lo").bitwiseAND(F.lit(mask)),
        F.shiftright("sh_lo", 16).bitwiseAND(F.lit(mask)),
        F.col("sh_hi").bitwiseAND(F.lit(mask)),
        F.shiftright("sh_hi", 16).bitwiseAND(F.lit(mask)),
    ]
    pieces = sh.select(
        F.col(id_col).alias("_id"),
        "sh_hi",
        "sh_lo",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(ci).alias("ci"), piece[ci].alias("cv"))
                    for ci in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "sh_hi", "sh_lo", "c.ci", "c.cv")
    a = pieces.select(
        F.col("_id").alias("id_a"), F.col("sh_hi").alias("hi_a"),
        F.col("sh_lo").alias("lo_a"), "ci", "cv",
    )
    b = pieces.select(
        F.col("_id").alias("id_b"), F.col("sh_hi").alias("hi_b"),
        F.col("sh_lo").alias("lo_b"), "ci", "cv",
    )
    cand = (
        a.join(b, on=["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
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


# --- Exact-substring dedup (duplicated token spans) --------------------------


def _window_hashes(toks: Column, k: int) -> Column:
    """xxhash64 of every k-token window of ``toks`` (one element per
    start position, 0-based). Hashing each window to 64 bits is the
    scale path — the dup-window groupBy then shuffles (hash, count)
    pairs instead of k-token strings (~8× less shuffle volume at k=8).
    Expected false-dup collisions across W windows ≈ W²/2⁶⁵ —
    negligible below ~10¹² windows; a 100 TB-paranoid deployment would
    re-verify span text on the (tiny) marked subset.

    Same arrays_zip-of-k-shifted-slices shape as word_shingles: ``toks``
    is referenced a constant k times per row. The index-sequence +
    dynamic-slice lambda alternative re-evaluates ``toks`` (and its
    upstream split) PER WINDOW — measured 6.3 s → 3.5 s at sf0.1 for
    the full duplicate_spans pipeline when replaced with this form
    (the remainder is the explode/groupBy/window stages, linear in
    window count). Callers should pass a materialized array column,
    not an inline split expression."""
    sz = F.size(toks)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, sz - F.lit(k - 1)) for i in range(k)]
    )
    grams = F.transform(
        zipped,
        lambda s: F.xxhash64(
            F.concat_ws(" ", *[s[str(i)] for i in range(k)])
        ),
    )
    empty = F.array().cast("array<bigint>")
    return F.when(sz >= F.lit(k), grams).otherwise(empty)


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring dedup (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" operator, re-expressed
    relationally): return, per document, the maximal contiguous token
    runs covered by k-token windows that occur at least ``min_count``
    times anywhere in the corpus, as
    ``(doc_id, span_start, span_end, span_tokens)`` (token positions,
    0-based inclusive).

    These are COVERAGE spans (the removal semantics of Lee et al.):
    every k-window inside a span is duplicated ≥ min_count times, so
    every length-k substring of a span is guaranteed duplicated — but
    the span's FULL text is not: two distinct duplicated substrings
    that overlap or sit token-adjacent merge into one span whose
    concatenation may occur only once in the corpus. Only substrings
    of length ≥ k *within* a span carry the per-occurrence guarantee.

    The suffix-array formulation the paper uses is a single-machine
    construction; the relational equivalent is exact for spans ≥ k and
    fully distributed:

    1. slide a k-token window over each doc, hash each window
       (JVM-side ``transform``+``xxhash64`` — no Python, no explode
       of the token array itself);
    2. ``posexplode`` → (doc, pos, window_hash): one row per window;
    3. a window is *duplicated* iff its hash occurs ≥ min_count times
       globally — ONE map-side-combinable groupBy-count on 64-bit
       keys (the only corpus-wide shuffle);
    4. equi-join the duplicated hashes back (hash join, no theta);
    5. merge overlapping/adjacent duplicated windows into maximal
       spans with one doc-partitioned window pass (gaps-and-islands
       over a running max: a window starting at ``pos`` extends the
       current span iff ``pos ≤ prev_max_pos + k``).

    Every duplicated substring of length L ≥ k is covered exactly by
    the union of its L−k+1 duplicated windows, so the coverage union is
    recovered exactly (nothing duplicated of length ≥ k escapes a
    span); substrings shorter than k are invisible (the paper's
    threshold semantics, k=50 BPE tokens there — k=8 words here to
    suit the test corpus).

    Scale: shuffle₁ = (hash, count) partials; shuffle₂ = the equi-join
    on duplicated hashes only (df(hash) ≥ min_count rows each — hot
    boilerplate hashes fan out but only as (doc, pos) pairs, no
    payload); shuffle₃ = (doc, pos) pairs window-partitioned by doc —
    bounded by document length. No driver materialization anywhere."""
    return _grouped_dup_windows(df, id_col, text_col, k, min_count).groupBy(
        "_id", "_g"
    ).agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
    ).select(
        F.col("_id").alias(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias(
            "span_tokens"
        ),
    )


def _grouped_dup_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_count: int,
) -> DataFrame:
    """Shared core of the exact-substring family: one row per
    duplicated k-window as ``(_id, pos, _h, _g)`` where ``_g`` is the
    gaps-and-islands group id (windows in the same ``_g`` merge into
    one maximal span). Carries the window hash ``_h`` so callers can
    derive a span CONTENT key without re-joining the token arrays."""
    base = (
        spread(df)
        .select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))
        .select("_id", _window_hashes(F.col("_t"), k).alias("_wh"))
    )
    wins = posexplode_strict(base, "_wh", "pos", "_h", keep=("_id",))
    dup = (
        wins.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_h")
    )
    marked = wins.join(dup, on="_h").select("_id", "pos", "_h")
    w = Window.partitionBy("_id").orderBy("pos")
    prev_max = F.max("pos").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max.isNull() | (F.col("pos") > prev_max + k), F.lit(1)
    ).otherwise(F.lit(0))
    grp = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return marked.withColumn("_g", grp)


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-token budget from :func:`duplicate_spans`:
    ``(doc_id, n_tokens, dup_tokens, dup_ratio)`` for EVERY document
    (zero-filled when nothing is duplicated) — the audit a curation
    pipeline runs before deciding how aggressively to trim. Maximal
    spans are disjoint by construction, so summing their lengths never
    double-counts a token."""
    spans = duplicate_spans(df, id_col, text_col, k, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("_dup")
    )
    return (
        df.select(
            F.col(id_col),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        )
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            (
                F.coalesce(F.col("_dup"), F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_ratio"),
        )
    )


def substring_trim(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Third step of the Lee et al. 2022 exact-substring pipeline:
    emit the TRIMMED corpus. For every maximal duplicated span from
    :func:`duplicate_spans`, keep the FIRST occurrence of each span
    text (global order: ``(doc_id, span_start)`` over spans sharing
    the same token content) and delete the token ranges of every later
    occurrence, then reassemble each document's remaining tokens in
    order. Returns one row per input document:
    ``(doc_id, text, kept_tokens, removed_tokens)`` — ``text`` is the
    trimmed document (may be empty when a doc is entirely duplicated
    coverage that lost the keep-first race).

    Plan (all JVM-side, no Python kernels):

    1. grouped duplicated windows ← the shared exact-substring core
       (hash-window groupBy + gaps-and-islands; see
       :func:`duplicate_spans` for the shuffle story), keeping each
       window's 64-bit hash;
    2. span CONTENT key = ``xxhash64`` of the span's duplicated
       windows as ``(pos − span_start):hash`` pairs in position order.
       Relative offsets are load-bearing: the gaps-and-islands merge
       admits windows up to ``k`` apart, so two spans can share the
       same ordered HASH sequence with different window placement —
       and therefore different text (e.g. k=4 over
       ``['a b c b x', 'a b c b c b x']``, where hashing the sequence
       alone collides the 5- and 7-token spans and trims unique
       content). With placement included, two spans share a key iff
       their duplicated-window coverage is token-identical (window
       coverage inside a maximal span is contiguous, and each 64-bit
       hash pins its k tokens under the same collision assumption the
       span finder already makes), i.e. iff their span text matches —
       derived IN the span aggregation, so the corpus token arrays
       are never re-joined;
    3. keep-first resolution: ``row_number`` over
       ``partitionBy(span_key) orderBy(doc_id, span_start)``; rows
       with ``rn > 1`` become cut ranges (ONE shuffle on the 64-bit
       span key, payload = (doc, start, end) triples only);
    4. per-doc cut lists via ``collect_list`` (spans within a doc are
       disjoint and few — bounded by doc length / k);
    5. reassembly: ``filter(tokens, (tok, i) -> no cut covers i)`` +
       ``concat_ws`` — a left join back to the corpus keyed by doc id
       (cut lists are tiny → AQE broadcasts them; the corpus itself
       is never shuffled), per-token work linear in cuts-per-doc.

    Scale: the only NEW corpus-wide work beyond duplicate_spans is
    the span-key window (span volume ≪ token volume) and one more
    corpus scan for reassembly. Nothing touches the driver."""
    keyed = (
        _grouped_dup_windows(df, id_col, text_col, k, min_count)
        .groupBy("_id", "_g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias(
                "span_end"
            ),
            F.array_sort(F.collect_list(F.struct("pos", "_h"))).alias(
                "_wins"
            ),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        "_wins",
                        lambda s: F.concat_ws(
                            ":",
                            (s["pos"] - F.col("span_start")).cast(
                                "string"
                            ),
                            s["_h"].cast("string"),
                        ),
                    ),
                )
            ).alias("_key"),
        )
    )
    wk = Window.partitionBy("_key").orderBy(
        F.col(id_col).asc(), F.col("span_start").asc()
    )
    cuts = (
        keyed.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") > 1)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("_cut")
        )
        .withColumnRenamed(id_col, "_cid")
    )
    toks_df = spread(df).select(
        F.col(id_col).alias("_tid"), tokens(text_col).alias("_t")
    )
    joined = toks_df.join(
        cuts, toks_df["_tid"] == cuts["_cid"], "left"
    ).select(
        F.col("_tid").alias(id_col),
        "_t",
        F.coalesce(
            "_cut", F.array().cast("array<struct<s:long,e:long>>")
        ).alias("_cut"),
    )
    kept = F.filter(
        "_t",
        lambda t, i: ~F.exists(
            "_cut", lambda r: (i >= r["s"]) & (i <= r["e"])
        ),
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", kept).alias(text_col),
        F.size(kept).cast("long").alias("kept_tokens"),
        (F.size("_t") - F.size(kept)).cast("long").alias(
            "removed_tokens"
        ),
    )


def canonicalize_url(url) -> F.Column:
    """URL canonicalization for crawl dedup — the normalization pass
    every web corpus runs before content dedup (tracking-param strip
    per the public uBlock/URLPattern lists; scheme and host case per
    RFC 3986 §6.2.2.1). Steps, in order:

    1. drop the fragment (``#…``),
    2. lowercase the scheme+authority (path/query stay case-sensitive;
       FIRST, so the scheme upgrade below also unifies ``HTTP://``),
    3. strip tracking params (``utm_*``, ``fbclid``, ``gclid``),
    4. upgrade ``http://`` → ``https://`` (scheme unification),
    5. re-anchor a query left leading with ``&`` (a stripped param
       took the ``?`` with it) back to ``?``,
    6. drop a trailing slash.

    Pure column expressions — JVM-side, codegen-able, no UDF. The
    regex set deliberately avoids backreferences: Spark spells them
    ``$1`` and DuckDB ``\\1``, so a twin-able canonicalizer must not
    need them — tracking params are stripped with their own ``[?&]``
    prefix and step 5 restores the ``?`` when the stripped param led
    the query string (ADVICE r7; a general canonicalizer would also
    re-sort params)."""
    col = url if not isinstance(url, str) else F.col(url)
    c1 = F.regexp_replace(col, "#.*$", "")
    head = F.regexp_extract(c1, "^[a-zA-Z]+://[^/]+", 0)
    c2 = F.concat(
        F.lower(head), c1.substr(F.length(head) + 1, F.length(c1))
    )
    c3 = F.regexp_replace(c2, "[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    c4 = F.regexp_replace(c3, "^http://", "https://")
    before = F.substring_index(c4, "&", 1)
    c5 = F.when(
        c4.contains("&") & ~c4.contains("?"),
        F.concat(
            before,
            F.lit("?"),
            c4.substr(F.length(before) + 2, F.length(c4)),
        ),
    ).otherwise(c4)
    return F.regexp_replace(c5, "/$", "")


def band_majority_verdict(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    min_band_matches: int = 2,
) -> DataFrame:
    """Batch analog of the streaming near-dedup verdict
    (streaming/stateful.stream_near_dedup): per-doc MinHash signature
    (md5 permutation family) -> banded buckets -> first-arrival
    ownership (min(doc_id) over each (band, bucket)) -> band-majority
    keep/suppress. Shingle-less docs own all their bands and are
    always kept (the ADVICE r13 short-doc bypass).

    100 TB shape: one groupBy(doc_id) for signatures, one equi-shuffle
    window over (band, bucket) with ``bands`` rows per doc, one
    groupBy(doc_id) for the count -- no pair materialization.
    Returns (doc_id, n_bands_owned, kept)."""
    rows = num_hashes // bands
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    sh = explode_strict(
        toks,
        F.expr(
            "transform(sequence(1, size(t) - 2),"
            " i -> concat(element_at(t, i), ' ',"
            " element_at(t, i + 1), ' ', element_at(t, i + 2)))"
        ),
        "sh",
        keep=("doc_id",),
    ).distinct()
    mh_aggs = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("sh"))), 1, 12
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    per = sh.groupBy("doc_id").agg(*mh_aggs)
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh{bi * rows + r}").cast("string")
                    for r in range(rows)
                ],
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    bandrows = per.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("_p")
    ).select("doc_id", "_p.band", "_p.bucket")
    w = Window.partitionBy("band", "bucket")
    cnt = (
        bandrows.withColumn("owner", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_owned")
        )
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_owned"), F.lit(bands))
            .cast("int")
            .alias("n_bands_owned"),
            (
                F.coalesce(F.col("n_owned"), F.lit(bands))
                > F.lit(bands - min_band_matches)
            ).alias("kept"),
        )
    )


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
