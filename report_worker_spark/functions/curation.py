"""Training-data curation: deterministic sampling and dataset splits.

``sample()``/``randomSplit()`` are seed-deterministic only for a FIXED
partitioning — re-reading the same data with different parallelism
reassigns rows. Content-hash bucketing is partitioning-independent,
reproducible across engines and runs, and stable under appends: a
document keeps its split forever, which is what train/test hygiene
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, salt: str = "", buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): integer value of the first
    4 hex digits of md5(salt||key), mod buckets. Portable to any engine
    with md5 (the ANSI-SQL twin uses the same digits)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 4), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction_pct: int, salt: str = "s1"
) -> DataFrame:
    """Keep ~fraction_pct% of rows, stable across runs/partitionings."""
    return df.filter(hash_bucket(id_col, salt) < fraction_pct)


def chunk_with_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window document chunking (the LLM-context splitter):
    whitespace tokens, chunks of ``window`` tokens starting every
    ``stride`` tokens, so consecutive chunks overlap by
    ``window - stride``. Returns one row per chunk with its index,
    1-based token start, token count, and an md5 content hash (the
    dedup/join key for chunk-level pipelines).

    Pure JVM expressions: split → sequence → explode → slice. Embarrassingly
    parallel (no shuffle); chunk fan-out is bounded by doc length /
    stride, so the op scales linearly with corpus size.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    from ..util import explode_strict

    t = explode_strict(
        df,
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        "chunk_start",
        keep=(F.col(id_col), toks.alias("_toks")),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_start"), window)
    return t.select(
        id_col,
        F.expr(f"CAST((chunk_start - 1) DIV {stride} AS BIGINT)").alias(
            "chunk_idx"
        ),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split1",
    out_col: str = "split",
) -> DataFrame:
    """Assign a stable split label per row (train/val/test)."""
    b = hash_bucket(id_col, salt)
    return df.withColumn(
        out_col,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def length_weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    cap: int = 2048,
    salt: str = "w1",
) -> DataFrame:
    """Weighted Bernoulli sampling with inclusion probability
    min(1, weight/cap) — longer (higher-weight) documents are
    proportionally more likely to be kept, the standard
    length-proportional curation sampler. Entirely integer arithmetic
    on a content hash (first 4 hex digits of md5 → 16-bit uniform), so
    the decision per row is deterministic, partitioning-independent,
    and reproducible on any engine with md5: keep iff
    h16 * cap < weight * 65536. No shuffle — a pure filter."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    return df.filter(
        h16 * F.lit(cap) < F.col(weight_col).cast("long") * F.lit(65536)
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    shards: int = 256,
) -> DataFrame:
    """Greedy token-budget cut: take documents in a deterministic
    content-hash order until the running token total reaches
    ``budget`` (the straddling doc is admitted — the cut is on the
    tokens BEFORE it). This is how a run asks for "exactly ~10M tokens
    of this source" reproducibly, independent of partitioning.

    The global prefix sum is computed DISTRIBUTED, never as one
    corpus-wide ordered window: the md5 order key's first
    log16(``shards``) hex chars shard the corpus into ``shards``
    ranges (``shards`` must be a power of 16 so a hex prefix selects
    them exactly; hex prefix order == numeric shard order, so
    per-shard order concatenates to the global
    order); the running sum inside each shard rides a partitioned
    window, per-shard totals roll up to a ``shards``-row offset table
    (the only unpartitioned window), and offset + in-shard prefix is
    the exact global prefix. One shuffle by shard + one dim-sized
    broadcast — the scan-chunk decomposition, same device at any
    scale.

    Returns ``(id, weight, cum_tokens)`` for the kept prefix, where
    ``cum_tokens`` is the inclusive global running total."""
    from pyspark.sql import Window

    prefix_len = 0
    s = shards
    while s > 1 and s % 16 == 0:
        s //= 16
        prefix_len += 1
    if s != 1 or prefix_len == 0:
        raise ValueError(
            f"shards must be a positive power of 16, got {shards}"
        )

    r = F.md5(F.col(id_col).cast("string"))
    d = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias(weight_col),
        r.alias("_r"),
    ).withColumn(
        "_shard",
        F.conv(F.substring("_r", 1, prefix_len), 16, 10).cast("long"),
    )
    win_in = (
        Window.partitionBy("_shard")
        .orderBy("_r", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = d.groupBy("_shard").agg(F.sum(weight_col).alias("_tot"))
    woff = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = tot.select(
        "_shard",
        F.coalesce(F.sum("_tot").over(woff), F.lit(0)).alias("_off"),
    )
    return (
        d.join(F.broadcast(off), on="_shard")
        .withColumn(
            "cum_tokens", F.col("_off") + F.sum(weight_col).over(win_in)
        )
        .filter(F.col("cum_tokens") - F.col(weight_col) < F.lit(budget))
        .select(id_col, weight_col, "cum_tokens")
    )


def span_corrupt(d: DataFrame, mask_pct: int = 15) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020) over a
    (doc_id, text) frame: ~``mask_pct``% of token positions mask
    deterministically (md5 device per (doc, pos)); consecutive masked
    runs collapse to one ``<extra_id_k>`` sentinel in the corrupted
    input, and the target lists each sentinel with its hidden tokens
    — the (input, target) pair a denoising LM pretrains on.

    Scale shape: one posexplode, then EVERYTHING is windows keyed by
    doc_id (run grouping, span starts, sentinel numbering — computed
    join-free: the masked-only row_number is a conditional cumulative
    sum over ALL tokens, the island key pos − that sum, the sentinel
    index a dense_rank over islands), so Catalyst plans ONE corpus
    shuffle on doc_id and sorts within it; the reassembly groupBy
    rides the same partitioning. No self-joins — the first cut of
    this operator joined toks×runs×spans and paid 4 corpus-token
    shuffles for the same answer (plan-pinned in test_scale_plans)."""
    from pyspark.sql import Window

    from .text import tokens as _tokens

    from ..util import posexplode_strict

    toks = posexplode_strict(
        d, _tokens("text"), "pos", "w", keep=("doc_id",)
    ).select(
        "doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "w"
    )
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                    F.lit(":mask"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    toks = toks.withColumn("masked", (u32 % 100) < mask_pct)
    wdoc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # masked-only row_number as a conditional running count → island
    # key, with NO filter/self-join (unmasked rows carry null grp)
    toks = toks.withColumn(
        "grp",
        F.when(
            F.col("masked"),
            F.col("pos")
            - F.sum(F.col("masked").cast("long")).over(wdoc),
        ),
    )
    wspan = Window.partitionBy("doc_id", "grp")
    toks = toks.withColumn(
        "span_start", F.when(F.col("masked"), F.min("pos").over(wspan))
    )
    # sentinel index: dense_rank of the island within the doc's masked
    # rows (grp is monotone in pos, so rank order == span order)
    wrank = Window.partitionBy("doc_id", "masked").orderBy("grp")
    toks = toks.withColumn(
        "k",
        F.when(F.col("masked"), F.dense_rank().over(wrank) - 1).cast(
            "long"
        ),
    )
    pieces = toks.select(
        "doc_id",
        "pos",
        F.when(~F.col("masked"), F.col("w"))
        .when(
            F.col("pos") == F.col("span_start"),
            F.concat(
                F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")
            ),
        )
        .alias("piece"),
        F.when(
            F.col("masked"),
            F.when(
                F.col("pos") == F.col("span_start"),
                F.concat(
                    F.lit("<extra_id_"),
                    F.col("k").cast("string"),
                    F.lit("> "),
                    F.col("w"),
                ),
            ).otherwise(F.col("w")),
        ).alias("tgt"),
    )

    def assemble(col: str) -> F.Column:
        return F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col(col).alias("v")))
                    ),
                    lambda s: s["v"],
                ),
                lambda v: v.isNotNull(),
            ),
        )

    return pieces.groupBy("doc_id").agg(
        F.count("tgt").alias("n_masked"),
        assemble("piece").alias("corrupted"),
        assemble("tgt").alias("target"),
    )


def shard_manifest(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    shards: int = 256,
) -> DataFrame:
    """Output-shard assignment + manifest for a packed training run:
    documents line up in the deterministic md5 content-hash order
    (same device as :func:`token_budget_sample`), and each one lands
    in output shard ``(cum_before_doc) DIV shard_tokens`` — so every
    shard holds ~``shard_tokens`` tokens, boundaries never split a
    document, and the assignment is reproducible on any engine and
    any partitioning. Returns one manifest row per output shard:
    ``(out_shard, n_docs, n_tokens, first_id, last_id)`` with
    first/last in hash order (what a writer needs to fence resumable
    shard uploads).

    The global prefix sum is the sharded two-phase decomposition
    (per-range windows + a bounded offset table) — no corpus-wide
    ordered window anywhere."""
    from pyspark.sql import Window

    prefix_len = 0
    s = shards
    while s > 1 and s % 16 == 0:
        s //= 16
        prefix_len += 1
    if s != 1 or prefix_len == 0:
        raise ValueError(
            f"shards must be a positive power of 16, got {shards}"
        )
    r = F.md5(F.col(id_col).cast("string"))
    d = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias(weight_col),
        r.alias("_r"),
    ).withColumn(
        "_shard",
        F.conv(F.substring("_r", 1, prefix_len), 16, 10).cast("long"),
    )
    win_in = (
        Window.partitionBy("_shard")
        .orderBy("_r", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = d.groupBy("_shard").agg(F.sum(weight_col).alias("_tot"))
    woff = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = tot.select(
        "_shard",
        F.coalesce(F.sum("_tot").over(woff), F.lit(0)).alias("_off"),
    )
    cum = (
        d.join(F.broadcast(off), on="_shard")
        .withColumn(
            "_cum", F.col("_off") + F.sum(weight_col).over(win_in)
        )
        .withColumn(
            "out_shard",
            F.floor(
                (F.col("_cum") - F.col(weight_col))
                / F.lit(shard_tokens)
            ).cast("long"),
        )
    )
    return cum.groupBy("out_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("n_tokens"),
        F.min_by(id_col, F.col("_r")).alias("first_id"),
        F.max_by(id_col, F.col("_r")).alias("last_id"),
    )
