"""Heavy hitters: mergeable Misra–Gries summaries and sketch-pruned
exact top-k.

The naive exact top-k (``groupBy(key).count().orderBy().limit(k)``)
shuffles one partial-count record per distinct key per map task. On a
100 TB corpus keyed by n-gram or token that is billions of distinct
keys through the exchange — the aggregation itself is fine, the
shuffle volume is the bottleneck. The classic fix is a two-pass
sketch-prune (Misra–Gries / SpaceSaving family, per the mergeable-
summaries line of work):

1. Each partition builds a capacity-``m`` Misra–Gries summary from its
   exact local counts (pandas ``value_counts`` — the partition stream
   fits in memory by construction). Only ``m`` rows per partition
   shuffle.
2. Summaries merge by summing counters then re-truncating to ``m``
   (sum, take top-m, subtract the (m+1)-th counter, clamp) — the
   standard mergeable-summary rule; total undercount is bounded by
   N/(m+1) per truncation.
3. Any key whose true count exceeds the accumulated error bound is
   GUARANTEED present in the merged summary, so the candidate set is a
   superset of the true top-k whenever c_k > error. A second pass
   recounts ONLY the candidates exactly (broadcast hash semi-filter on
   the map side — nothing else shuffles) and takes the top k.

The result is bit-exact top-k with two scans and O(partitions·m +
candidates) shuffle, instead of one scan and O(distinct keys) shuffle.
The error bound is returned alongside so callers can verify the
guarantee held (and fall back to the naive path if not).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import spread


def _mg_truncate(counts: pd.Series, m: int) -> tuple[pd.Series, int]:
    """Truncate exact/summed counters to a capacity-m Misra–Gries
    summary. Returns (summary, undercount_bound_added)."""
    if len(counts) <= m:
        return counts, 0
    counts = counts.sort_values(ascending=False, kind="stable")
    cutoff = int(counts.iloc[m])
    kept = (counts.iloc[:m] - cutoff).astype("int64")
    kept = kept[kept > 0]
    return kept, cutoff


def mg_partials(
    df: DataFrame, key_col: str, m: int = 1024
) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ m (key, weight, cut=0)
    rows per partition plus ONE sentinel row (key=NULL, weight=0,
    cut=<partition truncation cutoff>). ``weight`` is an UNDER-estimate
    of the partition-local count; summing the sentinel ``cut`` column
    across partitions recovers the total partition-level undercount so
    the merge can report a verifiable bound."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        for pb in batches:
            c = pb[key_col].value_counts()
            acc = c if acc is None else acc.add(c, fill_value=0)
        if acc is None or not len(acc):
            return
        kept, cutoff = _mg_truncate(acc.astype("int64"), m)
        yield pd.DataFrame(
            {
                "key": list(kept.index) + [None],
                "weight": list(kept.to_numpy()) + [0],
                "cut": [0] * len(kept) + [cutoff],
            }
        )

    return (
        spread(df)
        .select(F.col(key_col).cast("string").alias(key_col))
        .mapInPandas(summarize, schema="key string, weight long, cut long")
    )


def mg_merged(partials: DataFrame, m: int = 1024) -> DataFrame:
    """Merge per-partition summaries: sum weights per key (map-side
    combinable — the ONLY shuffle, ≤ partitions·m input rows), then
    re-truncate to capacity m.

    Returns (key, weight, bound): ``weight`` is a lower bound on the
    key's true global count; ``bound`` (constant across rows) is the
    accumulated undercount — Σ per-partition truncation cutoffs + the
    merge-level cutoff. Invariants: true_count(key) − weight ≤ bound
    for every returned key, and any key with true_count > bound is
    guaranteed present."""
    # ONE scan of the (expensive, mapInPandas-produced) partials: the
    # groupBy is the only shuffle, and every scalar the merge needs —
    # the summed sentinel cutoffs and the (m+1)-th weight — is carried
    # by whole-frame windows over the SMALL merged summary instead of
    # branching aggregates (each branch would re-execute the partials
    # scan: measured +0.5 s on the sf0.1 token corpus, 2× the sketch
    # pass at any scale). The windows run in one task over
    # ≤ partitions·m rows — the same scale class as the global
    # row_number rank this plan always had.
    from pyspark.sql import Window

    merged = partials.groupBy("key").agg(
        F.sum("weight").alias("weight"),
        F.sum("cut").alias("_cut"),
    )
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # INVARIANT (load-bearing ordering): the sentinel cutoff rows have
    # key = NULL (summarize emits one per partition), and their _cut
    # MUST be inside this whole-frame sum — so the _pcut window is
    # computed BEFORE the isNotNull filter below, and Spark will not
    # push a non-partition-column predicate through a Window. Do NOT
    # reorder: filtering nulls first (or adding key to the window
    # partition) silently drops the per-partition cutoffs from bound.
    # test_topk.py::test_null_sentinel_cut_reaches_bound pins this.
    merged = merged.withColumn(
        "_pcut", F.coalesce(F.sum("_cut").over(wall), F.lit(0))
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("weight").desc(), F.col("key").asc()
    )
    ranked = (
        merged.filter(F.col("key").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_mcut",
            F.coalesce(
                F.max(
                    F.when(F.col("_rn") == m + 1, F.col("weight"))
                ).over(wall),
                F.lit(0),
            ),
        )
    )
    return (
        ranked.filter(F.col("_rn") <= m)
        .select(
            "key",
            (F.col("weight") - F.col("_mcut")).alias("weight"),
            (F.col("_pcut") + F.col("_mcut")).alias("bound"),
        )
        .filter(F.col("weight") > 0)
    )


def sketch_pruned_topk(
    df: DataFrame, key_col: str, k: int = 20, m: int = 1024
) -> DataFrame:
    """Exact top-k keys by count, via MG candidate pruning + exact
    recount of candidates only — with the sketch guarantee VERIFIED,
    not assumed.

    The merged summary (≤ m rows — bounded driver-side materialization,
    same class as the IVF centroid sample) carries the accumulated
    undercount ``bound``. If the k-th largest summary weight (a lower
    bound on that key's true count) exceeds ``bound``, every key
    outside the candidate set has true count ≤ bound < the k-th
    candidate's count, so the candidate set provably contains the true
    top-k and the pruned recount is bit-exact. Otherwise (near-uniform
    keys, m too small) the guarantee cannot be certified and we fall
    back to the naive full-shuffle groupBy-count — correct on any
    distribution, just without the shuffle savings. See
    tests/test_topk.py for the adversarial (uniform) case."""
    summary = mg_merged(mg_partials(df, key_col, m=m), m=m).collect()
    weights = sorted((r["weight"] for r in summary), reverse=True)
    bound = summary[0]["bound"] if summary else 0
    certified = len(weights) >= k and weights[k - 1] > bound
    # NULL keys are excluded on BOTH paths (value_counts drops them in
    # the sketch, so the fallback must drop them too for path parity)
    keyed = (
        spread(df)
        .select(F.col(key_col).cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
    )
    if certified:
        cand = [r["key"] for r in summary]
        keyed = keyed.filter(F.col("key").isin(cand))
    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("key", "n", "rank")
    )


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
