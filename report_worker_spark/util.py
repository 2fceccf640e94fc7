"""Small shared utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_strict(
    df: DataFrame,
    arr: Column | str,
    alias: str,
    keep: Sequence[Column | str] = (),
) -> DataFrame:
    """``select(*keep, explode(arr))`` minus the optimizer's
    inferred-filter tax on expensive generator children.

    Catalyst's ``InferFiltersFromGenerate`` turns ``explode(f(x))``
    into ``Filter(size(f(x)) > 0 AND isnotnull(f(x)))`` + the
    generate, so the full generator expression is evaluated up to
    three times per input row — and because the filter references
    only base columns it is pushed below repartition exchanges into
    the (locally single-task) scan stage. Measured on the k-window
    posexplode at sf0.1: 2.33 s with the inferred filter vs 0.34 s
    without. The rule skips OUTER generates, so ``explode_outer``
    plus a cheap null-check on the generated attribute evaluates
    ``f`` exactly once and keeps the same rows.

    Row-equivalence caveat: ``explode`` keeps a row whose array
    *element* is NULL, the post-filter here drops it — use only when
    elements are provably non-null (split/hash/struct outputs, as
    everywhere in this package); :func:`posexplode_strict` is exact
    unconditionally (the position of a real element is never null).
    """
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.where(F.col(alias).isNotNull())


def posexplode_strict(
    df: DataFrame,
    arr: Column | str,
    pos_alias: str,
    alias: str,
    keep: Sequence[Column | str] = (),
) -> DataFrame:
    """``select(*keep, posexplode(arr))`` without the inferred-filter
    re-evaluation — see :func:`explode_strict`. Filtering on the
    generated *position* keeps null array elements, so this variant is
    row-for-row identical to ``posexplode`` on every input."""
    out = df.select(*keep, F.posexplode_outer(arr).alias(pos_alias, alias))
    return out.where(F.col(pos_alias).isNotNull())


def spread_hash(
    df: DataFrame, *cols: Column | str, min_partitions: int | None = None
) -> DataFrame:
    """Hash-repartition on ``cols`` with an EXPLICIT partition count.

    AQE's byte-based coalescing sizes post-shuffle partitions by
    bytes, so a small-byte/heavy-compute stage (grouped Arrow matmul,
    per-group Python work) collapses to 1-2 partitions and runs
    serially — measured 4.1 s single-task for sim_lsh_topk's bucket
    stage at sf0.1. An explicit-count repartition is exempt from
    coalescing, and hash partitioning on the group keys satisfies the
    ClusteredDistribution of a following window / groupBy-apply on
    those keys, so this pins the width of the exchange the stage needs
    anyway rather than adding one. Scale-adaptive: defaults to the
    cluster's defaultParallelism, not a constant."""
    sc = df.sparkSession.sparkContext
    return df.repartition(min_partitions or sc.defaultParallelism, *cols)


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (bytes), or None when the
    estimate is unavailable or the don't-know sentinel (defaults to
    Long.MaxValue-ish values for unsized relations)."""
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # noqa: BLE001 — stats are best-effort
        return None
    return est if 0 < est < (1 << 50) else None


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions to parallelize CPU-heavy per-row work.

    A small parquet table arrives as ONE split (files.maxPartitionBytes
    ≫ file size), serializing expensive expression work (shingling,
    hashing, per-dim dot products) onto a single core. At real scale
    inputs are already many splits and this is a no-op; locally it
    costs one small shuffle and buys core-count speedup.

    Width is BYTE-SIZED, not a flat defaultParallelism (VERDICT_r14
    item 4): ``min(defaultParallelism, ceil(bytes / target))`` with
    target = $SPARK_GRAFT_SPREAD_TARGET_KB (default 64 KB — sized so a
    task carries tens of ms of shingle/hash work, ~the measured local
    task overhead ×several; the r14 8-vs-32-core sweep showed flat
    defaultParallelism widths cost more in scheduling than they buy on
    sub-MB inputs: the full 8-core sweep beat the 32-core one). At
    cluster scale the estimate is huge, the cap binds, and behavior is
    unchanged — inputs there are already many splits, so this stays a
    no-op.
    """
    import os

    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if min_partitions is None:
        est = _plan_size_bytes(df)
        if est is not None:
            per_part = 1024 * int(
                os.environ.get("SPARK_GRAFT_SPREAD_TARGET_KB", "64")
            )
            target = max(2, min(target, -(-est // per_part)))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction for streaming output directories.

    Micro-batch sinks produce one file per partition per epoch; at 60 s
    triggers that is thousands of small files a day and read
    amplification kills scan throughput. Rewrite the directory into
    ~target-sized files (optionally sorted for better min/max pruning
    — the poor man's Z-order). Returns the new file count.

    Write-then-swap: the rewrite lands in a sibling directory and is
    moved over only on success, so readers never see a half-compacted
    table.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    size_b = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size_b / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "._compact_tmp"
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def pickle_by_value(module) -> None:
    """Make a kernel-bearing module self-contained on executors.

    Worker-side Python kernels (mapInPandas / applyInPandas closures)
    that reference module-level helpers are serialized by REFERENCE by
    default, which requires this package to be importable inside every
    Python worker. The external driver may run from any cwd with the
    repo only on the driver's sys.path — so register the module for
    by-value serialization instead: the function code ships inside the
    task closure and executors never import the package.
    """
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:  # noqa: BLE001 — best-effort; by-reference still works in-repo
        pass


def zorder_key_2d(a, b):
    """64-bit Z-order (Morton) key interleaving two 31-bit non-negative
    ints — the clustering key for 2-dimensional min/max pruning: sorting
    a table by z(a, b) keeps BOTH columns' values locally dense in every
    file/row-group, so range predicates on either dimension prune. Pure
    bit arithmetic (magic-number bit spreading), identical in ANSI SQL.

    Pair with ``compact_parquet(sort_by=[zkey])``: the poor man's
    Z-order clustering (what Delta/Iceberg OPTIMIZE ZORDER does).
    """
    from pyspark.sql import Column, functions as F

    def spread_bits(c) -> "Column":
        x = (c if isinstance(c, Column) else F.col(c)).cast("long")
        for sh, mask in [
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ]:
            # Column.__or__ is logical OR — bitwiseOR is the bit op
            x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
        return x

    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))
