"""Similarity search over embedding columns (``array<float>``).

Three strategies, increasingly scale-friendly:

- ``brute_topk_expr``  : expression-based exact cosine top-k (cross
  join + sequential-fold dot product). Bit-reproducible against an
  ANSI-SQL oracle (both fold left-to-right in float64) — the
  correctness baseline. O(n²·d) — test scale only.
- ``brute_topk_matmul``: exact top-k via Arrow-batched pandas
  (``mapInPandas``) — each partition multiplies its block against a
  broadcast candidate matrix with BLAS. Still O(n²·d) flops but ~100×
  the throughput; right up to ~10⁶ candidates × any query count.
- ``lsh_topk``         : random-hyperplane LSH buckets + per-bucket
  exact re-rank — the 100 TB path: shuffle is per-bucket, never n².
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import spread, spread_hash


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential left-to-right float64 dot product — matches DuckDB's
    list_dot_product on DOUBLE[] bit-for-bit (verified)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_fold(a, a))


def fold_cos_pairs_arrow(pairs: DataFrame, out: str = "cos") -> DataFrame:
    """Exact per-pair cosine for candidate pairs carrying
    (id_a, id_b, v_a, v_b, n_a, n_b) — the Arrow replay of
    ``dot_fold(v_a, v_b) / (n_a * n_b)`` (r15; guide §4.2).

    BIT-IDENTICAL to the expression form: the kernel walks the
    dimensions left-to-right with one float64 multiply then one float64
    add per step (``acc = acc + va[:, d] * vb[:, d]``) — element for
    element the same IEEE-754 operation sequence the interpreted
    ``aggregate(zip_with(...))`` fold performs per pair, vectorized
    ACROSS pairs, so a batch costs d numpy ufunc calls instead of
    |pairs|·d interpreted lambda evaluations. numpy's ``multiply`` and
    ``add`` ufuncs round separately (no FMA contraction), float32 →
    float64 widening is exact in both engines, and the final divide
    matches the expression's dot/(n_a·n_b) shape. Bit-parity is pinned
    by tests/test_similarity_guard.py.
    """

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pb in batches:
            if not len(pb):
                continue
            va = np.stack(pb["v_a"].to_numpy()).astype(np.float64)
            vb = np.stack(pb["v_b"].to_numpy()).astype(np.float64)
            acc = np.zeros(len(pb), dtype=np.float64)
            for d in range(va.shape[1]):
                acc = acc + va[:, d] * vb[:, d]
            cos = acc / (pb["n_a"].to_numpy() * pb["n_b"].to_numpy())
            yield pd.DataFrame(
                {
                    "id_a": pb["id_a"].to_numpy(),
                    "id_b": pb["id_b"].to_numpy(),
                    out: cos,
                }
            )

    return pairs.select(
        "id_a", "id_b", "v_a", "v_b", "n_a", "n_b"
    ).mapInPandas(score, schema=f"id_a long, id_b long, {out} double")


def _exact_rerank_topk(
    cand: DataFrame, vecs: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Shared exact-cosine re-rank tail of the ANN paths (lsh_topk /
    ivf_topk / ivfpq_topk / blocked_topk_matmul): attach vectors +
    norms to the candidate id pairs, score with
    :func:`fold_cos_pairs_arrow`, keep top-k per query. ``vecs`` must
    be (_id, _v, _n). The per-pair interpreted fold this replaces was
    the paths' per-task hotspot at sf0.1 (~0.3-0.5 M candidate pairs ×
    64 interpreted lambda steps)."""
    scored = fold_cos_pairs_arrow(
        cand.join(
            vecs.select(
                F.col("_id").alias("id_a"),
                F.col("_v").alias("v_a"),
                F.col("_n").alias("n_a"),
            ),
            on="id_a",
        ).join(
            vecs.select(
                F.col("_id").alias("id_b"),
                F.col("_v").alias("v_b"),
                F.col("_n").alias("n_b"),
            ),
            on="id_b",
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cos").desc(), F.col("id_b").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("rn").alias("rank"),
            F.col("id_b").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (l2_norm(a) * l2_norm(b))


def brute_topk_expr(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact all-pairs cosine top-k neighbors (self-similarity excluded),
    deterministic tiebreak by neighbor id.

    Three plan-shape wins over the naive form, all bit-identical (r11):
    the two norms are computed once per ROW before the join (n folds,
    not 3n² per-pair folds); the streamed side is ``spread`` so the n²
    pair loop parallelizes (a small parquet corpus arrives as ONE split
    → one task owns every pair); the per-pair dot stays a single
    ``dot_fold`` — one zip_with/aggregate pass over the arrays, which
    measures ~7× FASTER per pair than a flat unrolled element_at chain
    (2.3 s vs 16.5 s per 4M pairs on 32 cores; element_at pays per-call
    bounds/null dispatch, the fold streams the array once)."""
    a = spread(df).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    a = a.withColumn("n_a", l2_norm(F.col("v_a")))
    b = b.withColumn("n_b", l2_norm(F.col("v_b")))
    pairs = a.crossJoin(b).filter(F.col("id_a") != F.col("id_b"))
    # Arrow fold-replay (r15): bit-identical to the dot_fold expression,
    # d ufunc calls per batch instead of n²·d interpreted lambda steps.
    # It also drops the vectors BEFORE the ranking shuffle: the window
    # repartitions all n² pair rows by id_a, and carrying two 64-float
    # arrays through that exchange is ~20× the bytes of (id, id, cos) —
    # measured 16 s vs 3 s at sf0.1.
    pairs = fold_cos_pairs_arrow(pairs)
    w = Window.partitionBy("id_a").orderBy(F.col("cos").desc(), F.col("id_b").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("rn").alias("rank"),
            F.col("id_b").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
        )
    )


def brute_topk_matmul(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Exact cosine top-k via per-partition BLAS matmul against a
    broadcast candidate matrix (Arrow in/out, no per-row Python).

    This is the documented mid-tier: the candidate matrix is collected
    to the driver and broadcast, so it only fits corpora whose vectors
    fit in driver + executor memory (~1e6 × 64 dims ≈ 0.5 GiB).
    ``max_rows`` enforces that contract — above it, raises and points
    callers at :func:`blocked_topk_matmul`, which tiles both sides and
    never materializes the corpus on the driver. Same guard pattern as
    ``operators.masked_position_pairs``.
    """
    spark = df.sparkSession
    # Enforce the guard on the collect itself (limit max_rows+1) instead
    # of a separate count() job — one source scan, not two.
    pdf = df.select(id_col, vec_col).limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"brute_topk_matmul broadcasts the whole corpus to every "
            f"executor and is bounded at max_rows={max_rows} rows "
            f"(got >{max_rows}); use blocked_topk_matmul for larger "
            f"corpora — it tiles candidates into n_blocks broadcast "
            f"slices and keeps per-task memory bounded"
        )
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand_ids, cand = bc.value
        for pb in batches:
            if len(pb) == 0:
                continue
            q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ cand.T  # (batch, n_candidates)
            qids = pb[id_col].to_numpy()
            out = []
            for row_i in range(sims.shape[0]):
                s = sims[row_i]
                self_mask = cand_ids == qids[row_i]
                s = np.where(self_mask, -np.inf, s)
                # arg-top-k with (cos desc, id asc) tiebreak
                order = np.lexsort((cand_ids, -s))[:k]
                for rank, j in enumerate(order, 1):
                    out.append((qids[row_i], rank, cand_ids[j], s[j]))
            yield pd.DataFrame(
                out, columns=[id_col, "rank", "neighbor_id", "cosine"]
            )

    schema = f"{id_col} long, rank int, neighbor_id long, cosine double"
    return spread(df.select(id_col, vec_col)).mapInPandas(part, schema=schema)


def blocked_topk_matmul(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_blocks: int = 8,
    n_query_groups: int = 8,
) -> DataFrame:
    """Exact cosine top-k with NO driver round-trip — the scale path for
    exact search (VERDICT r1 #3: ``brute_topk_matmul`` collects the
    candidate matrix to the driver and caps at ~10⁶ vectors).

    Block-partitioned matrix product: queries are salted into Q groups
    and replicated across B candidate blocks; candidates are salted into
    B blocks and replicated across Q groups; a cogroup on (group, block)
    gives Q·B independent BLAS tiles of size (n/Q)×(n/B). Data shuffled
    is n·(B+Q) rows — linear in n with small constants — versus the n²
    a pairwise join would move, and no single node ever holds more than
    one tile. Each tile emits a generous partial top-k by BLAS score;
    survivors are re-scored with the sequential-fold EXACT cosine
    (bit-identical to the SQL oracle) and reduced by a final window, so
    BLAS summation-order ULPs cannot perturb the result.
    """
    spark = df.sparkSession
    src = spread(df.select(id_col, vec_col))
    # the candidate side re-derives from the same plan as the query side;
    # no-op expressions mint fresh attribute ids so the cogroup below
    # isn't flagged as an ambiguous self-join (keys resolve per side —
    # there is no cross-side column correlation to disambiguate)
    c_src = src.select(
        (F.col(id_col) + F.lit(0)).alias(id_col),
        F.coalesce(F.col(vec_col)).alias(vec_col),
    )
    qg = spark.range(n_query_groups).select(F.col("id").cast("int").alias("qg"))
    blk = spark.range(n_blocks).select(F.col("id").cast("int").alias("blk"))
    q_rep = (
        src.withColumn("qg", F.pmod(F.xxhash64(id_col), n_query_groups).cast("int"))
        .crossJoin(F.broadcast(blk))
    )
    c_rep = (
        c_src.withColumn("blk", F.pmod(F.xxhash64(id_col), n_blocks).cast("int"))
        .crossJoin(F.broadcast(qg))
    )
    m = 2 * k + 8  # partial-top margin absorbing BLAS-vs-fold ULP ties

    def tile(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        qm = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
        cm = np.stack(cpdf[vec_col].to_numpy()).astype(np.float64)
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        sims = qm @ cm.T
        qids = qpdf[id_col].to_numpy()
        cids = cpdf[id_col].to_numpy()
        top = min(m, sims.shape[1])
        out_a, out_b = [], []
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        for i in range(len(qids)):
            cand = cids[idx[i]]
            keep = cand != qids[i]
            out_a.extend([qids[i]] * int(keep.sum()))
            out_b.extend(cand[keep].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    cand = (
        spread_hash(q_rep, "qg", "blk")
        .groupBy("qg", "blk")
        .cogroup(spread_hash(c_rep, "qg", "blk").groupBy("qg", "blk"))
        .applyInPandas(tile, schema="id_a long, id_b long")
        .dropDuplicates(["id_a", "id_b"])
    )
    # pin the exact-re-rank stage's width: the dedup exchange is
    # byte-coalesced by AQE (id pairs are tiny), which would run the
    # per-pair fold below in 1-2 tasks (r14: measured 38 s JVM CPU in a
    # 2-task stage on the lsh_topk twin); hashing on id_a also serves
    # the final window's clustering, so no exchange is added
    cand = spread_hash(cand, "id_a")
    vecs = src.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    return _exact_rerank_topk(cand, vecs, k, id_col)


def md5_planes(
    n_tables: int, n_planes: int, dim: int, tag: str
) -> list[list[list[float]]]:
    """Deterministic hyperplanes in [-1, 1) from an md5 keystream —
    (n_tables, n_planes, dim) nested lists whose double literals an
    ANSI-SQL oracle can embed verbatim (same device as
    ``semdedup_planes``)."""
    import hashlib

    return [
        [
            [
                int(
                    hashlib.md5(f"{tag}:{t}:{p}:{d}".encode()).hexdigest()[:8],
                    16,
                )
                / 2**32 * 2 - 1
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def md5_centroids(n_centroids: int, dim: int, tag: str) -> list[list[float]]:
    """Deterministic UNIT-NORM centroids from an md5 keystream —
    (n_centroids, dim) nested lists. Normalization happens here, once,
    in float64, so the exact normalized doubles round-trip through
    ``repr`` into an ANSI-SQL oracle literal and both engines score
    cells against bit-identical centroid values (the IVF member of the
    md5_planes / semdedup_planes device family)."""
    import hashlib

    out = []
    for c in range(n_centroids):
        raw = [
            int(
                hashlib.md5(f"{tag}:{c}:{d}".encode()).hexdigest()[:8], 16
            )
            / 2**32 * 2 - 1
            for d in range(dim)
        ]
        nrm = float(np.linalg.norm(np.asarray(raw, dtype=np.float64)))
        out.append([float(x) for x in np.asarray(raw, np.float64) / nrm])
    return out


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    bucket_cap: int = 8192,
    md5_plane_tag: str | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets (n_tables
    independent tables), BLAS partial top-m inside each bucket, exact
    cosine re-rank of the surviving candidates.

    At scale: bucket cardinality ~n/2^planes per table. The within-
    bucket search runs as a grouped Arrow matmul that emits only the
    top-(2k+8) candidate IDS per query per bucket — total candidate
    volume is O(n·tables·k) id pairs, never the O(n²/2^planes · dim)
    vector-laden pair join of the naive formulation (which went ~75×
    superlinear between sf0.1 and the k=10 stress run: the shuffle
    carried both full vectors through a pair dedup). Survivors are
    re-scored with the sequential-fold EXACT cosine, so the final
    ranking is bit-identical to the all-pairs variant (the BLAS margin
    absorbs summation-order ULPs, same argument as
    ``blocked_topk_matmul``).

    Hot-bucket guard: a pathological bucket (skewed data, n_planes too
    small for n — e.g. many identical vectors, which NO number of
    hyperplanes can separate) would otherwise do its whole B² in one
    task. Buckets above ``bucket_cap`` rows are instead tiled: rows
    split into nb = ceil(B/cap) id-hash blocks, every (query-block,
    corpus-block) tile is its own Arrow group, and per-tile top-m
    per query is lossless for the bucket-level top-m (same
    per-partition-top-k argument as ``crossset_topk``). Per-task input
    stays ≤ 2·ceil(B/nb) ≤ ~2·cap rows regardless of skew; the B²
    compute still happens (it is inherent to the bucket's geometry)
    but spread across nb² bounded tasks instead of one straggler.
    ``bucket_cap=None`` disables the guard (bit-compat with the
    pre-guard plan).

    ``md5_plane_tag`` switches the plane source from seeded Gaussian
    to the md5 keystream AND the bucket assignment from the Arrow
    matmul to JVM sequential-fold dot products — signs then match an
    ANSI-SQL twin bit-for-bit (BLAS sums in a different order, so a
    |dot| within summation ULP of zero could flip a bucket bit across
    engines; the fold path removes that hazard structurally). Use for
    oracle-paired configurations; the BLAS path remains the default
    for large table×plane counts.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    df = spread(df)
    if md5_plane_tag is not None:
        planes3 = md5_planes(n_tables, n_planes, dim, md5_plane_tag)
        v = F.col(vec_col)
        pairs = []
        for t in range(n_tables):
            bkt = None
            for p in range(n_planes):
                lit = F.array(*[F.lit(x) for x in planes3[t][p]])
                bit = (
                    F.when(dot_fold(v, lit) > 0, F.lit(1 << p))
                    .otherwise(F.lit(0))
                )
                bkt = bit if bkt is None else bkt + bit
            pairs.append(
                F.struct(
                    F.lit(t).alias("tbl"), bkt.cast("long").alias("bkt")
                )
            )
        assigned = df.select(
            F.col(id_col).alias("_id"), F.explode(F.array(*pairs)).alias("_tb")
        ).select("_id", F.col("_tb.tbl").alias("tbl"), F.col("_tb.bkt").alias("bkt"))
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, n_planes, dim))
        # One Arrow-batched matmul assigns ALL (table, bucket) pairs per
        # vector: (n,dim) @ (dim, tables·planes) → sign bits → packed ids.
        # (Per-dim column expressions here exceed janino's 64 KB method
        # limit — codegen silently falls back to the interpreted path and
        # runs ~10× slower; measured.)
        flat = planes.reshape(n_tables * n_planes, dim).T  # (dim, T*P)
        bc = df.sparkSession.sparkContext.broadcast(flat)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            w = bc.value
            weights = 1 << np.arange(n_planes)
            for pb in batches:
                if not len(pb):
                    continue
                q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
                bits = (q @ w > 0).reshape(len(pb), n_tables, n_planes)
                buckets = (bits * weights).sum(axis=2)  # (n, T)
                rows = {
                    "_id": np.repeat(pb[id_col].to_numpy(), n_tables),
                    "tbl": np.tile(np.arange(n_tables), len(pb)),
                    "bkt": buckets.reshape(-1),
                }
                yield pd.DataFrame(rows)

        assigned = df.select(id_col, vec_col).mapInPandas(
            assign, schema="_id long, tbl int, bkt long"
        )
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    tagged = spread_hash(
        assigned.join(vecs.select("_id", "_v"), on="_id"), "tbl", "bkt"
    )
    m = 2 * k + 8  # partial-top margin absorbing BLAS-vs-fold ULP ties

    def bucket_topm(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        ids = pdf["_id"].to_numpy()
        out_a: list = []
        out_b: list = []
        top = min(m + 1, len(ids))  # +1: the query itself is in the bucket
        for s in range(0, len(ids), 1024):
            sims = unit[s : s + 1024] @ unit.T
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            for i in range(sims.shape[0]):
                cand = ids[idx[i]]
                keep = cand != ids[s + i]
                out_a.extend([ids[s + i]] * int(keep.sum()))
                out_b.extend(cand[keep].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    def tile_topm(pdf: pd.DataFrame) -> pd.DataFrame:
        """One (query-block, corpus-block) tile of a hot bucket: emit
        each query row's top-m among the tile's corpus rows."""
        q = pdf[pdf["_isq"] == 1]
        c = pdf[pdf["_isq"] == 0]
        if not len(q) or not len(c):
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        cmat = np.stack(c["_v"].to_numpy()).astype(np.float64)
        cn = np.linalg.norm(cmat, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        cunit = cmat / cn
        cids = c["_id"].to_numpy()
        qmat = np.stack(q["_v"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qunit = qmat / qn
        qids = q["_id"].to_numpy()
        out_a: list = []
        out_b: list = []
        top = min(m + 1, len(cids))  # +1: self may sit in this tile
        for s in range(0, len(qids), 1024):
            sims = qunit[s : s + 1024] @ cunit.T
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            for i in range(sims.shape[0]):
                cand_ids = cids[idx[i]]
                keep = cand_ids != qids[s + i]
                out_a.extend([qids[s + i]] * int(keep.sum()))
                out_b.extend(cand_ids[keep].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    if bucket_cap is None:
        grouped = tagged
        hot = None
    else:
        # bucket sizes via a window count over the SAME hash exchange
        # the grouped-Arrow stage needs anyway (ClusteredDistribution
        # on (tbl, bkt) is satisfied by the window's partitioning, so
        # the guard adds a sort, not a second scan of the Python
        # assign pass — a sizes-join formulation re-ran it, +30%
        # measured at sf0.1)
        wsz = Window.partitionBy("tbl", "bkt")
        tagged_sz = tagged.withColumn("_bsz", F.count(F.lit(1)).over(wsz))
        grouped = tagged_sz.filter(F.col("_bsz") <= bucket_cap).drop("_bsz")
        hot = (
            tagged_sz.filter(F.col("_bsz") > bucket_cap)
            .withColumn(
                "_nb",
                F.ceil(F.col("_bsz") / F.lit(bucket_cap)).cast("int"),
            )
            .drop("_bsz")
        )

    cand = grouped.groupBy("tbl", "bkt").applyInPandas(
        bucket_topm, schema="id_a long, id_b long"
    )
    if hot is not None:
        blocks = F.sequence(F.lit(0), F.col("_nb") - 1)
        qside = hot.select(
            "tbl", "bkt", "_id", "_v",
            F.pmod("_id", F.col("_nb")).alias("_qb"),
            F.explode(blocks).alias("_cb"),
            F.lit(1).alias("_isq"),
        )
        cside = hot.select(
            "tbl", "bkt", "_id", "_v",
            F.explode(blocks).alias("_qb"),
            F.pmod("_id", F.col("_nb")).alias("_cb"),
            F.lit(0).alias("_isq"),
        )
        hot_cand = (
            qside.unionByName(cside)
            .groupBy("tbl", "bkt", "_qb", "_cb")
            .applyInPandas(tile_topm, schema="id_a long, id_b long")
        )
        cand = cand.unionByName(hot_cand)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    # pin the exact-re-rank stage's width (see blocked_topk_matmul): the
    # dedup exchange byte-coalesces to 1-2 tasks, serializing the
    # per-pair fold below; hash on id_a doubles as the final window's
    # distribution, so this replaces that exchange rather than adding one
    cand = spread_hash(cand, "id_a")
    # attach vectors + norms AFTER dedup: only O(n·tables·k) id pairs
    # ever carry vector payload; norm computed once per side, cosine is
    # one Arrow fold-replay + a divide (cosine() would fold 3× per pair)
    return _exact_rerank_topk(cand, vecs, k, id_col)


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 8,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via hyperplane LSH + exact verification.

    For pairs at cosine ≥ 0.99 the per-table collision probability is
    (1 - θ/π)^planes ≈ 0.69, so 12 independent tables miss a true pair
    with probability ≈ (1-0.69)^12 ≈ 8e-7 — recall is effectively 1 for
    the high-similarity pairs near-dup dedup targets (unlike top-k over
    near-orthogonal vectors, where no hyperplane family can help).
    Candidates come from equi-joins on (table, bucket); each candidate
    is verified with the exact cosine before admission, so the output
    is bit-comparable to a brute-force oracle.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    df = spread(df)
    rng = np.random.default_rng(seed)
    flat = rng.standard_normal((n_tables, n_planes, dim)).reshape(
        n_tables * n_planes, dim
    ).T
    bc = df.sparkSession.sparkContext.broadcast(flat)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc.value
        weights = 1 << np.arange(n_planes)
        for pb in batches:
            if not len(pb):
                continue
            q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            bits = (q @ w > 0).reshape(len(pb), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)
            yield pd.DataFrame(
                {
                    "_id": np.repeat(pb[id_col].to_numpy(), n_tables),
                    "tbl": np.tile(np.arange(n_tables), len(pb)),
                    "bkt": buckets.reshape(-1),
                }
            )

    assigned = df.select(id_col, vec_col).mapInPandas(
        assign, schema="_id long, tbl int, bkt long"
    )
    cand = (
        assigned.alias("a")
        .join(assigned.alias("b"), on=["tbl", "bkt"])
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # pin the exact-verify stage's width (see blocked_topk_matmul): the
    # dedup exchange byte-coalesces to 1-2 tasks and the per-pair fold
    # below serializes; one extra tiny exchange of id pairs buys a
    # full-width verify
    cand = spread_hash(cand, "id_a")
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    cand = (
        cand.join(
            vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("v_a"),
                        F.col("_n").alias("n_a")),
            on="id_a",
        )
        .join(
            vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("v_b"),
                        F.col("_n").alias("n_b")),
            on="id_b",
        )
    )
    return (
        fold_cos_pairs_arrow(cand, out="cosine")
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs (id_a < id_b, cosine ≥ threshold).
    Exact (cross join) — the oracle-comparable baseline; swap in
    ``lsh_topk`` candidates at scale. Same per-row norms + spread
    streamed side + single per-pair fold as ``brute_topk_expr``."""
    a = spread(df).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    a = a.withColumn("n_a", l2_norm(F.col("v_a")))
    b = b.withColumn("n_b", l2_norm(F.col("v_b")))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # Arrow fold-replay (r15): bit-identical to the dot_fold expression
    return (
        fold_cos_pairs_arrow(pairs, out="cosine")
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 42,
    md5_centroid_tag: str | None = None,
    dim: int = 64,
) -> DataFrame:
    """Approximate ANN via IVF (inverted file): k-means centroids on a
    deterministic sample, each vector assigned to its nearest centroid,
    queries probe the ``n_probe`` nearest cells and re-rank exactly.

    ``md5_centroid_tag`` switches the coarse quantizer from trained
    k-means to fixed md5-keystream unit centroids (``md5_centroids``),
    making cell assignment and probe routing reproducible from SQL
    double literals: per-query cell ORDER under cosine equals the
    order of raw dot(v, c_j) (unit centroids, per-query positive
    norm), so a DuckDB oracle ranks cells by ``list_dot_product``
    alone. Recall is worse than trained centroids (cells ignore the
    data distribution) — this is the verification configuration, not
    the production one.

    Scale shape: centroid training is driver-side numpy on a bounded
    sample; assignment is one Arrow-batched pass (no shuffle); the
    within-cell search is a cogrouped Arrow matmul (queries probing the
    cell × members of the cell) emitting only top-(2k+8) candidate IDS
    per query per probed cell — O(n·n_probe·k) id pairs total, never
    the O(n·n_probe·cell_size·dim) vector-laden pair join of the naive
    formulation (measured ~75× superlinear between sf0.1 and the k=10
    stress run). Survivors re-rank with the sequential-fold EXACT
    cosine, so the result is bit-identical to the all-pairs variant.
    Per-query work is n_probe cells ≈ (n/n_centroids)·n_probe
    candidates instead of n. Recall rises with n_probe
    (n_probe = n_centroids ⇒ exact).
    """
    spark = df.sparkSession
    if md5_centroid_tag is not None:
        cent = np.asarray(
            md5_centroids(n_centroids, dim, md5_centroid_tag), np.float64
        )
    else:
        # deterministic bounded sample for training: ordered take — a
        # bare limit() is partition-order dependent and would make
        # centroids (and every downstream assignment) vary across
        # cluster layouts
        sample = (
            df.select(id_col, vec_col).orderBy(id_col).limit(4096).toPandas()
        )
        mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        rng = np.random.default_rng(seed)
        cent = mat[
            rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
        ]
        for _ in range(kmeans_iters):
            assign = np.argmax(mat @ cent.T, axis=1)  # cosine, unit vectors
            for c in range(len(cent)):
                members = mat[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        cent[c] = m / n
    bc = spark.sparkContext.broadcast(cent)

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pb in batches:
            if not len(pb):
                continue
            q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ c.T
            # stable sort: exact-tie cells resolve to the lower index,
            # matching the oracle's (sim DESC, cell ASC) window order
            order = np.argsort(-sims, axis=1, kind="stable")
            rows = []
            for i in range(len(pb)):
                rows.append(
                    {
                        id_col: pb[id_col].iloc[i],
                        "cell": int(order[i, 0]),
                        "probes": [int(x) for x in order[i, :n_probe]],
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "cell", "probes"])

    cells = spread(df.select(id_col, vec_col)).mapInPandas(
        assign_cells, schema=f"{id_col} long, cell int, probes array<int>"
    )
    # lazy pin: tagged feeds BOTH cogroup sides — without it the Python
    # assign pass and the id join run twice (r14)
    tagged = (
        df.select(id_col, vec_col)
        .join(cells, on=id_col)
        .localCheckpoint(eager=False)
    )

    data_side = tagged.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "cell"
    )
    # fresh attribute ids (no-op exprs) so the cogroup below isn't
    # flagged as an ambiguous self-join — same idiom as
    # ``blocked_topk_matmul``
    query_side = tagged.select(
        (F.col(id_col) + F.lit(0)).alias("_id"),
        F.coalesce(F.col(vec_col)).alias("_v"),
        F.explode("probes").alias("cell"),
    )
    m = 2 * k + 8  # partial-top margin absorbing BLAS-vs-fold ULP ties

    def tile(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        qm = np.stack(qpdf["_v"].to_numpy()).astype(np.float64)
        cm = np.stack(cpdf["_v"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        cn = np.linalg.norm(cm, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        cn[cn == 0] = 1.0
        qm, cm = qm / qn, cm / cn
        qids = qpdf["_id"].to_numpy()
        cids = cpdf["_id"].to_numpy()
        top = min(m + 1, len(cids))  # +1: own cell contains the query
        out_a: list = []
        out_b: list = []
        for s in range(0, len(qids), 1024):
            sims = qm[s : s + 1024] @ cm.T
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            for i in range(sims.shape[0]):
                cand = cids[idx[i]]
                keep = cand != qids[s + i]
                out_a.extend([qids[s + i]] * int(keep.sum()))
                out_b.extend(cand[keep].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    # each data vector lives in exactly ONE cell, so (id_a, id_b) pairs
    # are already unique across tiles — no dedup shuffle needed
    cand = (
        spread_hash(query_side, "cell")
        .groupBy("cell")
        .cogroup(spread_hash(data_side, "cell").groupBy("cell"))
        .applyInPandas(tile, schema="id_a long, id_b long")
    )
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    return _exact_rerank_topk(cand, vecs, k, id_col)


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])


def crossset_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Cross-set exact top-k: for every query vector, its k nearest
    corpus vectors by cosine — the SERVING shape (the self-join top-k
    ops index one table; this looks a bounded query set up against a
    corpus).

    Scale shape: the query matrix broadcasts (the documented
    broadcast-sized tier — batch lookups are thousands of queries, not
    the corpus; like lsh_topk's driver samples this is a BOUNDED
    driver-side collect, capped at ``max_queries`` rows and rejected
    loudly above that — route bigger query sets through the self-join
    ops instead); the corpus makes ONE Arrow pass emitting each
    partition's top-k candidate IDS per query (per-partition top-k is
    lossless for global top-k), and only |Q|·k·partitions id pairs
    shuffle into the exact sequential-fold re-rank — bit-identical to
    the all-pairs formulation, no corpus shuffle, no driver round-trip
    of the corpus. The query matrix ships to executors ONLY via the
    broadcast handle (the kernel closes over nothing else), so it is
    serialized once, not once per task."""
    max_queries = 100_000
    spark = queries.sparkSession
    qpd = (
        queries.select(id_col, vec_col).limit(max_queries + 1).toPandas()
    )
    if not len(qpd):
        raise ValueError("crossset_topk: empty query set")
    if len(qpd) > max_queries:
        raise ValueError(
            f"crossset_topk: query set exceeds the broadcast tier cap "
            f"({max_queries} rows); use the self-join top-k operators "
            "for corpus-sized query sets"
        )
    qmat = np.stack(qpd[vec_col].to_numpy()).astype(np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    qunit = qmat / qnorm
    qids = qpd[id_col].to_numpy()
    bc = spark.sparkContext.broadcast((qids, qunit))

    m_margin = 2 * k + 8  # BLAS-vs-fold ULP margin (same as lsh_topk)

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, qu = bc.value
        best_scores = None  # (|Q|, k) partial
        best_ids = None
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cos = qu @ (m / norms).T  # (|Q|, batch)
            cids = pb[id_col].to_numpy()
            if best_scores is None:
                best_scores = np.full((len(ids_q), 0), -2.0)
                best_ids = np.full((len(ids_q), 0), -1, dtype=np.int64)
            best_scores = np.concatenate([best_scores, cos], axis=1)
            best_ids = np.concatenate(
                [best_ids, np.broadcast_to(cids, (len(ids_q), len(cids)))], axis=1
            )
            if best_scores.shape[1] > 4 * m_margin:
                idx = np.argpartition(-best_scores, m_margin, axis=1)[:, :m_margin]
                best_scores = np.take_along_axis(best_scores, idx, axis=1)
                best_ids = np.take_along_axis(best_ids, idx, axis=1)
        if best_scores is None:
            return
        top = min(m_margin, best_scores.shape[1])
        idx = np.argpartition(-best_scores, top - 1, axis=1)[:, :top]
        sel = np.take_along_axis(best_ids, idx, axis=1)
        yield pd.DataFrame(
            {
                # ids_q comes from bc.value — closing over the driver
                # locals would pickle the query matrix into every task
                "q_id": np.repeat(ids_q, top),
                "c_id": sel.reshape(-1),
            }
        )

    cand = (
        spread(corpus)
        .select(id_col, vec_col)
        .mapInPandas(part_topk, schema="q_id long, c_id long")
        .dropDuplicates(["q_id", "c_id"])
    )
    # pin the exact-re-rank stage's width (see blocked_topk_matmul);
    # hashing on q_id doubles as the final window's distribution
    cand = spread_hash(cand, "q_id")
    # norms once per SIDE row instead of three folds per pair —
    # l2_norm is the same deterministic sequential fold wherever it is
    # evaluated, so cos is bit-identical
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = fold_cos_pairs_arrow(
        cand.join(F.broadcast(qv), on="q_id")
        .join(cv, on="c_id")
        .select(
            F.col("q_id").alias("id_a"),
            F.col("c_id").alias("id_b"),
            F.col("_qv").alias("v_a"),
            F.col("_cv").alias("v_b"),
            F.col("_qn").alias("n_a"),
            F.col("_cn").alias("n_b"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cos").desc(), F.col("id_b").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("rn").alias("rank"),
            F.col("id_b").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
        )
    )


# --- SemDeDup: semantic dedup over embedding cells (Abbas et al. 2023) ------


def semdedup_planes(n_planes: int, dim: int, tag: str = "sd") -> list[list[float]]:
    """Deterministic hyperplane components in [-1, 1): uniform draws
    from an md5 keystream, so both the Spark plan AND an ANSI-SQL
    oracle can embed the exact same double literals (no RNG state to
    reproduce across engines)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{tag}:{p}:{d}".encode()).hexdigest()[:8], 16)
            / 2**32 * 2 - 1
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


_PERSISTED_CELLS: list[DataFrame] = []


def release_semdedup_caches() -> int:
    """Unpersist every cell-assignment frame persisted by semdedup's
    hot-cell guard since the last call (mirrors
    dedup.release_shingle_caches). Call once the survivor DataFrame
    has been materialized."""
    n = 0
    while _PERSISTED_CELLS:
        _PERSISTED_CELLS.pop().unpersist()
        n += 1
    return n


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 6,
    dim: int = 64,
    tag: str = "sd",
    cell_cap: int = 4096,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023 "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): partition the embedding space into cells, and
    within each cell keep one representative from every group of
    semantically near-identical items (cosine ≥ threshold).

    The paper clusters with k-means and keeps the item farthest from
    the centroid; this variant uses deterministic hyperplane-sign cells
    (the k-means analog that needs no training pass) and the keep-min-id
    policy, so the result is reproducible and ANSI-SQL-expressible.
    A vector is DROPPED iff a lower-id vector in the same cell is
    cosine-≥-threshold similar to it; survivors are returned with their
    cell id.

    Scale shape: cell assignment is a pure JVM projection (P
    sequential-fold dot products against literal plane vectors — no
    Python, no shuffle); the only shuffle is the per-cell equi-join,
    and per-task work is bounded by cell population (planes scale with
    corpus: P planes → 2^P cells, so n/2^P expected per cell — add
    planes as n grows, exactly like adding k-means clusters in the
    paper). The exact in-cell cosine re-uses the fold that matches
    DuckDB bit-for-bit, so the threshold predicate cannot diverge
    across engines. No all-pairs join at any scale.

    Hot-cell guard (VERDICT_r5 item 2): in-cell work is pairwise, so a
    skewed embedding distribution — many near-identical vectors,
    exactly what semantic dedup targets — would land one cell with B
    members and make a single join task do B² comparisons. Cells above
    ``cell_cap`` members are instead tiled, the same device as
    ``lsh_topk(bucket_cap=)`` re-expressed as a pure JVM join: members
    split into nb = ⌈B/cap⌉ blocks by ``pmod(id, nb)``; each side
    explodes over the OTHER side's block index, and the equi-join key
    becomes (cell, block_a, block_b), so every unordered pair is
    covered exactly once while per-task volume is bounded by cap² —
    total work unchanged (pairwise is inherent to the ε-graph), but no
    task is ever quadratic in a hot cell's population. Cell sizes come
    from a window count over the same hash exchange the join needs
    anyway. ``cell_cap=None`` disables the guard (bit-compat plan)."""
    planes = semdedup_planes(n_planes, dim, tag)
    v = F.col(vec_col)
    cell = None
    for p, plane in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_fold(v, lit) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        cell = bit if cell is None else cell + bit
    base = spread(df).select(
        F.col(id_col).alias("_id"), v.alias("_v"), cell.alias("cell")
    )

    def _pairs(left: DataFrame, right: DataFrame, keys: list) -> DataFrame:
        a = left.select(
            *keys, F.col("_id").alias("_id_a"), F.col("_v").alias("_v_a")
        )
        # fresh attribute ids (no-op exprs) so the self-join isn't
        # flagged ambiguous — same idiom as ivf_topk
        b = right.select(
            *keys,
            (F.col("_id") + F.lit(0)).alias("_id_b"),
            F.coalesce(F.col("_v")).alias("_v_b"),
        )
        return a.join(b, on=keys)

    if cell_cap is None:
        pairs = _pairs(base, base, ["cell"])
    else:
        # adaptive guard: ONE tiny aggregate (≤2^P rows reduced to the
        # hot subset) decides whether any cell exceeds the cap. The
        # common case — no skew — collects nothing and keeps the plan
        # shape identical to the unguarded one (measured: the
        # always-on window-count formulation cost +2 s at sf0.1 with
        # zero hot cells). The collect is bounded by the number of HOT
        # cells, which skew makes few by definition — same
        # bounded-driver envelope as the ≤4096-row centroid samples.
        # The sizing pass necessarily materializes the cell
        # assignment, so persist it: every downstream branch (pair
        # sides, survivor anti-join) then reads the cached (id, vec,
        # cell) rows instead of re-evaluating the P fold-dot cell
        # expressions per branch — the "materialize the index once"
        # step, with the same registered-release discipline as the
        # shingle indexes (release_semdedup_caches()).
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED_CELLS.append(base)
        hot_cells = (
            base.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("_csz"))
            .filter(F.col("_csz") > cell_cap)
            .collect()
        )
        if not hot_cells:
            pairs = _pairs(base, base, ["cell"])
        else:
            spark = df.sparkSession
            hot_map = spark.createDataFrame(
                [
                    (int(r["cell"]), int(-(-r["_csz"] // cell_cap)))
                    for r in hot_cells
                ],
                "cell int, _nb int",
            )
            cold = base.join(F.broadcast(hot_map), on="cell", how="left_anti")
            hot = base.join(F.broadcast(hot_map), on="cell")
            blocks = F.sequence(F.lit(0), F.col("_nb") - 1)
            ha = hot.select(
                "cell", "_id", "_v",
                F.pmod("_id", F.col("_nb")).cast("int").alias("_ba"),
                F.explode(blocks).alias("_bb"),
            )
            hb = hot.select(
                "cell", "_id", "_v",
                F.explode(blocks).alias("_ba"),
                F.pmod("_id", F.col("_nb")).cast("int").alias("_bb"),
            )
            pairs = _pairs(cold, cold, ["cell"]).unionByName(
                _pairs(ha, hb, ["cell", "_ba", "_bb"]).drop("_ba", "_bb")
            )
    drops = (
        pairs.filter(F.col("_id_a") < F.col("_id_b"))
        .filter(cosine(F.col("_v_a"), F.col("_v_b")) >= F.lit(threshold))
        .select(F.col("_id_b").alias("_id"))
        .distinct()
    )
    return base.join(drops, on="_id", how="left_anti").select(
        F.col("_id").alias(id_col), "cell"
    )


# --- IVF-PQ: memory-compressed ANN (Jégou et al. 2011) ----------------------


def _train_pq_codebooks(
    mat: "np.ndarray", n_sub: int, n_codes: int, iters: int, rng
) -> "np.ndarray":
    """Per-subspace k-means codebooks over the (already unit-normalized)
    training sample: returns (n_sub, n_codes, dsub)."""
    n, dim = mat.shape
    dsub = dim // n_sub
    books = np.zeros((n_sub, n_codes, dsub))
    for m in range(n_sub):
        sub = mat[:, m * dsub : (m + 1) * dsub]
        cent = sub[rng.choice(n, size=min(n_codes, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[m, : len(cent)] = cent
    return books


def ivfpq_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    kmeans_iters: int = 5,
    seed: int = 42,
    candidates_per_cell: int | None = None,
) -> DataFrame:
    """IVF-PQ (Jégou et al. 2011, "Product Quantization for Nearest
    Neighbor Search"): the memory tier below :func:`ivf_topk`. Vectors
    are coarse-assigned to IVF cells AND compressed to ``n_sub``
    sub-codes (one byte-ish code per subspace), so the in-cell
    candidate scan runs on codes + a per-query lookup table
    (asymmetric distance computation) instead of raw vectors —
    n_sub adds per candidate, no BLAS, and ~(4·dim)/n_sub× less data
    through the shuffle. Survivors re-rank with the EXACT sequential
    fold on the raw vectors (equi-join by id), so emitted scores are
    bit-reproducible; only the candidate CHOICE is approximate.

    ``candidates_per_cell=None`` keeps every cell member as a candidate
    (ADC then only orders work the re-rank redoes exactly) — with
    ``n_probe = n_centroids`` that makes the result provably identical
    to brute force, which is how the machinery earns a bit-match oracle
    (same exhaustive-admission pattern as ``sim_lsh_topk_exhaustive``).

    Training follows the IVF envelope: a bounded 4096-row ORDERED
    sample fits coarse centroids and PQ codebooks driver-side (numpy,
    deterministic seed); both broadcast. Encoding is one Arrow pass.
    100 TB shape: codes table is ~n_sub bytes/vector (fits hot in
    memory at billions of vectors); cell scan shuffles only
    (id, codes); raw vectors are touched once at re-rank for
    O(n·n_probe·k) survivors."""
    spark = df.sparkSession
    sample = df.select(id_col, vec_col).orderBy(id_col).limit(4096).toPandas()
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dim = mat.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    books = _train_pq_codebooks(mat, n_sub, n_codes, kmeans_iters, rng)
    bc_cent = spark.sparkContext.broadcast(cent)
    bc_books = spark.sparkContext.broadcast(books)

    dsub = dim // n_sub

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c, bks = bc_cent.value, bc_books.value
        for pb in batches:
            if not len(pb):
                continue
            q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            order = np.argsort(-(qn @ c.T), axis=1)
            codes = np.zeros((len(pb), n_sub), dtype=np.int32)
            for m in range(n_sub):
                sub = qn[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - bks[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pb[id_col].to_numpy(),
                    "cell": order[:, 0].astype("int32"),
                    "probes": [
                        [int(x) for x in order[i, :n_probe]]
                        for i in range(len(pb))
                    ],
                    "codes": [
                        [int(x) for x in codes[i]] for i in range(len(pb))
                    ],
                }
            )

    enc = spread(df.select(id_col, vec_col)).mapInPandas(
        encode,
        schema=f"{id_col} long, cell int, probes array<int>, codes array<int>",
    )
    # lazy pin: enc feeds the codes side AND the query-probe join —
    # without it the Python encode pass runs twice (r14)
    enc = enc.localCheckpoint(eager=False)

    data_side = enc.select(
        F.col(id_col).alias("_id"), "cell", F.col("codes").alias("_codes")
    )
    # queries carry their raw vector (to build the ADC lookup table) but
    # candidates are scanned as CODES only
    query_side = (
        df.select(id_col, vec_col)
        .join(enc.select(id_col, "probes"), on=id_col)
        .select(
            (F.col(id_col) + F.lit(0)).alias("_id"),
            F.coalesce(F.col(vec_col)).alias("_v"),
            F.explode("probes").alias("cell"),
        )
    )
    m_keep = candidates_per_cell if candidates_per_cell else None

    def tile(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        bks = bc_books.value
        qm = np.stack(qpdf["_v"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qm = qm / qn
        codes = np.stack(cpdf["_codes"].to_numpy()).astype(np.int64)
        cids = cpdf["_id"].to_numpy()
        qids = qpdf["_id"].to_numpy()
        out_a: list = []
        out_b: list = []
        # ADC: lut[m, c] = q_sub(m) · codeword(m, c); approx dot is a
        # gather-sum over codes — no raw candidate vectors touched
        for s in range(0, len(qids), 1024):
            qb = qm[s : s + 1024]
            lut = np.einsum("qmd,mcd->qmc",
                            qb.reshape(len(qb), n_sub, dsub), bks)
            approx = lut[
                np.arange(len(qb))[:, None, None],
                np.arange(n_sub)[None, :, None],
                codes.T[None, :, :],
            ].sum(axis=1)
            for i in range(len(qb)):
                row = approx[i]
                if m_keep is not None and len(cids) > m_keep:
                    idx = np.argpartition(-row, m_keep - 1)[:m_keep]
                else:
                    idx = np.arange(len(cids))
                cand = cids[idx]
                keep = cand != qids[s + i]
                out_a.extend([qids[s + i]] * int(keep.sum()))
                out_b.extend(cand[keep].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    cand = (
        spread_hash(query_side, "cell")
        .groupBy("cell")
        .cogroup(spread_hash(data_side, "cell").groupBy("cell"))
        .applyInPandas(tile, schema="id_a long, id_b long")
    )
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    return _exact_rerank_topk(cand, vecs, k, id_col)


def mmr_rerank(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 4,
    top: int = 20,
    k: int = 5,
    scale: int = 256,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998), λ = 1/2: greedily pick
    argmax[ sim(q,c) − max_{s∈picked} sim(c,s) ] from the ``top``
    nearest candidates of each of the first ``n_queries`` vectors.

    Similarities are integer dot products over round(x·scale)
    quantized vectors (the quantized-rerank serving shape), so the
    greedy trajectory is exact integer arithmetic — the catalog twin
    `sim_mmr_rerank` hash-verifies it against an unrolled-CTE oracle.
    Shapes: ONE corpus pass for candidate scoring (broadcast query
    rows), a top-``top`` window cut, per-query pairwise equi-join
    (top² rows), then k unrolled greedy steps over broadcast-sized
    tables; lazy localCheckpoint barriers keep the step plans linear
    instead of 2^k. Returns (query_id, rank, vec_id, qsim,
    redundancy)."""
    qz = F.expr(
        f"transform({vec_col},"
        f" v -> cast(round(cast(v as double) * {scale}) as bigint))"
    )
    q = emb.select(F.col(id_col).alias("vec_id"), qz.alias("qv"))
    qry = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("query_vec")
    )
    idot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0 as bigint), (a, x) -> a + x)"
    )
    scored = q.join(
        F.broadcast(qry), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.expr(idot.format(a="query_vec", b="qv")).alias("qsim"),
        "qv",
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= top)
        .drop("rn")
        # lazy barrier: the greedy unrolling references this table
        # ~2^k times otherwise (see the catalog twin's bench note:
        # 9.3 s → 1.6 s at sf0.1); eager=False so no job runs at
        # plan-construction time.
        .localCheckpoint(eager=False)
    )
    a = cand.select(
        "query_id", F.col("vec_id").alias("id_a"), F.col("qv").alias("va")
    )
    b = cand.select(
        "query_id", F.col("vec_id").alias("id_b"), F.col("qv").alias("vb")
    )
    pairs = (
        a.join(b, on="query_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "query_id",
            "id_a",
            "id_b",
            F.expr(idot.format(a="va", b="vb")).alias("sim"),
        )
    )
    base = cand.select("query_id", "vec_id", "qsim")
    picks = (
        base.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "vec_id",
            "qsim",
            F.lit(0).cast("long").alias("red"),
            F.lit(1).cast("int").alias("rank"),
        )
    )
    for t in range(2, k + 1):
        rem = base.join(
            picks.select("query_id", "vec_id"),
            on=["query_id", "vec_id"],
            how="left_anti",
        )
        red = (
            rem.join(pairs, on="query_id")
            .filter(F.col("id_a") == F.col("vec_id"))
            .join(
                picks.select("query_id", F.col("vec_id").alias("pick_id")),
                on="query_id",
            )
            .filter(F.col("id_b") == F.col("pick_id"))
            .groupBy("query_id", "vec_id", "qsim")
            .agg(F.max("sim").alias("red"))
        )
        wm = Window.partitionBy("query_id").orderBy(
            (F.col("qsim") - F.col("red")).desc(), F.col("vec_id").asc()
        )
        chosen = (
            red.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "vec_id",
                "qsim",
                "red",
                F.lit(t).cast("int").alias("rank"),
            )
        )
        # per-round barrier: linear, not 2^k, plan growth
        picks = picks.unionByName(chosen).localCheckpoint(eager=False)
    return picks.select(
        "query_id",
        "rank",
        "vec_id",
        "qsim",
        F.col("red").alias("redundancy"),
    )


def knn_outlier_census(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sample_k: int = 200,
    top: int = 30,
    quant: int = 256,
) -> DataFrame:
    """kNN-distance outlier census (Ramaswamy et al. 2000) with an
    EXACT integer distance grid and a fixed-size audit sample — the
    contamination check run before trusting an embedding space.

    Sample: the ``sample_k`` ids with the smallest md5(id) keys —
    orderBy().limit() plans as TakeOrderedAndProject, so picking the
    sample is O(sample_k) driver state however large the corpus is
    (VERDICT r7 #3: a corpus-proportional sample broadcast does not
    survive a 100× scale-up; a fixed audit sample estimates the same
    contamination rate). md5 hex sorts identically in Spark and
    DuckDB, so the sample is oracle-replayable.

    Scoring: quantize each vector to an int grid (×``quant``), so
    every d² = |a|²+|b|²−2a·b is an exact int64 — ranking never
    touches floats. One Arrow pass over the corpus computes the
    K×batch integer Gram tile and emits only the batch-local top-k
    per query (the global top-k is a subset of the per-batch top-k
    union), so the shuffle carries ≤ K·k·partitions partial rows,
    never K·N pairs. The final census tail is orderBy().limit(top).

    Returns (id_col, sum_d2_topk, rank) for the ``top`` most isolated
    sampled vectors, rank 1 = most isolated.
    """
    spark = df.sparkSession
    qz = F.expr(
        f"transform({vec_col},"
        f" v -> cast(round(cast(v as double) * {quant}) as bigint))"
    )
    dot = "aggregate(zip_with(qv, qv, (p, r) -> p * r), cast(0 as bigint), (a, p) -> a + p)"
    norms = df.select(F.col(id_col).alias("vec_id"), qz.alias("qv")).select(
        "vec_id", "qv", F.expr(dot).alias("nn")
    )
    qrows = (
        norms.orderBy(
            F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id"
        )
        .limit(sample_k)
        .collect()  # bounded: sample_k rows whatever the corpus size
    )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qa = np.array([r.qv for r in qrows], dtype=np.int64)
    na = np.array([r.nn for r in qrows], dtype=np.int64)
    bc = spark.sparkContext.broadcast((qids, qa, na))

    def batch_topk(batches):
        m_qids, m_qa, m_na = bc.value
        sent = np.iinfo(np.int64).max
        for pb in batches:
            if not len(pb):
                continue
            nids = pb["vec_id"].to_numpy().astype(np.int64)
            # pre-sort columns by nid so a STABLE argsort on d2 alone
            # yields (d2, nid)-lexicographic order — no key packing,
            # so ids of any int64 magnitude are fine
            order = np.argsort(nids)
            nids = nids[order]
            b = np.stack(pb["qv"].to_numpy())[order].astype(np.int64)
            nn = pb["nn"].to_numpy().astype(np.int64)[order]
            d2 = m_na[:, None] + nn[None, :] - 2 * (m_qa @ b.T)  # exact
            d2[m_qids[:, None] == nids[None, :]] = sent  # self
            t = min(k, d2.shape[1])
            idx = np.argsort(d2, axis=1, kind="stable")[:, :t]
            picked = np.take_along_axis(d2, idx, axis=1)
            keep = (picked != sent).ravel()
            yield pd.DataFrame(
                {
                    "qid": np.repeat(m_qids, t)[keep],
                    "nid": nids[idx.ravel()][keep],
                    "d2": picked.ravel()[keep],
                }
            )

    partials = spread(norms).mapInPandas(
        batch_topk, schema="qid long, nid long, d2 long"
    )
    wk = Window.partitionBy("qid").orderBy(
        F.col("d2").asc(), F.col("nid").asc()
    )
    topk = (
        partials.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .groupBy("qid")
        .agg(F.sum("d2").alias("sum_d2_topk"))
    )
    census = topk.orderBy(
        F.col("sum_d2_topk").desc(), F.col("qid").asc()
    ).limit(top)
    wr = Window.orderBy(F.col("sum_d2_topk").desc(), F.col("qid").asc())
    return census.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).select(
        F.col("qid").alias(id_col),
        F.col("sum_d2_topk").cast("long").alias("sum_d2_topk"),
        "rank",
    )


def int_dot_topk_broadcast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    carry: tuple[str, ...] = (),
    exclude_self: bool = False,
    exclude_same_label: bool = False,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-``k`` per query by INTEGER dot product (desc, then
    corpus id asc) with a broadcast query side — the Arrow twin of the
    broadcast-nested-loop + per-pair ``zip_with``/``aggregate`` plan
    shape, minus its per-pair JVM lambda interpretation (guide §4.2:
    one integer Gram tile per Arrow batch instead of |Q|·N 64-step
    folds).

    ``queries`` must have (q_id, qv) [+ qlabel when
    ``exclude_same_label``]; ``corpus`` must have (c_id, qv)
    [+ label] plus any ``carry`` columns to keep on the result rows.
    Vectors are int64 grids (pre-quantized), so every score is an
    exact int64 — the per-batch top-k union provably contains the
    global top-k, and the final window re-rank over
    ≤ |Q|·k·partitions partial rows reproduces the all-pairs ranking
    bit-for-bit. The query side broadcasts (the documented
    broadcast-sized tier, same cap and failure mode as
    ``crossset_topk``); the corpus makes ONE Arrow pass, never a
    |Q|·N shuffle.

    Returns (q_id, c_id, s, rank, *carry) with rank 1..k per q_id.
    """
    spark = queries.sparkSession
    qcols = ["q_id", "qv"] + (["qlabel"] if exclude_same_label else [])
    qpd = queries.select(*qcols).limit(max_queries + 1).toPandas()
    if not len(qpd):
        raise ValueError("int_dot_topk_broadcast: empty query set")
    if len(qpd) > max_queries:
        raise ValueError(
            "int_dot_topk_broadcast: query set exceeds the broadcast "
            f"tier cap ({max_queries} rows); shard the query side"
        )
    qids = qpd["q_id"].to_numpy().astype(np.int64)
    qmat = np.stack(qpd["qv"].to_numpy()).astype(np.int64)
    qlab = (
        qpd["qlabel"].to_numpy().astype(np.int64)
        if exclude_same_label
        else None
    )
    bc = spark.sparkContext.broadcast((qids, qmat, qlab))
    sent = -(np.int64(1) << 62)  # far below any real |s| ≤ quant²·dim

    def batch_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_qids, m_qmat, m_qlab = bc.value
        for pb in batches:
            if not len(pb):
                continue
            cids = pb["c_id"].to_numpy().astype(np.int64)
            # sort batch rows by c_id so a STABLE argsort on -s alone
            # yields (s desc, c_id asc) order (the census device)
            order = np.argsort(cids)
            cids = cids[order]
            m = np.stack(pb["qv"].to_numpy())[order].astype(np.int64)
            s = m_qmat @ m.T  # exact int64 Gram tile
            if m_qlab is not None:
                lab = pb["label"].to_numpy().astype(np.int64)[order]
                s[m_qlab[:, None] == lab[None, :]] = sent
            else:
                s[m_qids[:, None] == cids[None, :]] = sent
            t = min(k, s.shape[1])
            idx = np.argsort(-s, axis=1, kind="stable")[:, :t]
            picked = np.take_along_axis(s, idx, axis=1)
            keep = (picked != sent).ravel()
            out = {
                "q_id": np.repeat(m_qids, t)[keep],
                "c_id": cids[idx.ravel()][keep],
                "s": picked.ravel()[keep],
            }
            for c in carry:
                out[c] = pb[c].to_numpy()[order][idx.ravel()][keep]
            yield pd.DataFrame(out)

    ccols = ["c_id", "qv"] + (["label"] if exclude_same_label else [])
    ccols += [c for c in carry if c not in ccols]
    carry_schema = "".join(
        f", {c} {dict(corpus.dtypes)[c]}" for c in carry
    )
    partials = (
        spread(corpus.select(*ccols))
        .mapInPandas(
            batch_topk, schema=f"q_id long, c_id long, s long{carry_schema}"
        )
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.col("s").desc(), F.col("c_id").asc()
    )
    return (
        partials.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .withColumn("rank", F.col("rn").cast("long"))
        .drop("rn")
    )


def int_pairdist_hist_bucketed(
    df: DataFrame,
    bucket_col: str = "bkt",
    div: int = 10_000,
) -> DataFrame:
    """Histogram of within-bucket pairwise SQUARED DISTANCES on an
    int64 grid: for every unordered pair (i < j by id) sharing
    ``bucket_col``, count d² // ``div`` occurrences.

    The Arrow twin of the bucket self-join + per-pair
    ``zip_with``/``aggregate`` shape: each bucket group computes ONE
    integer Gram matrix and its upper triangle, emits per-group
    (dist_bucket, n) partial counts, and a map-combinable final sum
    reproduces the join's histogram exactly (d² and the floor-div are
    integer arithmetic; summing partial counts per key is
    order-independent). The shuffle carries histogram partials, never
    pair rows — the pair budget Σ bucket² is paid as per-group flops.

    ``df`` must have (vec_id, ``bucket_col``, qv) with qv an int64
    grid. Returns (dist_bucket, n_pairs).
    """

    def hist(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        nn = (m * m).sum(axis=1)
        d2 = nn[:, None] + nn[None, :] - 2 * (m @ m.T)  # exact int64
        iu = np.triu_indices(len(m), k=1)  # unordered pairs once
        vals, cnt = np.unique(d2[iu] // div, return_counts=True)
        return pd.DataFrame(
            {"dist_bucket": vals, "n_pairs": cnt.astype(np.int64)}
        )

    partials = (
        spread_hash(df, bucket_col)
        .groupBy(bucket_col)
        .applyInPandas(hist, schema="dist_bucket long, n_pairs long")
    )
    return partials.groupBy("dist_bucket").agg(
        F.sum("n_pairs").alias("n_pairs")
    )
