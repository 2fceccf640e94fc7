"""Hot-bucket guard for lsh_topk (VERDICT r3 #6): a degenerate bucket —
near-identical vectors that no hyperplane count can separate — must not
collapse into one B² straggler task. Buckets above ``bucket_cap`` split
into id-hash block tiles; per-tile top-m is lossless for the bucket's
top-m, so results stay identical to the unguarded plan."""

from __future__ import annotations

import math

import numpy as np
import pytest

from report_worker_spark.functions import similarity as sim

N = 500
DIM = 8
CAP = 64
K = 5


@pytest.fixture(scope="module")
def degenerate(spark):
    """N near-identical vectors: one dominant direction plus an
    id-proportional perturbation that breaks every cosine tie but is
    far too small to flip any hyperplane sign — all rows land in the
    SAME bucket of every table."""
    base = np.full(DIM, 100.0)
    rows = []
    for i in range(N):
        v = base.copy()
        # big enough that cosine gaps (~1e-9) dwarf BLAS-vs-fold ULP
        # noise, small enough that no hyperplane sign flips (min
        # projection margin 5.3 vs max perturbation 3.3 for seed 42)
        v[0] += 5e-3 * i
        v[1] -= 3.5e-3 * i
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _brute_topk(rows: list, k: int) -> list:
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = []
    for i, q in enumerate(ids):
        # exact sequential-fold cosine, matching the plan's dot_fold
        sims = []
        for j, c in enumerate(ids):
            if c == q:
                continue
            num = 0.0
            for a, b in zip(mat[i], mat[j]):
                num += a * b
            den = math.sqrt(math.fsum(x * x for x in mat[i])) * math.sqrt(
                math.fsum(x * x for x in mat[j])
            )
            sims.append((num / den, c))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, c) in enumerate(sims[:k], start=1):
            out.append((q, rank, c))
    return sorted(out)


def test_degenerate_bucket_is_actually_hot(spark, degenerate):
    """Premise check: every row shares one bucket per table, so the
    unguarded plan would put all N rows in a single task."""
    planes = np.random.default_rng(42).standard_normal((4, 6, DIM))
    mat = np.array([r.embedding for r in degenerate.collect()])
    for t in range(4):
        bits = (mat @ planes[t].T > 0)
        assert len({tuple(b) for b in bits}) == 1


def test_hot_bucket_tiling_matches_unguarded_results(spark, degenerate):
    capped = sim.lsh_topk(
        degenerate, k=K, n_planes=6, n_tables=4, seed=42, dim=DIM,
        bucket_cap=CAP,
    )
    uncapped = sim.lsh_topk(
        degenerate, k=K, n_planes=6, n_tables=4, seed=42, dim=DIM,
        bucket_cap=None,
    )
    got_c = sorted((r.vec_id, r.rank, r.neighbor_id) for r in capped.collect())
    got_u = sorted((r.vec_id, r.rank, r.neighbor_id) for r in uncapped.collect())
    assert got_c == got_u
    # and both equal true exact top-k (perturbations → no cosine ties)
    rows = [(r.vec_id, r.embedding) for r in degenerate.collect()]
    assert got_c == _brute_topk(rows, K)


def test_hot_path_appears_in_plan_with_bounded_tiles(spark, degenerate):
    """Plan-level: the guarded query contains TWO grouped-Arrow stages
    (cold buckets + hot tiles). Data-level: with N=500 ids 0..N-1 and
    cap=64, nb=ceil(500/64)=8, so every tile group holds at most
    2*ceil(N/nb) = 126 rows — bounded per-task input regardless of
    bucket skew."""
    capped = sim.lsh_topk(
        degenerate, k=K, n_planes=6, n_tables=4, seed=42, dim=DIM,
        bucket_cap=CAP,
    )
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 2
    nb = math.ceil(N / CAP)
    per_block = math.ceil(N / nb)
    assert 2 * per_block <= 2 * CAP  # the documented per-task bound
    uncapped = sim.lsh_topk(
        degenerate, k=K, n_planes=6, n_tables=4, seed=42, dim=DIM,
        bucket_cap=None,
    )
    plan_u = uncapped._jdf.queryExecution().executedPlan().toString()
    assert plan_u.count("FlatMapGroupsInPandas") == 1


# --- recall floors (VERDICT_r4 item 4) --------------------------------------
#
# The recall artifacts (sim_lsh_recall_at_k / sim_ivf_recall_at_k) emit a
# MEASURED value; nothing previously asserted a minimum, so a silent
# collapse (bad plane seed, bad centroid sample) would still ship "green".
# Floors are tuned to the synthetic fixture: its embeddings are
# near-orthogonal, where hyperplane LSH genuinely recalls ~0.12-0.14 and
# IVF(n_probe=4/32) ~0.48-0.49 (both documented in the query docstrings).
# The floors sit well below the measured values but far above a collapse
# (a broken index scores near 0), so regressions fail loudly without
# flaking on fixture noise.


def test_lsh_recall_floor(spark, sf_oracle):
    from report_worker_spark.plans import QUERIES

    row = QUERIES["sim_lsh_recall_at_k"](spark, sf_oracle).collect()[0]
    assert row["n_exact"] == 2500  # 500 query vecs x k=5
    # md5-plane 6x6 config (oracle-paired since r5): measured 2452 bps
    assert row["recall_bps"] >= 1600, row


def test_ivf_recall_floor(spark, sf_oracle):
    """Floors for BOTH coarse-quantizer configurations: the catalog's
    oracle-paired md5-centroid query (hash-verified since r6; measured
    2896 bps — untrained cells ignore the data distribution) and the
    trained-k-means production config (measured ~4916 bps), which left
    the catalog when the query became SQL-replayable and is pinned
    here as the verification of record."""
    from report_worker_spark.plans import QUERIES
    from report_worker_spark.plans.tables import load

    row = QUERIES["sim_ivf_recall_at_k"](spark, sf_oracle).collect()[0]
    assert row["n_exact"] == 2500
    assert row["recall_bps"] >= 2000, row  # md5 centroids: measured 2896

    e = load(spark, sf_oracle, "embeddings")
    exact = sim.brute_topk_expr(e, k=5).select("vec_id", "neighbor_id")
    ivf = sim.ivf_topk(e, k=5, n_centroids=32, n_probe=4).select(
        "vec_id", "neighbor_id"
    )
    hits = exact.join(ivf, on=["vec_id", "neighbor_id"]).count()
    assert hits * 10000 // 2500 >= 3500, hits  # trained: measured ~4916


def test_semdedup_semantics(spark):
    """Constructed fixture: exact duplicates and a near-identical pair
    must collapse to the min id; dissimilar vectors in the same cell
    survive. (The synthetic embeddings table has no cosine>=0.9 pairs,
    so the drop path needs a purpose-built fixture.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(6)]
    rows.append((10, base[0].tolist()))                     # exact dup of 0
    near = base[1] + 0.01 * rng.standard_normal(16).astype("float32")
    rows.append((11, near.tolist()))                        # near-dup of 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = sim.semdedup(df, threshold=0.95, n_planes=2, dim=16)
    ids = {r.vec_id for r in kept.collect()}
    assert 0 in ids and 10 not in ids      # keep-min-id
    assert 1 in ids and 11 not in ids
    assert {2, 3, 4, 5} <= ids             # dissimilar rows survive


def test_semdedup_hot_cell_tiling_equivalence(spark):
    """VERDICT_r5 item 2: the degenerate distribution — every vector
    in ONE cell, many near-identical (exactly what semantic dedup
    targets). A tiny cell_cap forces the tiled path on all of them;
    the survivor set must be identical to the uncapped plan, and the
    keep-min-id clones must still collapse."""
    import numpy as np

    rng = np.random.default_rng(11)
    anchor = np.abs(rng.standard_normal(16)).astype("float32")  # one octant
    rows = []
    for i in range(60):
        # tiny positive-ish jitter keeps every vector on the anchor's
        # side of all hyperplanes AND cosine-near the anchor
        v = anchor + 0.001 * rng.standard_normal(16).astype("float32")
        rows.append((i, v.tolist()))
    # plus a handful of same-cell but dissimilar-enough survivors
    for i in range(60, 66):
        v = np.abs(rng.standard_normal(16)).astype("float32")
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.999, n_planes=2, dim=16, tag="hotcell")
    capped = {
        (r.vec_id, r.cell)
        for r in sim.semdedup(df, cell_cap=7, **kw).collect()
    }
    uncapped = {
        (r.vec_id, r.cell)
        for r in sim.semdedup(df, cell_cap=None, **kw).collect()
    }
    assert capped == uncapped
    kept_ids = {i for i, _ in capped}
    assert 0 in kept_ids                      # cluster representative
    assert not kept_ids & set(range(1, 60))   # all clones dropped
    # pair coverage is exact, not per-block: clone 59 is dropped even
    # though pmod(59, nb) puts it in a different block than 0


def test_semdedup_cell_is_deterministic(spark):
    """Cell assignment must not depend on partitioning."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist())
            for i in range(40)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df8 = df1.repartition(8)
    a = {(r.vec_id, r.cell) for r in sim.semdedup(df1, threshold=0.99,
                                                  n_planes=3, dim=16).collect()}
    b = {(r.vec_id, r.cell) for r in sim.semdedup(df8, threshold=0.99,
                                                  n_planes=3, dim=16).collect()}
    assert a == b


def test_ivfpq_recall_floor(spark, sf_oracle):
    """IVF-PQ production config must not silently collapse: candidate
    choice runs on PQ codes (ADC), so a codebook regression would tank
    recall while staying 'green' on row counts. Floor well below the
    measured ~0.68 (n_probe=8, stable 0.68–0.70 across seeds), far
    above collapse — and checked for three training seeds so a
    lucky-initialization pass can't mask a regression."""
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_oracle, "embeddings")
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in sim.brute_topk_expr(emb, k=5).collect()
    }
    assert len(exact) == 2500
    for seed in (41, 42, 43):
        pq = {
            (r.vec_id, r.neighbor_id)
            for r in sim.ivfpq_topk(
                emb,
                k=5,
                n_centroids=32,
                n_probe=8,
                candidates_per_cell=32,
                seed=seed,
            ).collect()
        }
        assert len(pq & exact) / len(exact) >= 0.45, seed


def test_semdedup_cache_registry_releases(spark):
    """The hot-cell guard persists the cell assignment; the registered
    release must unpersist exactly the frames created since the last
    call (mirrors dedup.release_shingle_caches)."""
    import numpy as np

    sim.release_semdedup_caches()  # drain anything earlier tests left
    rng = np.random.default_rng(2)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist())
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sim.semdedup(df, threshold=0.99, n_planes=2, dim=8, cell_cap=4).count()
    assert sim.release_semdedup_caches() == 1
    assert sim.release_semdedup_caches() == 0
    # cap=None takes the unguarded path: nothing persisted
    sim.semdedup(df, threshold=0.99, n_planes=2, dim=8, cell_cap=None).count()
    assert sim.release_semdedup_caches() == 0


def test_brute_topk_matmul_size_guard(spark):
    """VERDICT r9 #3: the brute (driver-broadcast) tier must refuse a
    corpus above its documented row bound instead of toPandas()-ing it,
    and the error must point at blocked_topk_matmul."""
    rows = [(i, [float(i), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="blocked_topk_matmul"):
        sim.brute_topk_matmul(df, k=3, max_rows=10)
    # at or under the bound the plan still builds and runs
    out = sim.brute_topk_matmul(df, k=3, max_rows=20)
    assert out.count() == 60


def test_fold_cos_arrow_bit_identical_to_expression(spark):
    """r15 pin: fold_cos_pairs_arrow must reproduce the interpreted
    dot_fold(v_a, v_b)/(n_a·n_b) expression BIT-FOR-BIT — same
    left-to-right float64 multiply/add sequence per pair — on
    adversarial float32 inputs (tiny/huge magnitudes, sign flips,
    catastrophic cancellation, zero norms)."""
    import struct

    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    dim = 64
    vecs = []
    for i in range(40):
        v = rng.standard_normal(dim) * (10.0 ** rng.integers(-18, 18, dim))
        if i % 5 == 0:
            v[::2] = -v[::2]  # cancellation patterns
        # (no zero vectors: under ANSI mode the EXPRESSION form throws
        # DIVIDE_BY_ZERO on a zero norm, so production inputs never
        # carry them; the kernel would yield inf/nan there instead)
        vecs.append((i, [float(np.float32(x)) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    a = df.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("v_a"),
        sim.l2_norm(F.col("embedding")).alias("n_a"),
    )
    b = df.select(
        (F.col("vec_id") + 1000).alias("id_b"),
        F.col("embedding").alias("v_b"),
        sim.l2_norm(F.col("embedding")).alias("n_b"),
    )
    pairs = a.crossJoin(b)
    expr = {
        (r.id_a, r.id_b): r.cos
        for r in pairs.withColumn(
            "cos",
            sim.dot_fold(F.col("v_a"), F.col("v_b"))
            / (F.col("n_a") * F.col("n_b")),
        )
        .select("id_a", "id_b", "cos")
        .collect()
    }
    arrow = {
        (r.id_a, r.id_b): r.cos
        for r in sim.fold_cos_pairs_arrow(pairs).collect()
    }
    assert set(expr) == set(arrow) and len(expr) == 1600

    def bits(x):
        return struct.pack("<d", x) if x is not None else None

    diffs = [
        k
        for k in expr
        if not (
            expr[k] is None
            and arrow[k] is None
            or (
                expr[k] is not None
                and arrow[k] is not None
                and (
                    bits(expr[k]) == bits(arrow[k])
                    or (math.isnan(expr[k]) and math.isnan(arrow[k]))
                )
            )
        )
    ]
    assert not diffs, diffs[:5]
