#!/usr/bin/env python
"""Scale stress: run the heavy operator family at ~10x sf0.1 (~sf1).

The driver testdata stops at sf0.1; this script synthesizes an sf~1
workload by unioning the sf0.1 tables k times with key offsets and a
per-replica text/vector perturbation (so dedup/ANN ops see real new
content, not k identical copies), then times the operators whose scale
behavior matters most. Run manually:

    python stress.py            # k=10 (~sf1), prints one JSON line
    STRESS_K=4 python stress.py

Nothing here runs in the pytest gate — it is evidence, not CI: the
point is that per-op wall time grows ~linearly in k while the plans
stay the bucketed/equi-join shapes asserted in tests/test_scale_plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window, functions as F

from report_worker_spark.functions import bpe
from report_worker_spark.functions import dedup as dd
from report_worker_spark.functions import graph as gr
from report_worker_spark.functions import similarity as sim
from report_worker_spark.functions import text as tx
from report_worker_spark.functions import topk as tk
from report_worker_spark.functions.curation import (
    chunk_with_overlap,
    train_val_test_split,
)
from report_worker_spark.plans.tables import load
from report_worker_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("STRESS_K", "10"))


def upscale_documents(spark, k: int) -> DataFrame:
    """k replicas; each replica perturbs the text tail with a replica
    token so exact/near-dup ops keep realistic (not degenerate) overlap:
    replica 0 is pristine, others are near-dups of it."""
    d = load(spark, SF_DIR, "documents")
    reps = spark.range(k).select(F.col("id").cast("int").alias("rep"))
    return d.crossJoin(F.broadcast(reps)).select(
        (
            F.col("doc_id") + F.col("rep").cast("long") * F.lit(1_000_000_000)
        ).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def upscale_embeddings(spark, k: int) -> DataFrame:
    """k replicas with a tiny deterministic per-replica rotation of one
    coordinate — keeps vectors near the originals (ANN-realistic)."""
    e = load(spark, SF_DIR, "embeddings")
    reps = spark.range(k).select(F.col("id").cast("int").alias("rep"))
    nudge = ((F.col("rep") % 7).cast("float") * F.lit(0.001)).cast("float")
    return e.crossJoin(F.broadcast(reps)).select(
        (
            F.col("vec_id") + F.col("rep").cast("long") * F.lit(1_000_000_000)
        ).alias("vec_id"),
        F.transform(
            "embedding",
            lambda v, i: F.when(i == 0, (v + nudge).cast("float")).otherwise(v),
        ).alias("embedding"),
        "label",
    )


def upscale_cooccur_edges(spark, k: int) -> DataFrame:
    """k disjoint replicas of the 1997 part co-occurrence graph
    (orderkey and partkey offset per replica): nodes, edges and
    triangles all scale exactly ×k, so wall-time growth beyond ×k is
    superlinearity in the operator, not the data."""
    li = (
        load(spark, SF_DIR, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    reps = spark.range(k).select(F.col("id").alias("rep"))
    rep_li = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("rep") * F.lit(1_000_000_000)).alias("_o"),
        (F.col("l_partkey") + F.col("rep") * F.lit(1_000_000_000)).alias("_p"),
    )
    a = rep_li.select("_o", F.col("_p").alias("src"))
    b = rep_li.select("_o", F.col("_p").alias("dst"))
    return (
        a.join(b, on="_o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def run_composed_curation(spark, docs_k: DataFrame) -> None:
    """The composed curation deployment pipeline (quality gate →
    exact dedup → LSH near-dup canonical → substring trim → benchmark
    decontamination → split → token packing → partitioned write),
    extracted so both the stress harness and the pytest soak guard
    (tests/test_soak.py) run the SAME composition."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="rws_curated_")
    try:
        q = (
            tx.quality_score(tx.with_text_stats(docs_k))
            .filter(F.col("quality_score") >= 0.5)
            .select("doc_id", "text")
        )
        ex = dd.exact_dedup(q)
        near = dd.dedup_canonical(
            ex, dd.minhash_lsh_verified_pairs(ex, threshold=0.8)
        )
        trimmed = dd.substring_trim(near, k=8).filter(
            F.col("kept_tokens") > 0
        )
        # benchmark decontamination: broadcast the (small) bench
        # set's 8-gram inventory, anti-join training docs
        bench = docs_k.filter(F.col("doc_id") % 1009 == 0).select(
            F.explode(dd.word_shingles("text", 8)).alias("g")
        ).distinct()
        contaminated = (
            trimmed.select(
                "doc_id", F.explode(dd.word_shingles("text", 8)).alias("g")
            )
            .join(F.broadcast(bench), on="g")
            .select("doc_id")
            .distinct()
        )
        clean = trimmed.join(contaminated, on="doc_id", how="left_anti")
        split = train_val_test_split(clean, "doc_id")
        # pack into ~2048-token sequences: content-hash bucket →
        # in-bucket running token sum → bin id (one window per
        # bucket, partitioning-independent)
        from pyspark.sql import Window as W

        b = F.pmod(F.xxhash64("doc_id"), F.lit(256)).alias("bucket")
        toks = F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok")
        w = (
            W.partitionBy("split", "bucket")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        packed = (
            split.select("doc_id", "text", "split", b, toks)
            .withColumn(
                "seq_id", F.floor((F.sum("n_tok").over(w) - 1) / 2048)
            )
        )
        packed.write.mode("overwrite").partitionBy("split").parquet(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_r13_additions(spark, docs, emb, edges, ev, ereps) -> dict:
    """Round-13 stress entries (VERDICT_r12 item 7): the round-12
    catalog additions at ~sf1. Callable standalone (STRESS_FAMILY=r13)
    for targeted K=2 / K=10 exponent runs without the full suite."""
    timings: dict[str, float] = {}

    def timed(df: DataFrame) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    def timed_build(build) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    # ------------------------------------------------------------------
    # Round-13 additions (VERDICT_r12 item 7): the round-12 family at
    # ~sf1 — friend-of-friend recommendations (THE watch item: the
    # 2-hop candidate expansion grows with degree skew, so its exponent
    # must stay ~linear on disjoint-replica growth), edge embeddedness
    # (the triangle join restricted to edges), HLL sketch merge algebra
    # (K× events with K× distinct users — sketch build + two-level
    # union), one Lloyd assignment round over K× vectors against 16
    # broadcast centroids, the NOW-SHARDED pack-straddle prefix sum
    # (ranked_prefix_sum replaced the global window this round), and
    # the price-volume bridge over K× lineitem.
    # ------------------------------------------------------------------
    # FoF: reuse the K-replica co-occurrence graph (disjoint replicas:
    # candidates and triangles scale exactly ×K)
    adj_f = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj_f = adj_f.localCheckpoint(eager=False)
    x_f = adj_f.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    y_f = adj_f.select(F.col("src").alias("mid"), F.col("dst").alias("rec"))
    direct_f = adj_f.select(
        F.col("src").alias("node"), F.col("dst").alias("rec")
    )
    cand_f = (
        x_f.join(y_f, "mid")
        .filter(F.col("rec") != F.col("node"))
        .join(direct_f, ["node", "rec"], "left_anti")
        .groupBy("node", "rec")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    w_fof = Window.partitionBy("node").orderBy(
        F.col("common").desc(), F.col("rec")
    )
    timings["graph_fof_recommendations"] = timed(
        cand_f.withColumn("rk", F.row_number().over(w_fof)).filter(
            F.col("rk") <= 3
        )
    )
    # edge embeddedness: per-edge common-neighbor count + zero-fill
    x_e = adj_f.select(F.col("src").alias("a"), F.col("dst").alias("w1"))
    y_e = adj_f.select(F.col("src").alias("b"), F.col("dst").alias("w2"))
    emb_e = (
        edges.join(x_e, edges.src == x_e.a)
        .join(y_e, (edges.dst == y_e.b) & (F.col("w1") == F.col("w2")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    timings["graph_edge_embeddedness"] = timed(
        edges.join(emb_e, ["src", "dst"], "left")
        .select(F.coalesce("common", F.lit(0)).alias("embeddedness"))
        .groupBy("embeddedness")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    # HLL merge algebra: K× events with DISJOINT per-replica user ids
    # (distinct cardinality grows ×K — the sketch actually fills);
    # daily lgK=16 sketches, then direct one-level vs day→month→total
    # two-level unions, both materialized
    ev_h = (
        ev.select("event_type", "ts", "user_id")
        .crossJoin(F.broadcast(ereps))
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            (
                F.col("user_id")
                + F.col("rep").cast("long") * F.lit(1_000_000_000)
            ).alias("uid"),
        )
    )
    daily_h = ev_h.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("uid", F.lit(16)).alias("sk")
    )
    daily_h = daily_h.localCheckpoint(eager=False)
    merged_h = daily_h.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    two_h = (
        daily_h.withColumn("mon", F.trunc("day", "month"))
        .groupBy("event_type", "mon")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est2"))
    )
    timings["agg_hll_merge_algebra"] = timed_build(
        lambda: merged_h.join(two_h, "event_type")
    )
    # k-means one-step: K× vectors against 16 broadcast unit centroids
    # — one fan-out scan, map-combinable max per vector, 16-row rollup
    from report_worker_spark.plans.q_embeddings import _KMC_CENTROIDS

    cdf_k = spark.createDataFrame(
        [(j, _KMC_CENTROIDS[j]) for j in range(16)],
        "cell int, cv array<double>",
    )
    scored_k = emb.crossJoin(F.broadcast(cdf_k)).select(
        "vec_id",
        "cell",
        sim.dot_fold(
            F.col("embedding").cast("array<double>"), F.col("cv")
        ).alias("dot"),
    )
    best_k = scored_k.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("dot").alias("dot"),
                (F.lit(15) - F.col("cell")).alias("inv_cell"),
            )
        ).alias("w")
    )
    timings["emb_kmeans_onestep_cells"] = timed(
        best_k.select(
            (F.lit(15) - F.col("w.inv_cell")).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    # pack-straddle audit over K× docs through the r13 sharded prefix
    # sum (the single-task global sort is gone; growth must be scan-
    # bound)
    from report_worker_spark.functions.ranks import ranked_prefix_sum

    t_ps = docs.select(
        "doc_id", tx.token_count("text").cast("long").alias("n_tokens")
    )
    placed_ps = ranked_prefix_sum(
        t_ps, ["doc_id"], "n_tokens", out_col="_ps"
    ).select(
        "n_tokens",
        F.expr("(_ps - n_tokens) div 2048").alias("pack_id"),
        ((F.col("_ps") - F.col("n_tokens")) % 2048).alias("pack_offset"),
    )
    over_ps = F.col("pack_offset") + F.col("n_tokens") - 2048
    timings["curation_pack_straddle_audit"] = timed_build(
        lambda: placed_ps.groupBy("pack_id").agg(
            F.count(F.lit(1)).alias("n_docs_starting"),
            F.sum(F.when(over_ps > 0, over_ps).otherwise(0)).alias(
                "straddle_tokens"
            ),
        )
    )
    # price-volume bridge: K× lineitem (disjoint partkeys per replica
    # → the brand×year rollup grows ×K on the fact side, the part dim
    # broadcast stays dim-sized)
    li_pv = (
        load(spark, SF_DIR, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
        .crossJoin(F.broadcast(ereps))
    )
    p_pv = load(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    yr_pv = (
        li_pv.join(F.broadcast(p_pv), li_pv.l_partkey == p_pv.p_partkey)
        .groupBy(
            F.concat(F.col("p_brand"), F.lit("#"), F.col("rep")).alias(
                "brand"
            ),
            F.year("l_shipdate").alias("y"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("rev"),
        )
    )
    timings["olap_price_volume_bridge"] = timed(
        yr_pv.groupBy("brand").agg(
            F.max(F.when(F.col("y") == 1995, F.col("qty"))).alias("q0"),
            F.max(F.when(F.col("y") == 1996, F.col("qty"))).alias("q1"),
            F.max(F.when(F.col("y") == 1995, F.col("rev"))).alias("r0"),
            F.max(F.when(F.col("y") == 1996, F.col("rev"))).alias("r1"),
        )
    )

    return timings


def main_r13() -> None:
    spark = get_spark("rws-stress-r13")
    docs = upscale_documents(spark, K)
    emb = upscale_embeddings(spark, K)
    edges = gr.undirected_edges(upscale_cooccur_edges(spark, K))
    ev = load(spark, SF_DIR, "events")
    ereps = spark.range(K).select(F.col("id").cast("int").alias("rep"))
    timings = run_r13_additions(spark, docs, emb, edges, ev, ereps)
    print(
        json.dumps(
            {
                "metric": "stress_r13",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "k": K,
            }
        )
    )


def main() -> None:
    spark = get_spark("rws-stress")
    docs = upscale_documents(spark, K)
    emb = upscale_embeddings(spark, K)
    n_docs = docs.count()
    n_emb = emb.count()

    def timed(df: DataFrame) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    def timed_build(build) -> float:
        """Like timed(), but the BUILD runs inside the clock — needed
        for operators that do eager work at plan-construction time
        (connected_components localCheckpoints each propagation round
        while the plan is being built, so timing only the final
        materialization would skip the iterative core)."""
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    timings = {
        "dedup_exact": timed(dd.exact_dedup_groups(docs)),
        "dedup_minhash_lsh": timed(
            dd.minhash_lsh_verified_pairs(docs, threshold=0.8)
        ),
        "dedup_simhash": timed(dd.simhash_pairs(docs, max_hamming=3)),
        # composed curation deployment shape (the path
        # curation_leakage_safe_split actually runs): LSH candidate
        # pairs → exact-verify → connected components (label
        # propagation, localCheckpoint per round) → canonical filter.
        # Proves the propagation loop stays linear when fed LSH-scale
        # pair volumes, not just the hand-sized pair fixtures.
        "dedup_lsh_cc_canonical": timed_build(
            lambda: dd.dedup_canonical(
                docs, dd.minhash_lsh_verified_pairs(docs, threshold=0.8)
            )
        ),
        "dedup_ngram_jaccard": timed(
            dd.ngram_jaccard_pairs(docs, n=3, threshold=0.8, max_df=500 * K)
        ),
        "text_stats": timed(tx.with_text_stats(docs)),
        "chunk_overlap": timed(chunk_with_overlap(docs)),
        "sim_lsh_topk": timed(
            sim.lsh_topk(emb, k=5, n_planes=6, n_tables=6, dim=64)
        ),
        "sim_ivf_topk": timed(sim.ivf_topk(emb, k=5, n_centroids=64, n_probe=8)),
        "dedup_containment": timed(
            dd.ngram_overlap_pairs(docs, n=3, threshold=0.9, max_df=500 * K)
        ),
        "topk_heavy_tokens": timed(
            tk.sketch_pruned_topk(
                docs.select(F.explode(tx.tokens("text")).alias("tok")),
                "tok",
                k=20,
                m=512,
            )
        ),
        # segment cleaning: df-shuffle + broadcast dictionary; the k×
        # corpus multiplies segment volume linearly, boilerplate
        # dictionary stays bounded by distinct segments over max_df
        "text_boilerplate_removal": timed(
            tx.remove_boilerplate(docs, seg_tokens=3, max_doc_freq=5 * K)
        ),
        "text_intradoc_dedup": timed(
            tx.dedup_intradoc_segments(docs, seg_tokens=3)
        ),
        # exact-substring dedup: window volume scales ×k; the dup-hash
        # groupBy and the gaps-and-islands window are both linear in it
        "dedup_exact_substring": timed(dd.duplicate_spans(docs, k=8)),
        # trim adds the span-key window (span volume only) and one
        # reassembly corpus scan on top of the span finder
        "dedup_substring_trim": timed(dd.substring_trim(docs, k=8)),
        # BPE training: ONE corpus pass for word freqs; the 10 merge
        # rounds then run on the vocab table, whose size grows far
        # sublinearly with corpus replication (near-constant here)
        "text_bpe_train_merges": timed_build(
            lambda: bpe.bpe_merges(docs, n_merges=10)
        ),
        # SemDeDup: cell assignment is a projection; per-cell join work
        # is Σ cell², so at k× corpus with FIXED planes it grows ~k²/2^P
        # per cell — the deployment knob is planes↑ with n (here +3
        # planes ≈ 8× more cells keeps per-cell population flat)
        "dedup_semantic_semdedup": timed(
            sim.semdedup(
                emb, id_col="vec_id", threshold=0.4, n_planes=7, dim=64
            )
        ),
        # IVF-PQ: codes-only cell scan; cells scale with corpus like
        # semdedup planes (64 centroids here vs 32 at sf0.1)
        "sim_ivfpq_topk": timed(
            sim.ivfpq_topk(
                emb, k=5, n_centroids=64, n_probe=4, candidates_per_cell=32
            )
        ),
        # CDC chunking: flag projection + doc-partitioned window +
        # (doc, chunk) groupBy — all linear in token count
        "text_cdc_chunks": timed(tx.cdc_chunks(docs, k=3, modulus=16)),
    }
    edges = gr.undirected_edges(upscale_cooccur_edges(spark, K))
    timings["graph_triangles"] = timed(gr.triangle_count(edges))
    timings["graph_pagerank_sum"] = timed(
        gr.pagerank(edges, iterations=3, deterministic=False)
    )
    # peeling: per-round cost tracks the SHRINKING edge set, so the
    # k× edge volume only multiplies the first rounds
    timings["graph_kcore"] = timed_build(
        lambda: gr.kcore(edges, k=3, max_iterations=16)
    )
    # same Σ deg² wedge budget as triangles, plus the degree join and
    # the per-pair sorted fold — growth should track triangle growth
    timings["graph_adamic_adar"] = timed(gr.adamic_adar(edges, k=20))

    # ------------------------------------------------------------------
    # Late round-6 operator batch (VERDICT_r6 item 3): the three ops
    # whose scale story had no stress row yet.
    # ------------------------------------------------------------------
    from report_worker_spark.functions import multimodal as mm
    from report_worker_spark.functions.curation import span_corrupt
    from report_worker_spark.operators import masked_position_pairs

    # fuzzy linkage blocking: K× fixed-length codes; per-position
    # masked keys fan out ×len(code), block sizes bounded by true
    # near-dup density — pair volume should track corpus ~linearly
    codes = docs.select(
        "doc_id", F.format_string("DOC#%012d", F.col("doc_id")).alias("code")
    )
    timings["dedup_fuzzy_masked_pairs"] = timed(
        masked_position_pairs(codes, id_col="doc_id", name_col="code")
    )
    # perceptual hash: REAL PNG decode + 8×8 resample per image — pure
    # per-item Arrow kernel work, embarrassingly parallel
    timings["multimodal_image_ahash"] = timed(
        mm.png_ahash(
            mm.synthetic_image_media(
                docs.select((F.col("doc_id") * 2).alias("doc_id")), "doc_id"
            )
        )
    )
    # span corruption: one corpus shuffle on doc_id (windows + the
    # reassembly groupBy ride the same partitioning)
    timings["curation_span_corruption"] = timed(span_corrupt(docs))

    # ------------------------------------------------------------------
    # Round-7 late batch: the new ops whose scale story earns a K row.
    # ------------------------------------------------------------------
    # GIF decode: per-item LZW + palette Arrow kernel, embarrassingly
    # parallel like the PNG/JPEG decodes
    timings["multimodal_gif_pixel_stats"] = timed(
        mm.gif_pixel_stats(
            mm.synthetic_gif_media(
                docs.select((F.col("doc_id") * 2 + 1).alias("doc_id")),
                "doc_id",
            )
        )
    )
    # TextRank: edge build is linear in tokens (one lead window per
    # doc); the PR iterations run on the vocabulary-bounded word
    # graph, so K× corpus should leave them near-constant (scale-mode
    # summed PR, not the deterministic fold)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "w"
        ),
    )
    wn = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    word_edges = (
        toks.withColumn("wn", wn)
        .filter(
            F.col("wn").isNotNull()
            & (F.col("w") != "")
            & (F.col("wn") != "")
            & (F.col("w") != F.col("wn"))
        )
        .select(
            F.least("w", "wn").alias("src"),
            F.greatest("w", "wn").alias("dst"),
        )
        .distinct()
    )
    timings["text_textrank_pr"] = timed(
        gr.pagerank(
            gr.undirected_edges(word_edges), iterations=3,
            deterministic=False,
        )
    )
    # MMR rerank: candidate scoring is ONE linear corpus pass
    # (broadcast queries); everything after the top-20 cut is
    # constant-size, so growth should track the scan alone
    timings["sim_mmr_rerank"] = timed_build(
        lambda: sim.mmr_rerank(emb)
    )

    # ------------------------------------------------------------------
    # Round-7 session-2 batch: traversal, restart walks, the exact-rank
    # device, the sharded prefix sum, and the silence kernel.
    # ------------------------------------------------------------------
    # BFS: per-hop cost tracks the frontier's out-edges; K disjoint
    # replicas seed independently (seeds scale ×K), so total work ~K
    seeds = gr.degrees(edges).select("node").filter(
        F.col("node") % 97 == 0
    )
    timings["graph_bfs_khop"] = timed_build(
        lambda: gr.bfs_khop(edges, seeds, max_hops=4)
    )
    # min-label propagation: one map-side-combining groupBy per round
    # over self ∪ neighbor candidates — linear in edges per round
    timings["graph_label_propagation"] = timed_build(
        lambda: gr.label_propagation(edges, rounds=3)
    )
    # PPR (sum mode): pagerank economics + one left join per round
    timings["graph_ppr_sum"] = timed_build(
        lambda: gr.personalized_pagerank(
            edges, seeds, iterations=3, deterministic=False
        )
    )
    # exact-rank quantile normalization: range-sharded global ranks
    # (per-shard windows + bounded offset table) — the no-global-sort
    # device under K× doc volume
    def _qnorm(d: DataFrame) -> DataFrame:
        sh = (F.col("n_chars") / 64).cast("long").alias("_shard")
        dd_ = d.select("doc_id", "source", "n_chars", sh)
        win_in = Window.partitionBy("_shard").orderBy("n_chars", "doc_id")
        cnt = dd_.groupBy("_shard").agg(F.count(F.lit(1)).alias("_cnt"))
        woff = Window.orderBy("_shard").rowsBetween(
            Window.unboundedPreceding, -1
        )
        off = cnt.select(
            "_shard",
            F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
        )
        ranked = dd_.join(F.broadcast(off), on="_shard").select(
            "doc_id", "source", "n_chars",
            (F.col("_off") + F.row_number().over(win_in)).alias("prank"),
        )
        ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        n_tot = ranked.agg(F.count(F.lit(1)).alias("n"))
        src = ranked.select(
            "doc_id", "source", "n_chars",
            F.row_number().over(ws).alias("r_s"),
            F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_s"),
        ).crossJoin(F.broadcast(n_tot)).select(
            "doc_id", "source", "n_chars",
            F.floor(
                (F.col("r_s") * F.col("n") + F.col("n_s") - 1) / F.col("n_s")
            ).alias("idx"),
        )
        pooled = ranked.select("prank", F.col("n_chars").alias("norm"))
        return src.join(pooled, src.idx == pooled.prank)

    timings["stats_quantile_normalize"] = timed(
        _qnorm(docs.withColumn("n_chars", F.length("text")))
    )
    # shard manifest: the sharded two-phase prefix sum at K× docs
    from report_worker_spark.functions.curation import shard_manifest

    timings["curation_shard_manifest"] = timed(
        shard_manifest(
            docs.withColumn("n_chars", F.length("text")),
            50_000, id_col="doc_id", weight_col="n_chars",
        )
    )
    # silence runs: per-clip vectorized run-length Arrow kernel —
    # embarrassingly parallel like the other media decodes
    timings["multimodal_wav_silence_runs"] = timed(
        mm.wav_silence_runs(
            mm.synthetic_wav_media(docs.select("doc_id"), "doc_id")
        )
    )

    # ------------------------------------------------------------------
    # Round-7 session-3 batch: vocabulary-bounded pair ops, the integer
    # ANN audits, and the bipartite wedge census.
    # ------------------------------------------------------------------
    # PMI: tokens filter through the top-100-df broadcast vocab BEFORE
    # any pairing, so the per-doc fan-out is vocab-bounded and total
    # pair volume grows ~K with the corpus
    dtoks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).distinct()
    wv = Window.orderBy(F.col("df").desc(), F.col("w").asc())
    vocab = (
        dtoks.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
        .withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= 100).drop("r")
    )
    ft = dtoks.join(F.broadcast(vocab), on="w")
    timings["text_pmi_pairs"] = timed(
        ft.alias("a")
        .join(ft.alias("b"), on="doc_id")
        .filter(F.col("a.w") < F.col("b.w"))
        .groupBy(F.col("a.w"), F.col("b.w"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    # kNN outlier census: the shipped operator (similarity.
    # knn_outlier_census, post-VERDICT-r7-#3) — fixed 200-id audit
    # sample (TakeOrdered), one Arrow pass emitting per-batch top-5
    # partials, so work = sample × corpus grows ~K, never K²
    timings["emb_knn_outlier_census"] = timed_build(
        lambda: sim.knn_outlier_census(emb, k=5, sample_k=200, top=30)
    )
    # Burrows' Delta: the pair join is keyed on the 30-word vocab —
    # sources² · 30 rows regardless of corpus size; only the count
    # pass scales with K
    stoks = docs.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    scnt = stoks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    wtv = Window.orderBy(F.col("tc").desc(), F.col("w").asc())
    top30 = (
        scnt.groupBy("w").agg(F.sum("c").alias("tc"))
        .withColumn("r", F.row_number().over(wtv))
        .filter(F.col("r") <= 30).select("w")
    )
    timings["text_burrows_counts"] = timed(
        scnt.join(F.broadcast(top30), on="w")
    )
    # butterflies: wedge budget = Σ deg² over the pivot side; K
    # replicas keep customers disjoint, so the census grows ~K
    bedges = upscale_cooccur_edges(spark, K).select("src", "dst")
    timings["graph_butterfly_census"] = timed(
        bedges.alias("a")
        .join(bedges.alias("b"), on="src")
        .filter(F.col("a.dst") < F.col("b.dst"))
        .groupBy(F.col("a.dst"), F.col("b.dst"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    # image entropy: per-item decode + one histogram row per image —
    # embarrassingly parallel like the aHash/GIF kernels
    timings["multimodal_image_entropy"] = timed(
        mm.png_r_histogram(
            mm.synthetic_image_media(
                docs.select((F.col("doc_id") * 2).alias("doc_id")),
                "doc_id",
            )
        )
    )

    # ------------------------------------------------------------------
    # Round-10 batch (VERDICT_r9 item 2): the round-9 heavy family —
    # winnowing fingerprints, the dedup threshold yield curve, the
    # rolling-distinct day fan-out, banded DTW on long series, the
    # revenue-decile migration, and the WAV Goertzel kernel.
    # ------------------------------------------------------------------
    import pandas as pd

    from report_worker_spark.functions.timeseries import dtw_distance

    # winnowing: the r13 ZERO-SHUFFLE census, mirroring the catalog
    # query's CURRENT plan (the stress replica previously timed the
    # pre-r13 explode → corpus-wide DISTINCT → countDistinct form;
    # review finding): one arrays_zip of 4 shifted slices, scalar
    # rightmost-argmin, per-doc array_distinct — no exchange at all.
    # Wall is md5-bound (the engine-portable fingerprint cost);
    # per-doc arrays bounded by document length.
    wtoks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    whs = F.expr(
        "transform(sequence(1, size(t) - 2),"
        " i -> md5(concat(element_at(t, i), ' ',"
        " element_at(t, i + 1), ' ', element_at(t, i + 2))))"
    )
    wgrams = wtoks.select("doc_id", whs.alias("hs")).filter(
        F.size("hs") >= 4
    )
    wpicks = F.expr(
        "transform("
        " transform("
        "  arrays_zip(slice(hs, 1, size(hs) - 3),"
        "             slice(hs, 2, size(hs) - 3),"
        "             slice(hs, 3, size(hs) - 3),"
        "             slice(hs, 4, size(hs) - 3)),"
        "  s -> struct(s['0'] as a, s['1'] as b, s['2'] as c,"
        "              s['3'] as d,"
        "              least(s['0'], s['1'], s['2'], s['3']) as fp)),"
        " (s, i) -> struct("
        "  cast(i + (case when s.d = s.fp then 3"
        "                 when s.c = s.fp then 2"
        "                 when s.b = s.fp then 1"
        "                 else 0 end) as bigint) as pos,"
        "  s.fp as fp))"
    )
    wsel = wgrams.select("doc_id", F.array_distinct(wpicks).alias("_sel"))
    wfps = F.transform(F.col("_sel"), lambda s: s.fp)
    timings["dedup_winnowing_fingerprints"] = timed(
        wsel.select(
            "doc_id",
            F.size("_sel").cast("long").alias("n_fingerprints"),
            F.size(F.array_distinct(wfps)).cast("long").alias(
                "n_distinct_fp"
            ),
            F.array_min(wfps).alias("min_fp"),
        )
    )
    # threshold yield curve: the PPJoin pair stream at the LOWEST
    # bucketed threshold (0.5) + one decile-histogram groupBy — the
    # pair volume itself is the near-dup density of the corpus (each
    # replica family is K mutual near-dups, so pairs grow ~K²/2 BY
    # CONSTRUCTION here; the op's own overhead tracks the pair stream)
    timings["dedup_threshold_yield_curve"] = timed(
        dd.ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=500 * K)
        .select(
            F.floor(F.col("jaccard") * 10).cast("long").alias("jaccard_decile")
        )
        .groupBy("jaccard_decile")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    # rolling distinct users: K× events with DISJOINT per-replica user
    # spaces; shuffle volume is 7×|user-days| regardless of raw event
    # volume — the day fan-out device at scale
    ev = load(spark, SF_DIR, "events")
    ereps = spark.range(K).select(F.col("id").cast("int").alias("rep"))
    ev_day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    ud_k = (
        ev.select("user_id", ev_day.alias("day"))
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .crossJoin(F.broadcast(ereps))
        .select(
            (
                F.col("user_id")
                + F.col("rep").cast("long") * F.lit(100_000_000)
            ).alias("user_id"),
            "day",
        )
        .distinct()
    )
    fan_k = ud_k.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias(
            "target_day"
        ),
    ).filter(F.col("target_day") <= 29)
    timings["ts_rolling_distinct_users"] = timed(
        fan_k.groupBy("target_day").agg(
            F.countDistinct("user_id").alias("dau_7d")
        )
    )
    # banded DTW on LONG series: replica r appends 30 more days, so the
    # per-pair series length is L = 30·K; with the Sakoe-Chiba band the
    # kernel is O(L·band) — growth should track L, never L²
    gridl = (
        ev.select("event_type", ev_day.alias("d"))
        .filter((F.col("d") >= 0) & (F.col("d") <= 29))
        .crossJoin(F.broadcast(ereps))
        .select(
            "event_type", (F.col("d") + F.col("rep") * 30).alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Dense 0..30·K-1 day spine per event type (fill 0): series built
    # from observed (type, day) cells alone can differ in length by more
    # than the band whenever a type skips >band/K days, which would make
    # dtw_distance raise inside the kernel and fail the whole timing.
    etypes = gridl.select("event_type").distinct()
    spine = etypes.crossJoin(
        F.broadcast(
            spark.range(30 * K).select(F.col("id").cast("int").alias("day"))
        )
    )
    gridl = spine.join(gridl, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )
    lseries = gridl.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"],
        ).alias("series")
    )
    lseries = lseries.localCheckpoint(eager=False)
    la = lseries.select(
        F.col("event_type").alias("type_a"), F.col("series").alias("sa")
    )
    lb = lseries.select(
        F.col("event_type").alias("type_b"), F.col("series").alias("sb")
    )
    lpairs = la.crossJoin(lb).filter(F.col("type_a") < F.col("type_b"))

    def dtw_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "type_a": ta,
                    "type_b": tb,
                    "dtw": dtw_distance(sa, sb, band=16),
                }
                for ta, tb, sa, sb in zip(
                    pdf["type_a"], pdf["type_b"], pdf["sa"], pdf["sb"]
                )
            ]
        )

    timings["ts_dtw_banded_long"] = timed(
        lpairs.groupBy("type_a", "type_b").applyInPandas(
            dtw_kernel, schema="type_a string, type_b string, dtw long"
        )
    )
    # decile migration: K× lineitem with DISJOINT per-replica partkeys;
    # the two ntile windows are global sorts over the PART-level yearly
    # rollup (not raw lineitem) — measure that reduced-cardinality sort
    lreps = spark.range(K).select(F.col("id").cast("int").alias("rep"))
    li_k = (
        load(spark, SF_DIR, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice")
        .filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        )
        .crossJoin(F.broadcast(lreps))
        .select(
            (
                F.col("l_partkey")
                + F.col("rep").cast("long") * F.lit(1_000_000_000)
            ).alias("l_partkey"),
            "l_shipdate",
            "l_extendedprice",
        )
    )
    yearly_k = li_k.groupBy(
        "l_partkey", F.year("l_shipdate").alias("y")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "rev"
        )
    )
    ya = yearly_k.filter(F.col("y") == 1994).select(
        "l_partkey", F.col("rev").alias("r94")
    )
    yb = yearly_k.filter(F.col("y") == 1995).select(
        "l_partkey", F.col("rev").alias("r95")
    )
    yboth = ya.join(yb, "l_partkey")
    yranked = yboth.select(
        F.ntile(10)
        .over(Window.orderBy(F.col("r94").desc(), F.col("l_partkey")))
        .alias("d94"),
        F.ntile(10)
        .over(Window.orderBy(F.col("r95").desc(), F.col("l_partkey")))
        .alias("d95"),
    )
    timings["olap_price_decile_migration"] = timed(
        yranked.groupBy("d94", "d95").agg(F.count(F.lit(1)).alias("n"))
    )
    # WAV Goertzel bins: per-clip integer-trig Arrow kernel over the
    # real decode — embarrassingly parallel like silence_runs
    timings["multimodal_wav_goertzel_bins"] = timed(
        mm.wav_goertzel_bins(
            mm.synthetic_wav_media(docs.select("doc_id"), "doc_id")
        )
    )

    # ------------------------------------------------------------------
    # Round-11 additions (VERDICT_r10 item 4): the round-10 heavy
    # family at ~sf1 — quarterly OLS slopes, user accumulation curve,
    # price indices, clustering-by-degree, duplicate-event census.
    # ------------------------------------------------------------------
    # quarterly OLS: K× lineitem rows into a ~365-row day rollup — the
    # scan + map-side partial agg is the whole cost, slopes are free
    li97 = (
        load(spark, SF_DIR, "lineitem")
        .select("l_shipdate", "l_extendedprice")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .crossJoin(F.broadcast(ereps))
    )
    daily97 = li97.groupBy(
        F.trunc(F.col("l_shipdate").cast("date"), "quarter").alias("q"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1997-01-01").cast("date"),
        ).alias("x"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "y"
        )
    )
    sq = daily97.groupBy("q").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    timings["stats_ols_slope_by_quarter"] = timed(
        sq.select(
            "q",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
                "num"
            ),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
                "den"
            ),
        )
    )
    # accumulation curve: DISJOINT per-replica user spaces → the
    # user-grain min() grows ×K; the day rollup stays 30 rows
    evu_k = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).crossJoin(F.broadcast(ereps)).select(
        (
            F.col("user_id") + F.col("rep").cast("long") * F.lit(100_000_000)
        ).alias("user_id"),
        "d",
    )
    firsts_k = evu_k.groupBy("user_id").agg(F.min("d").alias("first_day"))
    per_day_k = firsts_k.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    wacc = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    timings["olap_user_accumulation_curve"] = timed(
        per_day_k.select(
            "first_day", F.sum("n_new").over(wacc).alias("cum_users")
        )
    )
    # price indices: DISJOINT per-replica partkeys → part-grain groupBy
    # and the part self-join both grow ×K
    lireps = spark.range(K).select(F.col("id").cast("int").alias("rep"))
    li_px = (
        load(spark, SF_DIR, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .crossJoin(F.broadcast(lireps))
        .select(
            (
                F.col("l_partkey")
                + F.col("rep").cast("long") * F.lit(1_000_000_000)
            ).alias("part"),
            F.when(
                F.col("l_shipdate") < F.lit("1997-01-01").cast("date"), 0
            )
            .otherwise(1)
            .alias("yr"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias(
                "cents"
            ),
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )
    per_px = li_px.groupBy("part", "yr").agg(
        F.sum("cents").alias("rev"), F.sum("qty").alias("qty")
    )
    a_px = per_px.filter((F.col("yr") == 0) & (F.col("qty") > 0)).select(
        "part", F.col("rev").alias("r0"), F.col("qty").alias("q0")
    )
    b_px = per_px.filter((F.col("yr") == 1) & (F.col("qty") > 0)).select(
        "part", F.col("rev").alias("r1"), F.col("qty").alias("q1")
    )
    both_px = a_px.join(b_px, "part")
    timings["olap_price_index_laspeyres_paasche"] = timed(
        both_px.agg(
            F.sum("r0").alias("sum_p0q0"),
            F.sum("r1").alias("sum_p1q1"),
            F.sum(F.col("r1") * F.col("q0") / F.col("q1")).alias("sum_p1q0"),
            F.sum(F.col("r0") * F.col("q1") / F.col("q0")).alias("sum_p0q1"),
        )
    )
    # clustering-by-degree: the directed triple join over the upscaled
    # co-occurrence graph — the triangle census is the cost; the
    # bucket rollup is a ~12-row afterthought
    und_cd = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg_cd = gr.degrees(edges).filter(F.col("deg") >= 2)
    tri_cd = (
        und_cd.select(F.col("src").alias("node"), F.col("dst").alias("m1"))
        .join(
            und_cd.select(
                F.col("src").alias("m1"), F.col("dst").alias("m2")
            ),
            "m1",
        )
        .join(
            und_cd.select(
                F.col("src").alias("m2"), F.col("dst").alias("node")
            ),
            ["m2", "node"],
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t2"))
    )
    loc_cd = deg_cd.join(tri_cd, "node", "left").select(
        F.length(
            F.conv(F.col("deg").cast("string"), 10, 2)
        ).alias("deg_bucket"),
        (
            F.coalesce("t2", F.lit(0)).cast("double")
            / (F.col("deg").cast("double") * (F.col("deg") - 1))
        ).alias("c_i"),
    )
    timings["graph_clustering_by_degree"] = timed(
        loc_cd.groupBy("deg_bucket").agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.avg("c_i").alias("mean_c"),
        )
    )
    # duplicate-event census: content-grain groupBy over K× events —
    # replicas share (type, user, ts, cents) so multiplicity is ≥K by
    # construction, exercising the dup-heavy branch
    ev_dup = ev.select(
        "event_type",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).crossJoin(F.broadcast(ereps)).drop("rep")
    g_dup = ev_dup.groupBy("event_type", "user_id", "ts", "cents").agg(
        F.count(F.lit(1)).alias("mult")
    )
    timings["audit_exact_duplicate_events"] = timed(
        g_dup.groupBy("event_type").agg(
            F.sum("mult").alias("n_events"),
            F.sum(
                F.when(F.col("mult") > 1, F.col("mult") - 1).otherwise(0)
            ).alias("n_redundant"),
            F.max("mult").alias("max_multiplicity"),
        )
    )

    # ------------------------------------------------------------------
    # Round-12 additions (VERDICT_r11 item 5): the round-11 family at
    # ~sf1 — the NB classifier scoring join (docs × 5 classes, the
    # watch item: fan-out must stay 5× token volume, never quadratic),
    # its margin-quintile reliability window, ZCA whitening +
    # Mahalanobis, the MP4 frame-demux Arrow kernel (the other watch
    # item), the jackknife ratio SE rollup, and the Herfindahl
    # concentration rollup at K× customer grain.
    # ------------------------------------------------------------------
    from report_worker_spark.functions import linalg as la

    ntok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    )
    nm = ntok.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).alias("m")
    )
    ncnt = ntok.groupBy(F.col("lang").alias("clang"), "w").agg(
        F.count(F.lit(1)).alias("n_wl")
    )
    ntot = ncnt.groupBy("clang").agg(F.sum("n_wl").alias("n_l"))
    nv = ntok.agg(F.countDistinct("w").alias("vocab"))
    nnl = docs.groupBy(F.col("lang").alias("clang")).agg(
        F.count(F.lit(1)).alias("n_docs_l")
    )
    ngrid = nm.crossJoin(F.broadcast(nnl.select("clang")))
    nterm = (
        ngrid.join(ncnt, ["clang", "w"], "left")
        .join(F.broadcast(ntot), "clang")
        .crossJoin(F.broadcast(nv))
        .select(
            "doc_id",
            "lang",
            "clang",
            (
                F.col("m")
                * F.log(
                    (F.coalesce("n_wl", F.lit(0)) + 1).cast("double")
                    / (F.col("n_l") + F.col("vocab"))
                )
            ).alias("t"),
        )
    )
    nscores = nterm.groupBy("doc_id", "lang", "clang").agg(
        F.sum("t").alias("s")
    )
    w_nb = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("clang").asc()
    )
    npred = nscores.withColumn("rk", F.row_number().over(w_nb))
    timings["text_nb_score_join"] = timed(
        npred.filter(F.col("rk") == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("clang") == F.col("lang"), 1).otherwise(0)
            ).alias("ok"),
        )
    )
    # margin reliability: rank-1 minus rank-2 score per doc, then the
    # exact quintile bucketing via the shipped range-sharded ntile
    # (functions.ranks.ranked_ntile — replaced the global ordered
    # ntile whose single-task sort was the r12 watch item)
    from report_worker_spark.functions.ranks import ranked_ntile

    na_m = npred.filter(F.col("rk") == 1).select(
        "doc_id", F.col("s").alias("s1")
    )
    nb_m = npred.filter(F.col("rk") == 2).select(
        "doc_id", F.col("s").alias("s2")
    )
    nmarg = na_m.join(nb_m, "doc_id").select(
        "doc_id", (F.col("s1") - F.col("s2")).alias("margin")
    )
    timings["text_nb_margin_ntile"] = timed_build(
        lambda: ranked_ntile(
            nmarg, [F.col("margin").asc(), F.col("doc_id").asc()], 5,
            out_col="q",
        )
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # ZCA whitening + full-covariance Mahalanobis: two Arrow data
    # passes (d×d moment partials, then broadcast-matmul scoring);
    # driver work is the 64×64 eigh only
    timings["emb_zca_mahalanobis"] = timed_build(
        lambda: la.mahalanobis_distances(emb, dim=64)
    )
    # MP4 frame demux: encode spec-valid ISO-BMFF with a full sample
    # table, then demux every frame back — per-item Arrow kernel,
    # embarrassingly parallel; K× items, zero shuffle
    timings["multimodal_frame_demux"] = timed(
        mm.mp4_frame_stats(
            mm.synthetic_mp4_frame_media(docs.select("doc_id"), "doc_id")
        )
    )
    # jackknife ratio SE: K× orders into the 25-nation group table —
    # the groupBy + dim joins are the whole cost, the delete-one fold
    # is a 25-row afterthought
    o_jk = (
        load(spark, SF_DIR, "orders")
        .select("o_custkey", "o_totalprice")
        .crossJoin(F.broadcast(ereps))
    )
    c_jk = load(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    n_jk = load(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    timings["stats_jackknife_ratio_se"] = timed(
        o_jk.join(c_jk, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_jk), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("c_i"),
            F.count(F.lit(1)).alias("n_i"),
        )
    )
    # Herfindahl: DISJOINT per-replica custkeys → the customer-grain
    # pre-aggregation grows ×K; nation/region rollup stays 25 rows
    o_h = (
        load(spark, SF_DIR, "orders")
        .select("o_custkey", "o_totalprice")
        .crossJoin(F.broadcast(ereps))
        .select(
            (
                F.col("o_custkey")
                + F.col("rep").cast("long") * F.lit(100_000_000)
            ).alias("ck"),
            "o_totalprice",
        )
    )
    per_cust_h = o_h.groupBy("ck").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    n_h = load(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r_h = load(spark, SF_DIR, "region").select("r_regionkey", "r_name")
    rev_h = (
        per_cust_h.withColumn("c_custkey", F.col("ck") % F.lit(100_000_000))
        .join(c_jk, "c_custkey")
        .join(F.broadcast(n_h), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r_h), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("cents").alias("cents"))
    )
    tot_h = rev_h.groupBy("region").agg(F.sum("cents").alias("t"))
    timings["olap_herfindahl_rollup"] = timed(
        rev_h.join(F.broadcast(tot_h), "region")
        .select(
            "region",
            (
                (F.col("cents").cast("double") / F.col("t"))
                * (F.col("cents").cast("double") / F.col("t"))
            ).alias("s2"),
        )
        .groupBy("region")
        .agg(F.sum("s2").alias("hhi"))
    )

    timings.update(run_r13_additions(spark, docs, emb, edges, ev, ereps))

    # ------------------------------------------------------------------
    # Composed curation deployment (VERDICT_r5 item 7): the end-to-end
    # path a training-data run executes — quality gate → exact dedup →
    # LSH near-dup components → substring trim → benchmark
    # decontamination → split → sequence packing → partitioned parquet.
    # Timed at k/2 and k to record the composed wall-growth ratio
    # (plans are pinned individually in tests/test_scale_plans.py; the
    # point here is that COMPOSITION stays ~linear too — no stage
    # feeds a superlinear blowup into the next).
    # ------------------------------------------------------------------
    def timed_run(fn) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 2)

    half = upscale_documents(spark, max(1, K // 2))
    timings["composed_curation_khalf"] = timed_run(
        lambda: run_composed_curation(spark, half)
    )
    timings["composed_curation_k"] = timed_run(
        lambda: run_composed_curation(spark, docs)
    )
    kh, kf = (
        timings["composed_curation_khalf"],
        timings["composed_curation_k"],
    )
    timings["composed_growth_ratio"] = round(kf / kh, 2) if kh else 0.0

    print(
        json.dumps(
            {
                "metric": "stress_total",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "k": K,
                "n_docs": n_docs,
                "n_embeddings": n_emb,
            }
        )
    )




def run_r14_additions(spark, docs_k, edges) -> dict:
    """Round-14 stress entries (VERDICT_r13 item 8): the round-13
    catalog additions at ~sf1 — the streaming near-dedup BATCH ANALOG
    (band-majority verdict: signature groupBy + (band,bucket) window +
    verdict groupBy, no pair materialization), the AllPairs
    length-filtered jaccard pair stream at the t=0.9 boundary (the
    r13-added filter prunes hardest where pair lengths sit at the
    threshold ratio — replicas are near-dups of replica 0, exactly
    that shape), and a targeted fresh-JVM personalized-PageRank SUM
    (previously only measured inside the full shared-session sweep).
    Callable standalone (STRESS_FAMILY=r14) for K=2 / K=10 exponents.
    """
    timings: dict[str, float] = {}

    def timed(df: DataFrame) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    timings["dedup_stream_band_majority_batch"] = timed(
        dd.band_majority_verdict(docs_k)
    )
    timings["dedup_jaccard_allpairs_t09"] = timed(
        dd.ngram_jaccard_pairs(docs_k, n=3, threshold=0.9, max_df=500)
    )
    seeds = gr.degrees(edges).select("node").filter(F.col("node") % 97 == 0)
    timings["graph_ppr_sum"] = timed(
        gr.personalized_pagerank(
            edges, seeds, iterations=3, deterministic=False
        )
    )
    return timings


def main_r14() -> None:
    spark = get_spark("rws-stress-r14")
    docs_k = upscale_documents(spark, K)
    edges = gr.undirected_edges(upscale_cooccur_edges(spark, K))
    timings = run_r14_additions(spark, docs_k, edges)
    print(
        json.dumps(
            {
                "metric": "stress_r14",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "k": K,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("STRESS_FAMILY") == "r13":
        main_r13()
    elif os.environ.get("STRESS_FAMILY") == "r14":
        main_r14()
    else:
        main()
