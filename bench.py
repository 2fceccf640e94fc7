#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the no-op sink (full execution, no
driver collect). Scale-sensitive picks: the similarity headliners are
the bucketed ANN paths (hyperplane LSH and IVF — per-bucket/per-cell
equi-joins, no driver round-trip) plus the cogrouped blocked-BLAS
exact path; no headline plan contains a driver collect (the
≤10⁶-vector brute_topk_matmul mid-tier is a documented utility, not a
headliner); jaccard caps hot-shingle fan-out via max_df.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame

from report_worker_spark.functions import dedup as dd
from report_worker_spark.functions import similarity as sim
from report_worker_spark.plans import QUERIES
from report_worker_spark.plans.tables import load
from report_worker_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Catalog queries benched as-is.
CATALOG_BENCH = [
    "flagship_top_reported",
    "olap_q1_pricing_summary",
    "star_upsert_fact",
    "a2_unique_key_dedup",
    "j4_nullsafe_fk_join",
    "f1_f2_ts_bounds",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "curation_chunk_overlap",
    "text_gopher_quality",
    "drift_ks_2sample",
    "olap_q6_forecast_revenue",
    "join_interval_overlap",
    "graph_triangle_count",
    "dedup_containment_pairs",
    "topk_heavy_tokens",
    "text_bm25_topk",
    "text_boilerplate_removal",
    "text_intradoc_dedup",
    "dedup_exact_substring",
    "text_bigram_lm_score",
]


def scale_variants(spark) -> dict[str, DataFrame]:
    """Perf-path variants of ops whose oracle form is O(n²)-exact, plus
    the end-to-end wire ingest (the reference's actual workload: its
    design envelope is ~17 msg/s sustained, BASELINE.md)."""
    from pyspark.sql import functions as F

    from report_worker_spark.sources import kafka as ksrc
    from report_worker_spark.sources.synthetic import generate_report_json
    from report_worker_spark.streaming.pipeline import wire_to_staging

    docs = load(spark, SF_DIR, "documents")
    emb = load(spark, SF_DIR, "embeddings")

    raw = generate_report_json(spark, n=100_000, seed=42)
    players = (
        load(spark, SF_DIR, "customer")
        .select(
            F.concat(F.lit("player"), (F.col("c_custkey") % 300)).alias("name"),
            (F.col("c_custkey") % 300).alias("id"),
        )
        .dropDuplicates(["name"])
    )
    wire = wire_to_staging(ksrc.valid_messages(ksrc.parse_wire(raw)), players)

    return {
        "dedup_ngram_jaccard_capped": dd.ngram_jaccard_pairs(
            docs, n=3, threshold=0.8, max_df=500
        ),
        "wire_pipeline_100k_msgs": wire,
        "tfidf_top_terms": QUERIES["tfidf_top_terms"](spark, SF_DIR),
        "join_asof": QUERIES["join_asof"](spark, SF_DIR),
        "join_bigbig_revenue": QUERIES["join_bigbig_revenue"](spark, SF_DIR),
        # ANN headliners: the 100 TB paths (bucketed equi-joins)
        "sim_lsh_topk": sim.lsh_topk(emb, k=5, n_planes=6, n_tables=6, dim=64),
        "sim_ivf_topk": sim.ivf_topk(emb, k=5, n_centroids=64, n_probe=8),
        "sim_lsh_near_dup": sim.lsh_near_dup_pairs(
            emb, threshold=0.99, n_planes=8, n_tables=12, dim=64
        ),
        # exact-at-scale: Q×B cogrouped BLAS tiles, no driver round-trip.
        # (brute_topk_matmul, the driver-collected ≤10⁶-vector mid-tier,
        # is deliberately NOT benched: the headline list contains no
        # plan with a driver collect — it remains a documented utility.)
        "sim_topk_matmul_blocked": sim.blocked_topk_matmul(
            emb, k=5, n_blocks=4, n_query_groups=4
        ),
        # the production star-upsert path (hash surrogate keys, no
        # global sort) — the rank-mode catalog query exists for oracle
        # parity, this is what a deployment runs
        "star_upsert_hash_mode": _star_hash(spark),
        # graph scale path: map-side-combinable SUM PageRank (the
        # catalog twin runs the bit-reproducible fold mode for parity)
        "graph_pagerank_sum": _pagerank_sum(spark),
    }


def _pagerank_sum(spark) -> DataFrame:
    from report_worker_spark.functions import graph as gr
    from report_worker_spark.plans.catalog import _cooccur_edges

    edges = gr.undirected_edges(_cooccur_edges(spark, SF_DIR))
    return gr.pagerank(edges, iterations=3, deterministic=False)


def _star_hash(spark) -> DataFrame:
    from pyspark.sql import functions as F

    from report_worker_spark import star
    from report_worker_spark.plans.catalog import _star_staging
    from report_worker_spark.schemas import EQUIPMENT_SLOTS

    staging = _star_staging(spark, SF_DIR)
    for slot in EQUIPMENT_SLOTS:
        if slot not in staging.columns:
            staging = staging.withColumn(slot, F.lit(None).cast("int"))
    deltas = star.upsert_star(staging, key_mode="hash")
    return deltas["fact"].select("sighting_id", "location_id", "region_id")


def materialize(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("rws-bench")
    # Warm the JVM/IO path once so per-query numbers measure the plans.
    load(spark, SF_DIR, "lineitem").count()

    def timed(thunk) -> float:
        # One untimed warmup then min of 2: the first execution pays
        # whole-stage codegen (janino) compilation AND the generated
        # bytecode still runs interpreted until C2 JIT kicks in — the
        # widest plans (wire ingest: ~40 cols × several join stages)
        # measured 17s/8s/2.2s across runs 1/2/3, so min-of-2 without a
        # warmup still reported a warming run. One-time-per-plan-shape
        # costs amortize to zero on a long-lived cluster; steady state
        # is the honest throughput number.
        times = []
        for _ in range(3):
            spark.catalog.clearCache()  # isolate cross-query persists
            # ContextCleaner drops stale broadcasts/shuffles only on GC;
            # 24+ queries in one JVM otherwise accumulate until a
            # mid-query GC storm skews whichever query it lands on.
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize(thunk())
            times.append(time.perf_counter() - t0)
        return round(min(times[1:]), 3)

    timings: dict[str, float] = {}
    for name in CATALOG_BENCH:
        timings[name] = timed(lambda n=name: QUERIES[n](spark, SF_DIR))
    for name, df in scale_variants(spark).items():
        timings[name] = timed(lambda d=df: d)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
