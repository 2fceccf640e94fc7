"""Unit + plan-shape tests for the chunking / Gopher / fuzzy-match
operators, cross-checked against independent pure-Python references."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from report_worker_spark.functions.curation import chunk_with_overlap
from report_worker_spark.functions.text import gopher_flags
from report_worker_spark.operators import blocked_levenshtein_pairs
from tests.test_scale_plans import plan_of

TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 12,
    "one two three",
    "solo",
    "  padded   with   runs\tof\nwhitespace  ",
    "a " * 100,
]


def _py_chunks(text: str, window: int, stride: int):
    toks = re.split(r"\s+", text.strip())
    n = max(len(toks), 1)
    out = []
    for i, start in enumerate(range(1, n + 1, stride)):
        chunk = toks[start - 1 : start - 1 + window]
        h = hashlib.md5(" ".join(chunk).encode()).hexdigest()
        out.append((i, start, len(chunk), h))
    return out


def test_chunk_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_tokens, r.chunk_hash)
        for r in chunk_with_overlap(df, window=8, stride=5).collect()
    }
    want = {
        (i, *c) for i, t in enumerate(TEXTS) for c in _py_chunks(t, 8, 5)
    }
    assert got == want


def test_chunk_covers_every_token(spark):
    """Every token position lands in ≥1 chunk; consecutive chunks
    overlap by window - stride."""
    df = spark.createDataFrame([(0, TEXTS[0])], ["doc_id", "text"])
    rows = sorted(
        chunk_with_overlap(df, window=8, stride=5).collect(),
        key=lambda r: r.chunk_start,
    )
    n_tokens = len(TEXTS[0].split())
    covered = set()
    for r in rows:
        covered |= set(range(r.chunk_start, r.chunk_start + r.chunk_tokens))
    assert covered == set(range(1, n_tokens + 1))
    for a, b in zip(rows, rows[1:]):
        assert b.chunk_start - a.chunk_start == 5


def test_chunk_plan_has_no_shuffle(spark, sf_oracle):
    df = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    plan = plan_of(chunk_with_overlap(df))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_bruteforce(spark):
    names = [
        (1, "alice"), (2, "alicia"), (3, "alise"), (4, "bob"),
        (5, "rob"), (6, "bobb"), (7, "carol"), (8, "carole"),
    ]
    df = spark.createDataFrame(names, ["id", "name"]).withColumn(
        "blk", F.col("id") % 2
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_levenshtein_pairs(
            df, "id", "name", "blk", max_dist=2
        ).collect()
    }
    want = {
        (ia, ib, _lev(na, nb))
        for ia, na in names
        for ib, nb in names
        if ia < ib and ia % 2 == ib % 2 and _lev(na, nb) <= 2
    }
    assert got == want


def test_fuzzy_join_is_equi_join_on_block(spark, sf_oracle):
    """Candidate generation must be a hash equi-join on the blocking
    key — never a cartesian/broadcast-nested-loop over all pairs."""
    c = spark.read.parquet(f"{sf_oracle}/customer.parquet").withColumn(
        "blk", F.col("c_custkey") % 40
    )
    plan = plan_of(
        blocked_levenshtein_pairs(c, "c_custkey", "c_name", "blk")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gopher_flags_reference_doc(spark):
    doc = "The cat and the dog sat in the yard . " * 10  # 100 tokens
    df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    r = gopher_flags(df).collect()[0]
    assert r.n_tokens == 100
    assert r.flag_len  # 50 <= 100 <= 100000
    assert r.flag_stop  # 'the'/'and'/'in' hits
    assert not r.flag_avg_len  # mean len (29*10/100 = 2.9) < 3
    assert not r.gopher_pass


def test_gopher_plan_stays_jvm(spark, sf_oracle):
    df = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    assert "EvalPython" not in plan_of(gopher_flags(df))


def test_q4_plans_as_semi_join(spark, sf_oracle):
    from report_worker_spark.plans import QUERIES

    plan = plan_of(QUERIES["olap_q4_order_priority"](spark, sf_oracle))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q18_preaggregates_before_joins(spark, sf_oracle):
    from report_worker_spark.plans import QUERIES

    plan = plan_of(QUERIES["olap_q18_large_orders"](spark, sf_oracle))
    assert "SortAggregate" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final before joins
    assert "CartesianProduct" not in plan


def test_grouping_sets_single_expand(spark, sf_oracle):
    from report_worker_spark.plans import QUERIES

    plan = plan_of(QUERIES["agg_grouping_sets"](spark, sf_oracle))
    assert plan.count("Expand") >= 1
    assert "SortAggregate" not in plan


def test_ks_matches_python_reference(spark):
    from report_worker_spark.functions.drift import ks_2sample

    a = [1, 2, 2, 3, 7, 9]
    b = [2, 3, 3, 8, 8, 10, 12]
    df = spark.createDataFrame(
        [(x, 0) for x in a] + [(x, 1) for x in b], ["x", "grp"]
    )
    r = ks_2sample(df, "x", "grp").collect()[0]

    def ecdf(xs, v):
        return sum(1 for x in xs if x <= v) / len(xs)

    want = max(abs(ecdf(a, v) - ecdf(b, v)) for v in sorted(set(a + b)))
    assert r.n_a == len(a) and r.n_b == len(b)
    assert abs(r.ks_stat - want) < 1e-15


def test_ks_identical_distributions_is_zero(spark):
    from report_worker_spark.functions.drift import ks_2sample

    rows = [(v, g) for v in [1, 5, 5, 9] for g in (0, 1)]
    df = spark.createDataFrame(rows, ["x", "grp"])
    assert ks_2sample(df, "x", "grp").collect()[0].ks_stat == 0.0


def test_psi_empty_bins_stay_finite(spark):
    import math

    from report_worker_spark.functions.drift import psi_bins

    # group 0 only hits bin 1, group 1 only bin 2: maximal drift, but
    # smoothing must keep every contribution finite
    df = spark.createDataFrame(
        [(1, 0)] * 10 + [(2, 1)] * 10, ["bin", "grp"]
    )
    rows = psi_bins(df, "bin", "grp").collect()
    assert len(rows) == 2
    assert all(math.isfinite(r.psi_contrib) for r in rows)
    assert sum(r.psi_contrib for r in rows) > 1.0  # large drift signal


def test_pareto_frontier_matches_bruteforce(spark, sf_small):
    """The bucket-decomposed skyline must equal the O(n²) definition:
    keep x iff no y has strictly higher cents AND strictly later
    date."""
    from report_worker_spark.plans.catalog import olap_pareto_frontier
    from report_worker_spark.plans.tables import load

    rows = [
        (r.o_orderkey, round(r.o_totalprice * 100), r.o_orderdate)
        for r in load(spark, sf_small, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    ]
    want = {
        k
        for k, c, d in rows
        if not any(c2 > c and d2 > d for _, c2, d2 in rows)
    }
    got = {
        r.o_orderkey
        for r in olap_pareto_frontier(spark, sf_small).collect()
    }
    assert got == want
    assert 0 < len(got) < len(rows)


def test_pareto_frontier_windows_stay_bucketed(spark, sf_small):
    """The only unpartitioned window runs over the per-bucket rollup
    (dim-sized); the per-row window must carry the bucket partition
    key so the heavy pass stays distributed."""
    from report_worker_spark.plans.catalog import olap_pareto_frontier

    plan = plan_of(olap_pareto_frontier(spark, sf_small))
    import re as _re

    specs = _re.findall(r"windowspecdefinition\([^)]*\)", plan.lower())
    assert specs, plan
    partitioned = [s for s in specs if "bkt" in s]
    assert partitioned, specs


def test_token_budget_sample_matches_sequential(spark):
    """The sharded prefix-sum must equal the sequential greedy cut,
    independent of input partitioning, and must admit the straddling
    doc (cut on tokens BEFORE it)."""
    import hashlib

    from report_worker_spark.functions.curation import token_budget_sample

    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]
    order = sorted(
        rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
    )
    budget = 3000
    want, cum = {}, 0
    for did, nt in order:
        if cum < budget:
            cum += nt
            want[did] = cum
        else:
            break
    for nparts in (1, 16):
        df = spark.createDataFrame(
            rows, "doc_id long, n_tokens long"
        ).repartition(nparts)
        got = {
            r.doc_id: r.cum_tokens
            for r in token_budget_sample(df, budget).collect()
        }
        assert got == want
    # the last kept doc straddles the boundary
    assert max(want.values()) >= budget
    # degenerate budgets
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    assert token_budget_sample(df, 0).count() == 0
    assert token_budget_sample(df, 10**9).count() == len(rows)


def test_token_budget_sample_window_stays_sharded(spark):
    """The per-row running sum must ride the _shard partition; only
    the 256-row offset table may see an unpartitioned window."""
    from report_worker_spark.functions.curation import token_budget_sample
    from report_worker_spark.plans.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.lit(5).cast("long").alias("n_tokens")
    )
    plan = plan_of(token_budget_sample(d, 1000))
    import re as _re

    specs = _re.findall(r"windowspecdefinition\([^)]*\)", plan.lower())
    assert any("_shard" in s for s in specs), specs


def test_seasonal_decompose_residuals_sum_to_zero(spark, sf_oracle):
    """Per-dow residuals must sum to ~0 — the decomposition identity."""
    from report_worker_spark.plans.catalog import ts_seasonal_decompose

    rows = ts_seasonal_decompose(spark, sf_oracle).collect()
    by_dow = {}
    for r in rows:
        by_dow.setdefault(r.dow, []).append(r.residual)
    assert set(by_dow) <= set(range(1, 8))
    for dow, res in by_dow.items():
        assert abs(sum(res)) < 1e-6, (dow, sum(res))


def test_fuzzy_clusters_and_gini_invariants(spark, sf_small):
    """Fuzzy linkage vs a brute-force Python reference: every batch
    record links to the min-id master within Hamming distance 1 of
    its corrupted name, and n_candidates equals the exhaustive
    candidate count. Gini: bounded in [0, 1) and 0 for a degenerate
    equal-revenue group."""
    import hashlib

    from report_worker_spark.plans.catalog import (
        dedup_fuzzy_clusters,
        stats_gini_by_nation,
    )
    from report_worker_spark.plans.tables import load

    names = {
        r.c_custkey: r.c_name
        for r in load(spark, sf_small, "customer")
        .select("c_custkey", "c_name")
        .collect()
    }

    def corrupt(k: int, name: str) -> str:
        h = int(hashlib.md5(f"typo{k}".encode()).hexdigest()[:4], 16)
        pos = len(name) - (h % 9)  # 1-based
        return name[: pos - 1] + chr(97 + (h // 16) % 26) + name[pos:]

    def ham(a: str, b: str) -> int:
        if len(a) != len(b):
            return 99
        return sum(x != y for x, y in zip(a, b))

    rows = dedup_fuzzy_clusters(spark, sf_small).collect()
    assert len(rows) == len(names)
    for r in rows:
        assert r.rec_id % 2 == 1  # one output row per batch record
        k = (r.rec_id - 1) // 2
        bname = corrupt(k, names[k])
        cands = [2 * j for j, nm in names.items() if ham(bname, nm) <= 1]
        assert r.in_cluster and cands  # the twin always matches
        assert r.canonical_key == min(cands)
        assert r.n_candidates == len(cands)
    assert any(r.n_candidates > 1 for r in rows)  # real ambiguity exists

    g = stats_gini_by_nation(spark, sf_small).collect()
    assert len(g) > 0
    for r in g:
        assert 0.0 <= r.gini < 1.0, r

    # degenerate: equal revenue everywhere → gini exactly 0
    from pyspark.sql import Window

    cust = spark.createDataFrame(
        [(i, 1, 100) for i in range(10)],
        "c_custkey long, c_nationkey long, cents long",
    )
    wi = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    ranked = cust.select(
        "c_nationkey", "cents",
        F.row_number().over(wi).cast("long").alias("i"),
    )
    m = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("i") * F.col("cents")).alias("siw"),
    ).collect()[0]
    gini = 2 * m.siw / (m.n * m.s) - (m.n + 1) / m.n
    assert abs(gini) < 1e-12


def test_dp_noisy_counts_mechanism(spark, sf_oracle):
    """Laplace-mechanism sanity: noise is centered-ish, non-degenerate
    across keys, deterministic, and the true count is never emitted
    exactly (md5-uniform never lands exactly on the CDF median)."""
    from report_worker_spark.plans.catalog import curation_dp_noisy_counts

    rows = curation_dp_noisy_counts(spark, sf_oracle).collect()
    assert len(rows) > 5
    noises = [r.noisy_n - r.n for r in rows]
    assert len({round(x, 9) for x in noises}) == len(noises)  # per-key seeds
    assert any(x > 0 for x in noises) and any(x < 0 for x in noises)
    for x in noises:
        assert 0 < abs(x) < 25          # b=1 inverse CDF of (0,0.5) range
    again = curation_dp_noisy_counts(spark, sf_oracle).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_rake_matches_python_reference(spark, sf_small):
    """Full RAKE recomputed in pure Python on the small corpus — word
    deg/freq over stopword-cut phrases, summed smallest-first like the
    engine fold."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import text_rake_keywords
    from report_worker_spark.plans.tables import load

    stop = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}
    docs = load(spark, sf_small, "documents").select("text").collect()
    phrases = []
    for (text,) in docs:
        cur = []
        for w in text.strip().split():
            w = w.lower()
            if w in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    scored = defaultdict(int)
    for p in phrases:
        s = round(sum(sorted(deg[w] / freq[w] for w in p)), 6)
        scored[(" ".join(p), s)] += 1
    want = sorted(scored.items(), key=lambda kv: (-kv[0][1], kv[0][0]))[:50]
    got = text_rake_keywords(spark, sf_small).collect()
    assert [(r.phrase, r.score, r.n_occur) for r in got] == [
        (p, s, n) for (p, s), n in want
    ]


def test_countmin_overestimate_guarantee(spark, sf_oracle):
    """CMS point estimates must never undercount (min over d rows each
    ≥ the key's true contribution) and must be exact when no bucket
    collision occurs across all four hash rows."""
    from report_worker_spark.plans.catalog import agg_countmin_sketch

    rows = agg_countmin_sketch(spark, sf_oracle).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.true_cnt, r
    # width 256 vs ~200 users at sf0.01: some row should be exact
    assert any(r.cms_estimate == r.true_cnt for r in rows)


def test_bloom_membership_no_false_negatives(spark, sf_oracle):
    """A Bloom filter may overclaim, never underclaim: every truly-seen
    probe user must be claimed; the false-positive rate at 1024 bits /
    4 hashes must stay well under half of the true negatives."""
    from report_worker_spark.plans.catalog import audit_bloom_membership

    rows = audit_bloom_membership(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        if r.truly_seen:
            assert r.claimed, r
    negatives = [r for r in rows if not r.truly_seen]
    if negatives:
        fp = sum(1 for r in negatives if r.claimed)
        assert fp <= len(negatives) / 2


def test_span_corruption_reconstructs(spark, sf_oracle):
    """Denoising invariant: substituting each target span back into
    its sentinel slot reconstructs the original token stream exactly,
    for every document."""
    import re

    from report_worker_spark.plans.catalog import curation_span_corruption
    from report_worker_spark.plans.tables import load

    out = {
        r.doc_id: r
        for r in curation_span_corruption(spark, sf_oracle).collect()
    }
    docs = dict(
        load(spark, sf_oracle, "documents").select("doc_id", "text").collect()
    )
    assert set(out) == set(docs)
    n_with_masks = 0
    for did, r in out.items():
        spans = {}
        # parse target: "<extra_id_0> tok tok <extra_id_1> tok ..."
        if r.target:
            n_with_masks += 1
            chunks = re.split(r"<extra_id_(\d+)>", r.target)
            it = iter(chunks[1:])
            for k, toks_str in zip(it, it):
                spans[int(k)] = toks_str.strip()
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r.corrupted
        )
        assert rebuilt.split() == docs[did].strip().split(), did
        assert r.n_masked == sum(len(v.split()) for v in spans.values())
    assert n_with_masks > len(out) * 0.8   # ~15% rate masks most docs


def test_ab_test_null_split_sane(spark, sf_oracle):
    """The md5 bucketing is a NULL split (no real treatment), so the
    z-score must exist (non-degenerate conversion mix) and sit inside
    |z| < 4; arm sizes must be within a plausible 50/50 band."""
    from report_worker_spark.plans.catalog import stats_ab_test_proportions

    r = stats_ab_test_proportions(spark, sf_oracle).collect()[0]
    assert r.n0 > 0 and r.n1 > 0
    assert 0 < r.c0 + r.c1 < r.n0 + r.n1    # mixed conversions
    assert r.z_score is not None
    assert abs(r.z_score) < 4.0
    total = r.n0 + r.n1
    assert abs(r.n0 - total / 2) < total * 0.25


def test_burst_episodes_islands_law(spark, sf_oracle):
    """Episodes must partition the burst-day set into maximal
    consecutive runs: non-empty, non-overlapping, peak ≥ per-day
    threshold, and adjacent episodes separated by ≥1 quiet day."""
    from datetime import date, timedelta

    from report_worker_spark.plans.catalog import ts_burst_episodes

    rows = sorted(
        ts_burst_episodes(spark, sf_oracle).collect(),
        key=lambda r: r.episode_start,
    )
    assert rows
    for r in rows:
        start = date.fromisoformat(r.episode_start)
        end = date.fromisoformat(r.episode_end)
        assert (end - start).days + 1 == r.n_days
        assert r.peak <= r.total_events
    for a, b in zip(rows, rows[1:]):
        gap = (
            date.fromisoformat(b.episode_start)
            - date.fromisoformat(a.episode_end)
        ).days
        assert gap >= 2  # at least one quiet day between episodes


def test_exact_median_twopass_matches_sort(spark, sf_small):
    """The two-pass selection must return exactly the (n-1)//2-th
    element of the fully sorted column."""
    from report_worker_spark.plans.catalog import stats_exact_median_twopass
    from report_worker_spark.plans.tables import load

    cents = sorted(
        round(r.l_extendedprice * 100)
        for r in load(spark, sf_small, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    r = stats_exact_median_twopass(spark, sf_small).collect()[0]
    assert r.n == len(cents)
    assert r.median_cents == cents[(len(cents) - 1) // 2]


def test_zipf_fit_matches_numpy_ols(spark, sf_oracle):
    """Slope/intercept must match an independent numpy least-squares
    on the same top-1000 rank-frequency points, and the fit must be
    decreasing (Zipf-ish) on real token data."""
    import math
    from collections import Counter

    import numpy as np

    from report_worker_spark.plans.catalog import text_zipf_fit
    from report_worker_spark.plans.tables import load

    freq = Counter()
    for (text,) in load(spark, sf_oracle, "documents").select("text").collect():
        freq.update(w for w in text.strip().split() if w)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.array(
        [round(math.log(i + 1), 12) for i in range(len(top))]
    )
    y = np.array([round(math.log(c), 12) for _, c in top])
    slope, intercept = np.polyfit(x, y, 1)
    r = text_zipf_fit(spark, sf_oracle).collect()[0]
    assert r.n == len(top)
    assert abs(r.zipf_slope - slope) < 1e-6
    assert abs(r.zipf_intercept - intercept) < 1e-6
    assert r.zipf_slope < 0


def test_mad_matches_python_reference(spark, sf_small):
    """MAD must equal the sorted-list definition: median of absolute
    deviations from the lower median."""
    from report_worker_spark.plans.catalog import stats_mad_robust
    from report_worker_spark.plans.tables import load

    cents = sorted(
        round(r.l_extendedprice * 100)
        for r in load(spark, sf_small, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    med = cents[(len(cents) - 1) // 2]
    devs = sorted(abs(c - med) for c in cents)
    want_mad = devs[(len(devs) - 1) // 2]
    r = stats_mad_robust(spark, sf_small).collect()[0]
    assert (r.n, r.median_cents, r.mad_cents) == (len(cents), med, want_mad)


def test_masked_position_pairs_recall_law(spark):
    """The per-position masked-key blocking must find EXACTLY the
    brute-force Levenshtein<=1 pair set over fixed-length codes —
    complete recall (the pigeonhole guarantee) and exact precision
    (the verify pass)."""
    from itertools import combinations

    from report_worker_spark.operators import masked_position_pairs

    codes = [f"{a}{b}{c}" for a in "ab" for b in "abc" for c in "abc"]
    rows = [(i, s) for i, s in enumerate(codes)]
    df = spark.createDataFrame(rows, "id long, code string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in masked_position_pairs(
            df, id_col="id", name_col="code", max_dist=1
        ).collect()
    }

    def lev1(x, y):  # equal length: Hamming
        return sum(a != b for a, b in zip(x, y))

    want = {
        (i, j, lev1(codes[i], codes[j]))
        for i, j in combinations(range(len(codes)), 2)
        if lev1(codes[i], codes[j]) <= 1
    }
    assert got == want and want


def test_poison_inject_quarantine_equivalence(spark):
    """poisoned == quarantined, exactly: the injection rule's md5
    pick is what the quarantined decode must flag — no survivor
    decodes, no healthy item flagged — for all three media kinds."""
    import hashlib

    from pyspark.sql import functions as F

    from report_worker_spark.functions import multimodal as mm

    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    thresh = 20000  # ~30% poison rate on 120 items
    for media in [
        mm.synthetic_image_media(
            ids.select((F.col("doc_id") * 2).alias("doc_id")), "doc_id"
        ),
        mm.synthetic_wav_media(ids, "doc_id"),
        mm.synthetic_mp4_media(ids, "doc_id"),
    ]:
        kind = media.select("kind").first()["kind"]
        dec = {
            "image": mm.png_pixel_stats,
            "audio": mm.wav_sample_stats,
            "video": mm.mp4_header_stats,
        }[kind]
        q = dec(mm.poison_inject(media, threshold=thresh), True)
        got = {
            r.media_id for r in q.filter(~F.col("ok")).collect()
        }
        want = {
            r.media_id
            for r in media.select("media_id").collect()
            if int(
                hashlib.md5(f"poison{r.media_id}".encode()).hexdigest()[:4],
                16,
            )
            < thresh
        }
        assert got == want and want, kind


def test_kmv_estimates_within_bound(spark, sf_oracle):
    """KMV k=128 estimates land within 4/sqrt(k) (~35%) of the exact
    counts carried in the same row, and the exact set algebra is
    internally consistent (|A∪B| = |A| + |B| - |A∩B|)."""
    from report_worker_spark.plans.catalog import QUERIES

    r = QUERIES["agg_kmv_set_ops"](spark, sf_oracle).first()
    assert r.exact_union == r.exact_a + r.exact_b - r.exact_intersection
    bound = 4 / (128**0.5)
    for est, exact in [
        (r.est_a, r.exact_a),
        (r.est_b, r.exact_b),
        (r.est_union, r.exact_union),
        (r.est_intersection, r.exact_intersection),
    ]:
        assert exact > 0 and abs(est - exact) / exact < bound, (est, exact)


def test_bloom_prefilter_superset_and_fp_rate(spark, sf_oracle):
    """No false negatives (every true-match row survives the
    prefilter) and the false-positive rate among non-members stays
    under 1% at the default 2^17-bit / 3-hash sizing."""
    from pyspark.sql import functions as F

    from report_worker_spark.operators import bloom_prefilter
    from report_worker_spark.plans.tables import load

    cust = (
        load(spark, sf_oracle, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_oracle, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pref = bloom_prefilter(orders, "o_custkey", cust)
    true_keys = {r.c_custkey for r in cust.collect()}
    total = orders.count()
    n_true = orders.filter(F.col("o_custkey").isin(true_keys)).count()
    survivors = pref.count()
    n_true_surviving = pref.filter(
        F.col("o_custkey").isin(true_keys)
    ).count()
    assert n_true_surviving == n_true  # no false negatives
    fp = (survivors - n_true) / max(total - n_true, 1)
    assert fp < 0.01, fp


def test_bloom_prefilter_plan_shape(spark, sf_oracle):
    """The bitmap attaches as a single-row broadcast (the only
    nested-loop allowed) and the final join stays sort-merge on the
    key — the prefilter must not add a shuffle of its own on the
    probe side."""
    from report_worker_spark.plans.catalog import QUERIES

    from tests.test_scale_plans import plan_of

    plan = plan_of(QUERIES["join_bloom_prefilter"](spark, sf_oracle))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan


def test_welch_ttest_matches_numpy(spark, sf_small):
    """t statistic and Welch-Satterthwaite df agree with an
    independent numpy computation on the same cents."""
    import numpy as np
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    e = load(spark, sf_small, "events")
    cents = {
        t: np.array(
            [
                r.c
                for r in e.filter(F.col("event_type") == t)
                .select(F.round(F.col("value") * 100).cast("long").alias("c"))
                .collect()
            ],
            dtype=np.float64,
        )
        for t in ("click", "purchase")
    }
    a, b = cents["click"], cents["purchase"]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_np = (a.mean() - b.mean()) / np.sqrt(se2)
    df_np = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    r = QUERIES["stats_welch_ttest"](spark, sf_small).first()
    assert r.n_a == len(a) and r.n_b == len(b)
    assert abs(r.t_stat - t_np) < 1e-9
    assert abs(r.df_welch - df_np) < 1e-6


def test_exp_smoothing_matches_python_fold(spark, sf_small):
    """The distributed fold is bit-identical to a plain python loop
    over the same dense daily series (alpha = 1/2 updates are exact
    binary fractions, so equality is ==, not approx)."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    rows = QUERIES["ts_exp_smoothing"](spark, sf_small).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = (r.n_events, r.smoothed)
    assert series and all(len(d) == 30 for d in series.values())
    for days in series.values():
        s = None
        for d in range(30):
            n, got = days[d]
            s = float(n) if s is None else (s + float(n)) / 2.0
            assert got == s, (d, got, s)


def test_hashed_linear_score_python_replica(spark, sf_small):
    """Inference agrees with a hashlib replica of the bucket->weight
    device on a sample of documents, and raw_score is the exact sum
    of per-token weights (bag semantics: duplicates count)."""
    import hashlib

    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    def score(text: str):
        toks = [w for w in text.strip().split() if w]
        raw = 0
        for w in toks:
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 262144
            raw += int(
                hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16
            ) % 2001 - 1000
        return len(toks), raw

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_small, "documents").limit(25).collect()
    }
    got = {
        r.doc_id: (r.n_tokens, r.raw_score, r.keep)
        for r in QUERIES["text_hashed_linear_score"](spark, sf_small)
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    }
    checked = 0
    for doc_id, text in docs.items():
        n, raw = score(text)
        if n == 0:
            assert doc_id not in got
            continue
        assert got[doc_id] == (n, raw, raw > 0), doc_id
        checked += 1
    assert checked > 10


def test_poisson_bootstrap_ci_properties(spark, sf_oracle):
    """The CI brackets the point mean, is a genuine interval, and has
    plausible width (within 8 standard errors, nonzero)."""
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    r = QUERIES["stats_poisson_bootstrap_ci"](spark, sf_oracle).first()
    assert r.n_replicas == 64
    assert r.ci_lo < r.point_mean < r.ci_hi
    e = load(spark, sf_oracle, "events").filter(
        F.col("event_type") == "purchase"
    )
    stats = e.select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.stddev("c").alias("sd")
    ).first()
    se = stats.sd / stats.n**0.5
    assert 0 < r.ci_hi - r.ci_lo < 8 * se


def test_hdr_sketch_error_bound(spark, sf_oracle):
    """Each sketch percentile lands within 1/16 relative error below
    the exact percentile (lower-bound estimates: est <= exact and
    exact < est * 17/16 cannot both fail)."""
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    r = QUERIES["agg_hdr_quantile_sketch"](spark, sf_oracle).first()
    exact = (
        load(spark, sf_oracle, "lineitem")
        .select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"))
        .agg(
            F.expr("percentile(c, 0.5)").alias("p50"),
            F.expr("percentile(c, 0.9)").alias("p90"),
            F.expr("percentile(c, 0.99)").alias("p99"),
        )
        .first()
    )
    for est, ex in [
        (r.p50_est, exact.p50),
        (r.p90_est, exact.p90),
        (r.p99_est, exact.p99),
    ]:
        assert est <= ex * (1 + 1 / 16) and ex <= est * (1 + 1 / 16), (
            est,
            ex,
        )
    assert r.n_buckets < 400


def test_mmr_rerank_matches_python_greedy(spark, sf_small):
    """The full 5-step greedy trajectory equals an independent python
    replica (quantize, integer dots, argmax with id tiebreak)."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_small, "embeddings").collect()
    }
    qz = {
        i: np.sign(v * 256) * np.floor(np.abs(v * 256) + 0.5)
        for i, v in emb.items()
    }
    qz = {i: v.astype(np.int64) for i, v in qz.items()}

    def greedy(qid):
        qsims = {
            i: int(qz[qid] @ v) for i, v in qz.items() if i != qid
        }
        cand = sorted(qsims, key=lambda i: (-qsims[i], i))[:20]
        picks, out = [], []
        for rank in range(1, 6):
            best = None
            for c in cand:
                if c in picks:
                    continue
                red = max(
                    (int(qz[c] @ qz[s]) for s in picks), default=0
                )
                key = (-(qsims[c] - red), c)
                if best is None or key < best[0]:
                    best = (key, c, red)
            _, c, red = best
            picks.append(c)
            out.append((rank, c, qsims[c], red))
        return out

    got = {}
    for r in QUERIES["sim_mmr_rerank"](spark, sf_small).collect():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.vec_id, r.qsim, r.redundancy)
        )
    assert set(got) == {0, 1, 2, 3}
    for qid, rows in got.items():
        assert sorted(rows) == greedy(qid), qid


def test_textrank_word_graph_and_ranks(spark, sf_small):
    """The word graph matches a python adjacency replica and the
    output is a complete 1..20 ranking of distinct words."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").collect()
    edges = set()
    for r in docs:
        t = [w for w in r.text.strip().split() if w]
        for a, b in zip(t, t[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    rows = QUERIES["text_textrank_keywords"](spark, sf_small).collect()
    assert sorted(r.rank for r in rows) == list(range(1, 21))
    assert len({r.node for r in rows}) == 20
    in_graph = {w for e in edges for w in e}
    assert all(r.node in in_graph for r in rows)
    assert all(r.pr > 0 for r in rows)


def test_basket_lift_matches_python(spark, sf_small):
    """Top-20 co-purchase pairs and their lift agree with a
    collections-based replica."""
    from collections import Counter
    from itertools import combinations

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    sup = Counter()
    co = Counter()
    for parts in baskets.values():
        for p in parts:
            sup[p] += 1
        for a, b in combinations(sorted(parts), 2):
            co[(a, b)] += 1
    n_orders = len(baskets)
    want = sorted(co.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(
        QUERIES["olap_basket_lift"](spark, sf_small).collect(),
        key=lambda r: r.rank,
    )
    for r, ((a, b), n_co) in zip(got, want):
        assert (r.p_a, r.p_b, r.n_co) == (a, b, n_co)
        assert r.n_a == sup[a] and r.n_b == sup[b]
        assert (
            r.lift
            == float(n_co) * float(n_orders) / (float(sup[a]) * float(sup[b]))
        )


def test_holt_trend_matches_python_fold(spark, sf_small):
    """Level/trend recursion is bit-identical to a python loop, and
    simple-ES vs Holt agree on day 0 and diverge once a trend exists."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    rows = QUERIES["ts_holt_trend"](spark, sf_small).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r
    assert series and all(len(d) == 30 for d in series.values())
    for days in series.values():
        lv = bt = None
        for d in range(30):
            r = days[d]
            x = float(r.n_events)
            if lv is None:
                lv, bt = x, 0.0
            else:
                ln = (x + lv + bt) / 2.0
                bt = ((ln - lv) + bt) / 2.0
                lv = ln
            assert (r.level, r.trend) == (lv, bt), d
            assert r.forecast_7d == lv + 7.0 * bt


def test_data_contract_single_scan_and_values(spark, sf_small):
    """All six rules ride one aggregate (plan shows a single scan of
    events) and the counters match a python replica."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load
    from tests.test_scale_plans import plan_of

    df = QUERIES["audit_data_contract"](spark, sf_small)
    plan = plan_of(df, mode="simple")
    assert plan.count("Scan parquet") == 1
    rows = {r.rule: r for r in df.collect()}
    ev = load(spark, sf_small, "events").collect()
    assert rows["value_le_100"].n_violations == sum(
        1 for e in ev if e.value > 100
    )
    assert rows["value_nonnegative"].n_violations == 0
    assert rows["event_id_unique"].n_violations == len(ev) - len(
        {e.event_id for e in ev}
    )
    purch = [e for e in ev if e.event_type == "purchase"]
    assert rows["purchase_value_ge_1"].n_checked == len(purch)
    assert rows["purchase_value_ge_1"].n_violations == sum(
        1 for e in purch if e.value < 1
    )


def test_matryoshka_recall_matches_numpy(spark, sf_small):
    """Recall per truncation dim matches a numpy replica of the
    quantized-prefix top-10, and the full-dim row is exactly 1.0."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64) * 256
        for r in load(spark, sf_small, "embeddings").collect()
    }
    qz = {
        i: (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        for i, v in vecs.items()
    }

    def topk(qid, d):
        s = {
            i: int(qz[qid][:d] @ v[:d])
            for i, v in qz.items()
            if i != qid
        }
        return set(sorted(s, key=lambda i: (-s[i], i))[:10])

    want = {}
    for d in (8, 16, 32, 64):
        hits = sum(
            len(topk(q, d) & topk(q, 64)) for q in range(8)
        )
        want[d] = (hits, 80)
    got = {
        r.dim: (r.n_hits, r.n_possible, r.recall_at_10)
        for r in QUERIES["emb_matryoshka_recall"](spark, sf_small).collect()
    }
    assert set(got) == {8, 16, 32, 64}
    for d, (hits, poss) in want.items():
        assert got[d][:2] == (hits, poss), d
        assert got[d][2] == hits / poss
    assert got[64][2] == 1.0


def test_ndcg_matches_numpy(spark, sf_small):
    """NDCG@10 agrees with an independent numpy/python computation of
    the quantized ranking and log2 gains."""
    import math

    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    qz, lab = {}, {}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64) * 256
        qz[r.vec_id] = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
            np.int64
        )
        lab[r.vec_id] = r.label
    got = {
        r.query_id: r
        for r in QUERIES["sim_label_ndcg"](spark, sf_small).collect()
    }
    assert set(got) == set(range(8))
    for qid in range(8):
        s = {i: int(qz[qid] @ v) for i, v in qz.items() if i != qid}
        top = sorted(s, key=lambda i: (-s[i], i))[:10]
        dcg = sum(
            sorted(
                (1.0 if lab[i] == lab[qid] else 0.0) / math.log2(r + 2)
                for r, i in enumerate(top)
            )
        )
        n_rel = sum(
            1 for i in s if lab[i] == lab[qid]
        )
        idcg = sum(
            1 / math.log2(r + 2) for r in range(min(10, n_rel))
        )
        r = got[qid]
        assert r.label == lab[qid] and r.n_rel == n_rel
        assert abs(r.dcg - dcg) < 1e-12
        assert abs(r.ndcg_at_10 - (dcg / idcg if idcg else 0.0)) < 1e-12
        assert 0.0 <= r.ndcg_at_10 <= 1.0


def test_theil_sen_matches_python(spark, sf_small):
    """The median pairwise slope equals a python replica with the
    same (value, num, den) ordering, and it is outlier-robust by
    construction (within the slope range)."""
    from report_worker_spark.plans.catalog import QUERIES

    r = QUERIES["ts_theil_sen_trend"](spark, sf_small).first()
    from pyspark.sql import functions as F

    from report_worker_spark.plans.tables import load

    e = load(spark, sf_small, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = sorted(
        (x.day, x.n)
        for x in e.select(day.alias("day"))
        .filter((F.col("day") >= 0) & (F.col("day") <= 29))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    slopes = []
    for i, (da, na) in enumerate(daily):
        for db, nb in daily[i + 1 :]:
            slopes.append((float(nb - na) / (db - da), nb - na, db - da))
    slopes.sort()
    assert r.n_pairs == len(slopes)
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert (r.slope_num, r.slope_den) == (med[1], med[2])
    assert r.slope_per_day == med[0]


def test_bfs_khop_matches_python_bfs(spark):
    """Frontier-join BFS equals a textbook queue BFS on a hand graph
    with two components and an unreachable tail beyond the budget."""
    from collections import deque

    from report_worker_spark.functions import graph as gr

    raw = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),  # chain
        (2, 8), (8, 9),                                   # branch
        (20, 21), (21, 22),                               # far component
    ]
    edges = gr.undirected_edges(
        spark.createDataFrame(raw, ["src", "dst"])
    )
    seeds = spark.createDataFrame([(1,), (20,)], ["node"])
    got = {
        r.node: r.dist
        for r in gr.bfs_khop(edges, seeds, max_hops=3).collect()
    }
    adj = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, q = {1: 0, 20: 0}, deque([1, 20])
    while q:
        u = q.popleft()
        if want[u] == 3:
            continue
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want
    assert 4 in got and 5 not in got  # budget truncation is real


def test_label_propagation_matches_python_sync(spark):
    """3-round min-label propagation equals a synchronous python
    replay; with rounds >= diameter it equals connected components."""
    from report_worker_spark.functions import graph as gr

    raw = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (5, 6)]
    edges = gr.undirected_edges(
        spark.createDataFrame(raw, ["src", "dst"])
    )
    adj = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {n: n for n in adj}
    for _ in range(3):
        lbl = {
            n: min([lbl[n]] + [lbl[v] for v in adj[n]]) for n in adj
        }
    got = {
        r.node: r.lbl
        for r in gr.label_propagation(edges, rounds=3).collect()
    }
    assert got == lbl
    got_cc = {
        r.node: r.lbl
        for r in gr.label_propagation(edges, rounds=4).collect()
    }
    assert set(got_cc.values()) == {1, 10, 5}  # component minima


def test_mann_whitney_matches_python_ranks(spark, sf_small):
    """U and the tie-corrected z agree with an independent pure-python
    average-rank computation over the same values."""
    import math

    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    e = load(spark, sf_small, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    rows = [
        (r.value, r.event_type == "click")
        for r in e.select("value", "event_type").collect()
    ]
    vals = sorted(v for v, _ in rows)
    # average rank per value, exact via doubled integers
    from collections import Counter

    cnt = Counter(vals)
    cum, rank2 = 0, {}
    for v in sorted(cnt):
        rank2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    n_a = sum(1 for _, ia in rows if ia)
    n_b = len(rows) - n_a
    r2a = sum(rank2[v] for v, ia in rows if ia)
    u2 = r2a - n_a * (n_a + 1)
    tie = sum(t**3 - t for t in cnt.values())
    n = n_a + n_b
    var = (n_a * n_b / 12.0) * ((n + 1) - tie / (n * (n - 1.0)))
    z = (u2 / 2.0 - n_a * n_b / 2.0) / math.sqrt(var)
    r = QUERIES["stats_mann_whitney_u"](spark, sf_small).first()
    assert (r.n_a, r.n_b, r.u_a_x2, r.tie_term) == (n_a, n_b, u2, tie)
    assert abs(r.z_score - z) < 1e-9


def test_canonicalize_url_cases(spark):
    """The column-expression canonicalizer agrees with a pure-python
    reference on crafted edge cases (mixed case, stacked tracking
    params, fragment, trailing slash, http upgrade)."""
    import re

    from report_worker_spark.functions.dedup import canonicalize_url

    def py_canon(u: str) -> str:
        u = re.sub(r"#.*$", "", u)
        m = re.match(r"^[a-zA-Z]+://[^/]+", u)
        u = m.group(0).lower() + u[m.end():]
        u = re.sub(r"[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*", "", u)
        u = re.sub(r"^http://", "https://", u)
        if "&" in u and "?" not in u:
            u = u.replace("&", "?", 1)
        return re.sub(r"/$", "", u)

    urls = [
        "http://WWW.Example.COM/Path/page?id=3&utm_source=a&utm_medium=b#x",
        "https://site.com/a/?id=1&fbclid=abc",
        "https://SITE.com/a?id=1&gclid=z&utm_campaign=c9",
        "http://host.org/UPPER/Case?id=7",
        "https://h.io/p",
        # ADVICE r7: uppercase scheme must still scheme-unify …
        "HTTP://HOST.COM/Path?id=1",
        # … and a stripped LEADING tracking param must not leave the
        # kept params glued to the path with '&'
        "https://site.com/p?utm_source=a&id=1",
        "http://S.io/q?utm_a=1&utm_b=2&id=3&z=4",
        "HTTPS://UP.example.net/x/",
    ]
    assert py_canon("HTTP://H.co/p?utm_a=1&id=2") == "https://h.co/p?id=2"
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r.url: r.canon
        for r in df.select(
            "url", canonicalize_url("url").alias("canon")
        ).collect()
    }
    for u in urls:
        assert got[u] == py_canon(u), (u, got[u], py_canon(u))


def test_url_dedup_groups_are_mod100_classes(spark, sf_small):
    """Canonical identity is (doc_id mod 100) by construction: every
    group's member count matches the residue-class census."""
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    n_docs = load(spark, sf_small, "documents").count()
    rows = QUERIES["dedup_url_canonicalize"](spark, sf_small).collect()
    assert len(rows) == min(100, n_docs)
    assert sum(r.n_variants for r in rows) == n_docs
    for r in rows:
        res = r.canonical_doc % 100
        want = len(range(res, n_docs, 100))
        assert r.n_variants == want


def test_ols_daily_trend_matches_numpy(spark, sf_small):
    """Slope/intercept agree with numpy.polyfit over the same daily
    cents series."""
    import numpy as np
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = (
        li.groupBy(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1997-01-01").cast("date"),
            ).alias("x")
        )
        .agg(F.sum(cents).alias("y"))
        .collect()
    )
    x = np.array([r.x for r in daily], dtype=np.float64)
    y = np.array([r.y for r in daily], dtype=np.float64)
    slope_np, icept_np = np.polyfit(x, y, 1)
    r = QUERIES["stats_ols_daily_trend"](spark, sf_small).first()
    assert r.n_days == len(daily)
    assert abs(r.slope_cents_per_day - slope_np) < 1e-6 * abs(slope_np)
    assert abs(r.intercept_cents - icept_np) < 1e-6 * abs(icept_np)
    # exact rational slope cross-check
    assert abs(r.slope_num / r.slope_den - r.slope_cents_per_day) < 1e-12


def test_freshness_slo_matches_python(spark, sf_small):
    """Per-type staleness equals a python max over the same epochs and
    the watermark type reports zero lag."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    e = load(spark, sf_small, "events").select("event_type", "ts").collect()
    mx = {}
    for r in e:
        s = int(r.ts.timestamp()) if hasattr(r.ts, "timestamp") else int(r.ts)
        mx[r.event_type] = max(mx.get(r.event_type, 0), s)
    gmx = max(mx.values())
    rows = QUERIES["audit_freshness_slo"](spark, sf_small).collect()
    assert {r.event_type for r in rows} == set(mx)
    for r in rows:
        assert r.lag_s == gmx - mx[r.event_type]
        assert r.slo_breach == (r.lag_s > 7200)
    assert min(r.lag_s for r in rows) == 0


def test_kl_source_divergence_matches_python(spark, sf_small):
    """Per-source KL agrees with a collections.Counter replica
    (smallest-first fold, 12-decimal round) and is non-negative."""
    import math
    import re
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    per_src, corpus = {}, Counter()
    for r in docs:
        toks = re.split(r"\s+", r.text.strip())
        per_src.setdefault(r.source, Counter()).update(toks)
        corpus.update(toks)
    tot = sum(corpus.values())
    want = {}
    for s, cnt in per_src.items():
        tot_s = sum(cnt.values())
        terms = sorted(
            (n / tot_s) * math.log((n * tot) / (tot_s * corpus[w]))
            for w, n in cnt.items()
        )
        acc = 0.0
        for t in terms:
            acc += t
        want[s] = (len(cnt), round(acc, 12))
    got = {
        r.source: (r.n_terms, r.kl_nats)
        for r in QUERIES["text_kl_source_divergence"](spark, sf_small).collect()
    }
    assert got == want
    assert all(k >= 0 for _, k in got.values())


def test_attribution_matches_python(spark, sf_small):
    """Last-touch credit assignment equals a python sweep over each
    user's (ts, event_id)-ordered stream."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = (
        load(spark, sf_small, "events")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    want = defaultdict(lambda: [0, 0])
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        touch = None
        for r in rows:
            if r.event_type == "purchase":
                key = touch if touch is not None else "direct"
                want[key][0] += 1
                want[key][1] += round(r.value * 100)
            else:
                touch = r.event_type
    got = {
        r.touch_type: [r.n_conversions, r.attributed_cents]
        for r in QUERIES["olap_attribution_last_touch"](
            spark, sf_small
        ).collect()
    }
    assert got == dict(want)


def test_random_projection_matches_numpy(spark, sf_small):
    """The in-engine md5-parity sign matrix and dim-ordered fold equal
    a hashlib+numpy replica bit-for-bit, and projected norms stay
    within the JL distortion envelope on average."""
    import hashlib

    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_small, "embeddings").limit(50).collect()
    }
    signs = np.array(
        [
            [
                1.0
                if hashlib.md5(f"{d}:{j}".encode()).hexdigest()[0]
                in "02468ace"
                else -1.0
                for d in range(64)
            ]
            for j in range(16)
        ]
    )
    rows = QUERIES["emb_random_projection"](spark, sf_small).collect()
    got = {}
    for r in rows:
        got.setdefault(r.vec_id, {})[r.j] = r.proj
    assert all(len(v) == 16 for v in got.values())
    for vid, v in emb.items():
        for j in range(16):
            # replicate the left-to-right fold exactly
            acc = 0.0
            for d in range(64):
                acc += float(np.float64(np.float32(v[d]))) * signs[j][d]
            assert got[vid][j] == acc, (vid, j)
    # JL norm preservation (scaled by 1/sqrt(16)), averaged over vecs
    ratios = []
    for vid, v in emb.items():
        p = np.array([got[vid][j] for j in range(16)])
        if np.linalg.norm(v) > 0:
            ratios.append((np.linalg.norm(p) / 4.0) / np.linalg.norm(v))
    assert 0.8 < float(np.mean(ratios)) < 1.2


def test_backtest_naive_matches_python(spark, sf_small):
    """Both baseline MAEs equal a python replay over the dense grid."""
    from report_worker_spark.plans.catalog import QUERIES, _daily_grid

    grid = {}
    for r in _daily_grid(spark, sf_small).collect():
        grid.setdefault(r.event_type, {})[r.day] = r.n
    want = {}
    for t, days in grid.items():
        for k, name in [(1, "naive_1"), (7, "seasonal_7")]:
            errs = [
                abs(days[d] - days[d - k]) for d in range(k, 30)
            ]
            want[(t, name)] = (len(errs), sum(errs), sum(errs) / len(errs))
    got = {
        (r.event_type, r.model): (r.n_eval, r.sum_abs_err, r.mae)
        for r in QUERIES["ts_backtest_naive_models"](spark, sf_small).collect()
    }
    assert got == want


def test_assortativity_matches_numpy(spark, sf_small):
    """r equals numpy's corrcoef over the doubled endpoint-degree
    pairs and lies in [-1, 1]."""
    import numpy as np

    from report_worker_spark.functions import graph as gr
    from report_worker_spark.plans.catalog import QUERIES, _cooccur_edges

    e = gr.undirected_edges(_cooccur_edges(spark, sf_small))
    deg = {r.node: r.deg for r in gr.degrees(e).collect()}
    xs, ys = [], []
    for r in e.collect():
        xs += [deg[r.src], deg[r.dst]]
        ys += [deg[r.dst], deg[r.src]]
    want = float(np.corrcoef(np.array(xs), np.array(ys))[0, 1])
    r = QUERIES["graph_degree_assortativity"](spark, sf_small).first()
    assert r.n_edges == e.count()
    assert -1.0 <= r.assortativity <= 1.0
    assert abs(r.assortativity - want) < 1e-9


def test_sax_symbols_quartile_census(spark, sf_small):
    """Every word is 30 chars; per-stream symbol counts follow the
    ntile split (8,8,7,7) and symbols are ordered by value rank."""
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES, _daily_grid

    grid = {}
    for r in _daily_grid(spark, sf_small).collect():
        grid.setdefault(r.event_type, {})[r.day] = r.n
    rows = QUERIES["ts_sax_quartile_symbols"](spark, sf_small).collect()
    assert {r.event_type for r in rows} == set(grid)
    for r in rows:
        assert len(r.sax_word) == 30
        assert Counter(r.sax_word) == Counter(
            {"a": 8, "b": 8, "c": 7, "d": 7}
        )
        assert r.n_peak_days == 7
        # the 'd' days must be the 7 highest-(n, day) days
        days = grid[r.event_type]
        order = sorted(range(30), key=lambda d: (days[d], d))
        want_d = set(order[-7:])
        got_d = {d for d, ch in enumerate(r.sax_word) if ch == "d"}
        assert got_d == want_d


def test_quantile_normalize_equalizes_distributions(spark, sf_small):
    """After the pass, every source's normalized multiset equals the
    pooled quantile picks of a python replica, and each source's
    normalized distribution is (near-)identical across sources."""
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = [
        (r.doc_id, r.source, r.n_chars)
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    ]
    pooled = sorted((c, i) for i, _, c in docs)
    n = len(pooled)
    by_src = {}
    for i, s, c in docs:
        by_src.setdefault(s, []).append((c, i))
    want = {}
    for s, rows in by_src.items():
        rows.sort()
        n_s = len(rows)
        for r_s, (c, i) in enumerate(rows, 1):
            idx = -(-r_s * n // n_s)  # ceil
            want[i] = pooled[idx - 1][0]
    got = {
        r.doc_id: r.norm_chars
        for r in QUERIES["stats_quantile_normalize"](spark, sf_small).collect()
    }
    assert got == want
    # distributions match across sources (same size here ⇒ identical)
    per_src = {}
    for i, s, _ in docs:
        per_src.setdefault(s, Counter())[got[i]] += 1
    ref = next(iter(per_src.values()))
    assert all(d == ref for d in per_src.values())


def test_nearest_centroid_matches_numpy(spark, sf_small):
    """Per-label accuracy equals a numpy nearest-centroid replica on
    the same quantized vectors."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    qv = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 256)
        for r in rows
    }
    lab = {r.vec_id: r.label for r in rows}
    labels = sorted(set(lab.values()))
    cents = {
        l: (
            np.sum([qv[i] for i in qv if lab[i] == l], axis=0),
            sum(1 for i in qv if lab[i] == l),
        )
        for l in labels
    }
    correct = {l: 0 for l in labels}
    for i, v in qv.items():
        best = max(
            labels,
            key=lambda l: (float(v @ cents[l][0]) / cents[l][1], -l),
        )
        if best == lab[i]:
            correct[lab[i]] += 1
    got = {
        r.label: (r.n_vecs, r.n_correct)
        for r in QUERIES["emb_nearest_centroid_accuracy"](
            spark, sf_small
        ).collect()
    }
    n_per = {l: sum(1 for i in qv if lab[i] == l) for l in labels}
    assert got == {l: (n_per[l], correct[l]) for l in labels}
    # the fixture clusters are weak under a raw-dot probe, but the
    # signal must still clear the 10% chance floor by a wide margin
    assert sum(correct.values()) / len(qv) > 0.25


def test_shard_manifest_invariants(spark, sf_small):
    """Shards partition the corpus exactly: doc counts and token
    totals add back to the corpus, shards are dense 0..K, every
    full shard ends within one doc of the 50k boundary, and the
    assignment matches a python replay of the hash order."""
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = [
        (r.doc_id, r.n_chars)
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "n_chars")
        .collect()
    ]
    order = sorted(docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
    cum, want = 0, {}
    for i, w in order:
        want[i] = cum // 50_000
        cum += w
    rows = QUERIES["curation_shard_manifest"](spark, sf_small).collect()
    shards = sorted(r.out_shard for r in rows)
    assert shards == list(range(len(rows)))
    assert sum(r.n_docs for r in rows) == len(docs)
    assert sum(r.n_tokens for r in rows) == sum(w for _, w in docs)
    by_shard = {}
    for i, s in want.items():
        by_shard.setdefault(s, []).append(i)
    got = {r.out_shard: r for r in rows}
    for s, ids in by_shard.items():
        assert got[s].n_docs == len(ids)
        first = min(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        last = max(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        assert (got[s].first_id, got[s].last_id) == (first, last)


def test_spearman_matches_scipy_style_python(spark, sf_small):
    """rho equals an independent tie-averaged-rank Pearson replica."""
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = [
        (
            round(r.l_extendedprice * 100),
            round(r.l_extendedprice * (1 - r.l_discount) * 100),
        )
        for r in load(spark, sf_small, "lineitem")
        .select("l_extendedprice", "l_discount")
        .collect()
    ]

    def avg_ranks(vals):
        cnt = Counter(vals)
        cum, r = 0, {}
        for v in sorted(cnt):
            r[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        return [r[v] for v in vals]

    xs = avg_ranks([q for q, _ in rows])
    ys = avg_ranks([c for _, c in rows])
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = math.sqrt(sum((x - mx) ** 2 for x in xs)) * math.sqrt(
        sum((y - my) ** 2 for y in ys)
    )
    want = num / den
    r = QUERIES["stats_spearman_corr"](spark, sf_small).first()
    assert r.n == n
    assert abs(r.spearman_rho - want) < 1e-9
    assert 0.9 < r.spearman_rho < 1.0  # rank-linked, discount-noised


def test_column_profile_single_scan_and_values(spark, sf_small, sf_oracle):
    """The profile executes ONE scan of orders (no re-read per
    column) and the stats match direct queries."""
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load
    from tests.test_scale_plans import plan_of

    plan = plan_of(QUERIES["audit_column_profile"](spark, sf_oracle), mode="simple")
    assert plan.count("Scan parquet") == 1

    o = load(spark, sf_small, "orders")
    got = {
        r.col: r
        for r in QUERIES["audit_column_profile"](spark, sf_small).collect()
    }
    n = o.count()
    assert all(r.n == n for r in got.values())
    assert got["o_custkey"].n_distinct == o.select("o_custkey").distinct().count()
    assert int(got["o_custkey"].min_repr) == o.agg(F.min("o_custkey")).first()[0]
    assert got["o_orderpriority"].n_distinct == 5


def test_json_malformed_rate_exact_census(spark, sf_small):
    """Exactly the event_id % 7 == 0 rows are flagged (original props
    are valid JSON; truncation always breaks it)."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_id", "event_type"
    ).collect()
    want = {}
    for r in ev:
        a, b = want.get(r.event_type, (0, 0))
        want[r.event_type] = (a + 1, b + (1 if r.event_id % 7 == 0 else 0))
    got = {
        r.event_type: (r.n_msgs, r.n_malformed)
        for r in QUERIES["s3_json_malformed_rate"](spark, sf_small).collect()
    }
    assert got == want
    assert sum(b for _, b in got.values()) > 0


def test_personalized_pagerank_matches_python(spark):
    """PPR on a hand graph equals a python replay with the same
    smallest-first folds; mass concentrates near the seed."""
    from report_worker_spark.functions import graph as gr

    raw = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (10, 11)]
    edges = gr.undirected_edges(spark.createDataFrame(raw, ["src", "dst"]))
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r.node: r.pr
        for r in gr.personalized_pagerank(
            edges, seeds, iterations=3, deterministic=True
        ).collect()
    }
    adj, deg = {}, {}
    for a, b in raw:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {n: len(v) for n, v in adj.items()}
    pr = {n: (1.0 if n == 1 else 0.0) for n in adj}
    for _ in range(3):
        contrib = {}
        for u in adj:
            for v in adj[u]:
                contrib.setdefault(v, []).append(pr[u] / deg[u])
        nxt = {}
        for n in adj:
            s = 0.0
            for c in sorted(contrib.get(n, [])):
                s += c
            nxt[n] = ((1.0 - 0.85) if n == 1 else 0.0) + 0.85 * s
        pr = nxt
    assert got == pr
    assert got[10] == 0.0 and got[11] == 0.0  # disconnected from seed
    assert got[2] > got[5]  # proximity ordering


def test_ip_lpm_prefers_longest_and_matches_python(spark, sf_small):
    """Every match equals a python LPM replay; /16 wins over /8
    whenever both match."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    nations = [
        (r.n_nationkey, r.n_name)
        for r in load(spark, sf_small, "nation").collect()
    ]
    routes = {}
    for k, name in nations:
        routes.setdefault((8, (k * 10) % 256), []).append(name)
        routes.setdefault((16, ((k * 10) % 256) * 256 + k), []).append(
            name + "-metro"
        )
    users = {
        r.user_id
        for r in load(spark, sf_small, "events").select("user_id").collect()
    }
    want = {}
    for u in users:
        ip = (u * 2654435761) % 4294967296
        for plen, shift in [(16, 16), (8, 24)]:
            rs = routes.get((plen, ip >> shift))
            if rs:
                want[u] = (ip, plen, sorted(rs)[0])
                break
    rows = QUERIES["join_ip_prefix_lpm"](spark, sf_small).collect()
    got = {r.user_id: (r.ip32, r.prefix_len, r.route) for r in rows}
    assert got == want
    assert any(p == 16 for _, p, _ in got.values())
    assert any(p == 8 for _, p, _ in got.values())


def test_cramers_v_matches_python(spark, sf_small):
    """V equals an independent contingency-table computation and sits
    in [0, 1]."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = (
        load(spark, sf_small, "events")
        .select("event_type", F.dayofweek("ts").alias("dow"))
        .collect()
    )
    cells = Counter((r.event_type, r.dow) for r in rows)
    rt = Counter(r.event_type for r in rows)
    ct = Counter(r.dow for r in rows)
    n = len(rows)
    chi2 = 0.0
    for t, d in sorted(
        cells,
        key=lambda k: (cells[k] - rt[k[0]] * ct[k[1]] / n) ** 2
        / (rt[k[0]] * ct[k[1]] / n),
    ):
        e = rt[t] * ct[d] / n
        chi2 += (cells[(t, d)] - e) ** 2 / e
    want = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    r = QUERIES["stats_cramers_v"](spark, sf_small).first()
    assert (r.n_rows, r.n_cols, r.n_obs) == (len(rt), len(ct), n)
    assert 0.0 <= r.cramers_v <= 1.0
    assert abs(r.cramers_v - want) < 1e-9


def test_kendall_tau_matches_python(spark, sf_small):
    """τ-b equals a brute-force pair count on the same grid."""
    import math

    from report_worker_spark.plans.catalog import QUERIES, _daily_grid

    grid = {}
    for r in _daily_grid(spark, sf_small).collect():
        grid.setdefault(r.event_type, {})[r.day] = r.n
    want = {}
    for t, days in grid.items():
        c = d = 0
        for i in range(30):
            for j in range(i + 1, 30):
                if days[j] > days[i]:
                    c += 1
                elif days[j] < days[i]:
                    d += 1
        n0 = 30 * 29 // 2
        from collections import Counter

        tn = sum(
            v * (v - 1) // 2 for v in Counter(days.values()).values()
        )
        tau = (c - d) / math.sqrt((n0 - tn) * n0)
        want[t] = (c, d, tn, round(tau, 12))
    got = {
        r.event_type: (
            r.n_concordant, r.n_discordant, r.tie_pairs, r.kendall_tau_b
        )
        for r in QUERIES["stats_kendall_tau_daily"](spark, sf_small).collect()
    }
    assert got == want
    assert all(-1 <= t <= 1 for *_, t in got.values())


def test_temperature_weights_properties(spark, sf_small):
    """Probabilities sum to ~1, equal-sized sources get equal shares,
    and the T=2 rule flattens relative to proportional sampling."""
    from report_worker_spark.plans.catalog import QUERIES

    rows = QUERIES["curation_temperature_weights"](spark, sf_small).collect()
    assert abs(sum(r.sample_prob for r in rows) - 1.0) < 1e-9
    n_total = sum(r.n_docs for r in rows)
    for r in rows:
        prop = r.n_docs / n_total
        # sqrt scaling pulls every share toward the uniform 1/len
        if prop > 1 / len(rows):
            assert r.sample_prob <= prop + 1e-12
        else:
            assert r.sample_prob >= prop - 1e-12
    by_n = {}
    for r in rows:
        by_n.setdefault(r.n_docs, set()).add(r.sample_prob)
    assert all(len(v) == 1 for v in by_n.values())


def test_wav_silence_runs_numpy_reference(spark):
    """Segment statistics equal a pure-python run-length replay,
    including an all-loud clip and a boundary-run clip."""
    import numpy as np

    from report_worker_spark.functions import multimodal as mm

    crafted = np.array(
        [128] * 10 + [250] * 3 + [120] * 7 + [0] * 5 + [130] * 9,
        dtype=np.uint8,
    )
    rows = [
        (1, mm.wav_bytes(100, 16000, 1)),
        (2, mm.encode_wav(bytes([255, 0] * 20), 16000, 1, 8)),
        (3, mm.encode_wav(crafted.tobytes(), 16000, 1, 8)),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r.media_id: (
            r.n_frames, r.quiet_frames, r.n_silence_segments, r.longest_run
        )
        for r in mm.wav_silence_runs(media, threshold=48, min_run=8).collect()
    }

    def replay(samples):
        quiet = [abs(int(s) - 128) < 48 for s in samples]
        runs, cur = [], 0
        for q in quiet:
            if q:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        return (
            len(samples),
            sum(runs),
            sum(1 for r in runs if r >= 8),
            max(runs) if runs else 0,
        )

    sm1 = mm.keystream("1:wav", 100)
    assert got[1] == replay(sm1)
    assert got[2] == replay(bytes([255, 0] * 20))
    assert got[3] == replay(crafted)
    assert got[2][2] == 0  # alternating loud/quiet: no run reaches 8
    assert got[3] == (34, 26, 2, 10)


def test_acf_multi_lag_matches_python(spark, sf_small):
    """Per-lag Pearson on (x, x+L) pairs equals a python replica;
    lag 1 agrees with the single-lag query."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    e = load(spark, sf_small, "events")
    daily = {
        r.d: r.n
        for r in e.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {}
    for lag in range(1, 8):
        pairs = [
            (daily[d], daily[d + lag])
            for d in daily
            if d + lag in daily
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        want[lag] = (
            n,
            (n * sxy - sx * sy)
            / (
                math.sqrt(n * sxx - sx * sx)
                * math.sqrt(n * syy - sy * sy)
            ),
        )
    got = {
        r.lag: (r.n_pairs, r.acf)
        for r in QUERIES["ts_autocorr_multi_lag"](spark, sf_small).collect()
    }
    assert set(got) == set(range(1, 8))
    for lag in got:
        assert got[lag][0] == want[lag][0]
        assert abs(got[lag][1] - want[lag][1]) < 1e-12
    l1 = QUERIES["ts_autocorr_lag1"](spark, sf_small).first()
    assert abs(got[1][1] - l1.autocorr_lag1) < 1e-12


def test_pk_fk_orphans_clean_star(spark, sf_small):
    """The driver star is referentially intact: all three edges report
    zero orphans with the right child counts."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = {
        r.relation: r
        for r in QUERIES["audit_pk_fk_orphans"](spark, sf_small).collect()
    }
    assert set(rows) == {
        "lineitem->orders", "orders->customer", "customer->nation"
    }
    assert rows["lineitem->orders"].n_child == load(
        spark, sf_small, "lineitem"
    ).count()
    for r in rows.values():
        assert r.n_orphans == 0 and r.orphan_rate == 0.0


def test_pk_fk_orphans_detects_breakage(spark, sf_small):
    """The same anti-join device flags orphans when the parent set is
    truncated (simulated partial ingest)."""
    from pyspark.sql import functions as F

    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select("l_orderkey")
    o = load(spark, sf_small, "orders").filter(F.col("o_orderkey") % 2 == 0)
    orphans = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        on="l_orderkey",
        how="left_anti",
    ).count()
    odd = li.filter(F.col("l_orderkey") % 2 == 1).count()
    assert orphans == odd > 0


def test_clustering_global_matches_networkx_free(spark, sf_small):
    """Transitivity equals 3·triangles/wedges from a python adjacency
    replay and lies in [0, 1]."""
    from report_worker_spark.plans.catalog import QUERIES, _cooccur_edges
    from report_worker_spark.functions import graph as gr

    e = gr.undirected_edges(_cooccur_edges(spark, sf_small)).collect()
    adj = {}
    for r in e:
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    tri = sum(
        1
        for a in adj
        for b in adj[a]
        for c in adj[b]
        if a < b < c and c in adj[a]
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    r = QUERIES["graph_clustering_global"](spark, sf_small).first()
    assert (r.n_nodes, r.n_edges) == (len(adj), len(e))
    assert (r.n_triangles, r.n_wedges) == (tri, wedges)
    assert abs(r.transitivity - 3 * tri / wedges) < 1e-12
    assert 0.0 <= r.transitivity <= 1.0


def test_dhash_gradient_invariance_and_replica(spark):
    """dHash equals a numpy replica on keystream PNGs, and a uniform
    brightness shift leaves it unchanged (the property aHash lacks)."""
    import numpy as np

    from report_worker_spark.functions import multimodal as mm

    def replay(pixels, w, h):
        g = (
            np.frombuffer(pixels, dtype=np.uint8)
            .astype(np.int64)
            .reshape(h, w, 3)
            .sum(axis=2)
        )
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(9) * w) // 9
        s = g[np.ix_(ys, xs)]
        bits = (s[:, 1:] > s[:, :-1]).reshape(-1)
        lo = sum(int(bits[p]) << p for p in range(32))
        hi = sum(int(bits[p]) << (p - 32) for p in range(32, 64))
        return hi, lo

    w, h = 20, 14
    px = mm.keystream("7", w * h * 3)
    shifted = bytes(min(255, b + 10) if b < 200 else b for b in px)
    media = spark.createDataFrame(
        [
            (1, mm.encode_png(px, w, h)),
            (2, mm.encode_png(shifted, w, h)),
        ],
        "media_id long, content binary",
    )
    got = {
        r.media_id: (r.dhash_hi, r.dhash_lo)
        for r in mm.png_dhash(media).collect()
    }
    assert got[1] == replay(px, w, h)
    assert got[2] == replay(shifted, w, h)
    # a +c shift on all bytes below saturation preserves strict order
    flat = np.frombuffer(px, dtype=np.uint8)
    if flat.max() < 200:  # no saturation in this keystream block
        assert got[1] == got[2]


def test_anova_matches_numpy(spark, sf_small):
    """F statistic equals numpy's between/within decomposition."""
    import numpy as np

    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    e = load(spark, sf_small, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    ).collect()
    groups = {}
    for r in e:
        groups.setdefault(r.event_type, []).append(r.c)
    arrs = [np.array(v, dtype=np.float64) for v in groups.values()]
    allv = np.concatenate(arrs)
    ssb = sum(len(a) * (a.mean() - allv.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    k, n = len(arrs), len(allv)
    f_np = (ssb / (k - 1)) / (ssw / (n - k))
    r = QUERIES["stats_anova_oneway"](spark, sf_small).first()
    assert (r.n_groups, r.n_obs) == (k, n)
    assert abs(r.ss_between - ssb) < 1e-3 * max(1.0, abs(ssb))
    assert abs(r.ss_within - ssw) < 1e-3 * max(1.0, abs(ssw))
    assert abs(r.f_stat - f_np) < 1e-6 * max(1.0, abs(f_np))


def test_knn_probe_matches_numpy(spark, sf_small):
    """Per-label k-NN accuracy equals a numpy brute-force replica
    with the same tiebreaks."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    qv = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 256)
        for r in rows
    }
    lab = {r.vec_id: r.label for r in rows}
    want_n, want_c = {}, {}
    for q in qv:
        if q % 16 != 0:
            continue
        scored = sorted(
            ((-(qv[q] @ qv[e]), e) for e in qv if e != q),
        )[:5]
        votes = {}
        for _, e in scored:
            votes[lab[e]] = votes.get(lab[e], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        want_n[lab[q]] = want_n.get(lab[q], 0) + 1
        if pred == lab[q]:
            want_c[lab[q]] = want_c.get(lab[q], 0) + 1
    got = {
        r.label: (r.n_queries, r.n_correct)
        for r in QUERIES["emb_knn_label_accuracy"](spark, sf_small).collect()
    }
    assert got == {
        l: (want_n[l], want_c.get(l, 0)) for l in want_n
    }


def test_abc_classification_invariants(spark, sf_small):
    """Classes partition the parts; shares honor the 80/95 integer
    boundaries and A-parts dominate revenue-per-part."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = {r.abc: r for r in
            QUERIES["olap_abc_classification"](spark, sf_small).collect()}
    assert set(rows) == {"A", "B", "C"}
    total_rev = sum(r.revenue_cents for r in rows.values())
    n_parts = (
        load(spark, sf_small, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-9
    # A stops at <=80% cumulative; A+B at <=95%
    assert rows["A"].revenue_cents * 5 <= total_rev * 4
    assert (rows["A"].revenue_cents + rows["B"].revenue_cents) * 20 \
        <= total_rev * 19
    # revenue density strictly decreases A > B > C
    dens = {
        k: rows[k].revenue_cents / rows[k].n_parts for k in rows
    }
    assert dens["A"] > dens["B"] > dens["C"]


def test_fixed_width_roundtrip_all_ok(spark, sf_small):
    """Every event round-trips; frames are 48 hex chars and decode
    to the original fields in python too."""
    from report_worker_spark.plans.catalog import QUERIES

    rows = QUERIES["s4_fixed_width_roundtrip"](spark, sf_small).collect()
    assert rows and all(r.roundtrip_ok for r in rows)
    for r in rows[:20]:
        assert len(r.wire_hex) == 48
        int(r.wire_hex, 16)  # valid hex


def test_wma_matches_python(spark, sf_small):
    """The two-running-sum decomposition equals the direct weighted
    average, including the truncated early-series frames."""
    from report_worker_spark.plans.catalog import QUERIES, _daily_grid

    grid = {}
    for r in _daily_grid(spark, sf_small).collect():
        grid.setdefault(r.event_type, {})[r.day] = r.n
    got = {
        (r.event_type, r.day): (r.wsum, r.wtot, r.wma7)
        for r in QUERIES["ts_weighted_moving_avg"](spark, sf_small).collect()
    }
    for t, days in grid.items():
        for d in range(30):
            lo = max(0, d - 6)
            ws = sum(days[h] * (7 - (d - h)) for h in range(lo, d + 1))
            wt = sum(7 - (d - h) for h in range(lo, d + 1))
            assert got[(t, d)] == (ws, wt, ws / wt)
    assert got and all(v[1] == 28 for (t, d), v in got.items() if d >= 6)


def test_new_vs_returning_matches_python(spark, sf_small):
    """Daily new/returning splits equal a python first-touch replay;
    totals reconcile with distinct DAU."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("user_id", "ts").collect()
    first = {}
    active = defaultdict(set)
    base = None
    for r in ev:
        d = r.ts.date()
        first[r.user_id] = min(first.get(r.user_id, d), d)
        active[d].add(r.user_id)
    import datetime

    epoch = datetime.date(2024, 1, 1)
    want = {
        (d - epoch).days: (
            sum(1 for u in users if first[u] == d),
            sum(1 for u in users if first[u] != d),
        )
        for d, users in active.items()
    }
    got = {
        r.day: (r.new_users, r.returning_users)
        for r in QUERIES["olap_new_vs_returning"](spark, sf_small).collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) == len(first)  # each user new once


def test_class_balance_downsample_exact_keep_set(spark, sf_small):
    """Every label keeps exactly the minority-class count, and the
    kept ids are the md5-order prefix per label."""
    import hashlib
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").select("vec_id", "label").collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r.label].append(r.vec_id)
    target = min(len(v) for v in by_label.values())
    got = {
        r.label: (r.n_kept, r.kept_id_sum)
        for r in QUERIES["curation_class_balance_downsample"](
            spark, sf_small
        ).collect()
    }
    for l, ids in by_label.items():
        keep = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:target]
        assert got[l] == (target, sum(keep))


def test_lorenz_deciles_monotone_and_bounded(spark, sf_small):
    """Shares are monotone, end at 1.0, stay under the diagonal
    (value concentration), and decile populations are balanced."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = sorted(
        QUERIES["olap_lorenz_deciles"](spark, sf_small).collect(),
        key=lambda r: r.decile,
    )
    n = load(spark, sf_small, "orders").count()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_orders for r in rows) == n
    assert max(r.n_orders for r in rows) - min(r.n_orders for r in rows) <= 1
    shares = [r.cum_share for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-12
    # Lorenz curve sits under the equality diagonal strictly inside
    for i, s in enumerate(shares[:-1], 1):
        assert s < i / 10


def test_wilson_ci_matches_python_and_brackets(spark, sf_small):
    """Bounds equal a python replica, bracket p_hat, and stay inside
    [0, 1] (the property the Wald interval lacks)."""
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("event_type", "value").collect()
    agg = {}
    for r in ev:
        n, k = agg.get(r.event_type, (0, 0))
        agg[r.event_type] = (n + 1, k + (1 if r.value > 100 else 0))
    rows = QUERIES["stats_wilson_ci"](spark, sf_small).collect()
    z = 196.0 / 100
    for r in rows:
        n, k = agg[r.event_type]
        p = k / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
        assert (r.n, r.k) == (n, k)
        assert abs(r.wilson_lo - (center - half) / denom) < 1e-9
        assert abs(r.wilson_hi - (center + half) / denom) < 1e-9
        assert 0.0 <= r.wilson_lo < r.p_hat < r.wilson_hi <= 1.0


def test_preferential_attachment_matches_python(spark, sf_small):
    """Top-20 PA pairs equal a brute-force replay over the top-32
    degree nodes, and none of them is an existing edge."""
    from report_worker_spark.functions import graph as gr
    from report_worker_spark.plans.catalog import QUERIES, _cooccur_edges

    e = gr.undirected_edges(_cooccur_edges(spark, sf_small)).collect()
    deg = {}
    adj = set()
    for r in e:
        deg[r.src] = deg.get(r.src, 0) + 1
        deg[r.dst] = deg.get(r.dst, 0) + 1
        adj.add((r.src, r.dst))
    top = sorted(deg, key=lambda n: (-deg[n], n))[:32]
    cand = [
        (deg[a] * deg[b], a, b)
        for i, a in enumerate(top)
        for b in top[i + 1:]
        if (min(a, b), max(a, b)) not in adj
    ]
    cand = [(s, min(a, b), max(a, b)) for s, a, b in cand]
    want = sorted(cand, key=lambda t: (-t[0], t[1], t[2]))[:20]
    got = QUERIES["graph_preferential_attachment"](spark, sf_small).collect()
    assert [(r.pa_score, r.a, r.b) for r in sorted(got, key=lambda r: r.rank)] \
        == want
    assert all((r.a, r.b) not in adj for r in got)


def test_dim_collapse_audit_matches_numpy(spark, sf_small):
    """Per-dim mean/var equal numpy on the same quantized matrix; the
    healthy fixture has no collapsed dims, and an injected constant
    dim IS flagged by the same variance rule."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    m = np.array(
        [
            np.round(np.array(r.embedding, dtype=np.float64) * 256)
            for r in load(spark, sf_small, "embeddings").collect()
        ]
    )
    rows = QUERIES["emb_dim_collapse_audit"](spark, sf_small).collect()
    assert {r.dim for r in rows} == set(range(64))
    for r in rows:
        col = m[:, r.dim]
        assert abs(r.mean_q - col.mean()) < 1e-9
        assert abs(r.var_q - col.var()) < 1e-6
        assert not r.collapsed  # healthy fixtures
    # the rule itself: a constant dim has var 0 < 1 → collapsed
    assert float(np.var(np.full(100, 7.0))) < 1.0


def test_runs_test_matches_python(spark, sf_small):
    """Run count and z equal a python replay of the up/down walk."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("ts").collect()
    daily = defaultdict(int)
    import datetime

    epoch = datetime.date(2024, 1, 1)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            daily[d] += 1
    days = sorted(daily)
    ups = []
    for a, b in zip(days, days[1:]):
        diff = daily[b] - daily[a]
        if diff != 0:
            ups.append(diff > 0)
    r_ = 1 + sum(1 for x, y in zip(ups, ups[1:]) if x != y)
    n1, n2 = sum(ups), len(ups) - sum(ups)
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (float(n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    row = QUERIES["stats_runs_test"](spark, sf_small).first()
    assert (row.n_runs, row.n_up, row.n_down) == (r_, n1, n2)
    assert abs(row.z_score - (r_ - mu) / math.sqrt(var)) < 1e-9


def test_histogram2d_census(spark, sf_small):
    """Cells reconcile with a python census; row shares sum to 1 per
    dow."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = (
        load(spark, sf_small, "events")
        .select(F.dayofweek("ts").alias("dow"), "value")
        .collect()
    )
    want = Counter((r.dow, round(r.value * 100) // 5000) for r in ev)
    rows = QUERIES["stats_histogram2d_dow_value"](spark, sf_small).collect()
    got = {(r.dow, r.vbucket): r.n for r in rows}
    assert got == dict(want)
    per_dow = defaultdict(float)
    for r in rows:
        per_dow[r.dow] += r.row_share
    assert all(abs(v - 1.0) < 1e-9 for v in per_dow.values())


def test_pair_distance_histogram_matches_numpy(spark, sf_small):
    """Bucket counts equal a numpy replay of the md5-bucketed pair
    sample, and total pairs match the bucket-size arithmetic."""
    import hashlib
    from collections import Counter, defaultdict

    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    qv = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 256)
        for r in rows
    }
    buckets = defaultdict(list)
    for i in qv:
        buckets[hashlib.md5(str(i).encode()).hexdigest()[0]].append(i)
    want = Counter()
    n_pairs = 0
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = qv[ids[x]], qv[ids[y]]
                d2 = int(a @ a) + int(b @ b) - 2 * int(a @ b)
                want[d2 // 10000] += 1
                n_pairs += 1
    got = {
        r.dist_bucket: r.n_pairs
        for r in QUERIES["emb_pair_distance_histogram"](
            spark, sf_small
        ).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == n_pairs


def test_bigram_entropy_rate_matches_python(spark, sf_small):
    """H(w2|w1) equals a Counter replica with the same fold and is
    bounded by ln(vocab)."""
    import math
    import re
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("text").collect()
    c12, c1 = Counter(), Counter()
    for r in docs:
        toks = re.split(r"\s+", r.text.strip())
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    n = sum(c12.values())
    terms = sorted(
        (v / n) * math.log(c1[w1] / v) for (w1, _), v in c12.items()
    )
    acc = 0.0
    for t in terms:
        acc += t
    row = QUERIES["text_bigram_entropy_rate"](spark, sf_small).first()
    assert (row.n_bigrams, row.n_tokens) == (len(c12), n)
    assert row.cond_entropy_nats == round(acc, 12)
    assert 0 < row.cond_entropy_nats < math.log(len(c1) + 1)


def test_seasonality_index_averages_to_one(spark, sf_small):
    """Indices average to 1 weighted by month presence and revenue
    reconciles with the filtered fact."""
    from pyspark.sql import functions as F

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = QUERIES["olap_seasonality_index"](spark, sf_small).collect()
    assert {r.mon for r in rows} <= set(range(1, 13))
    tot = sum(r.revenue_cents for r in rows)
    li = load(spark, sf_small, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    want = li.select(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    ).first()[0]
    assert tot == want
    for r in rows:
        assert abs(r.seasonality_index - r.revenue_cents * 12 / tot) < 1e-12


def test_iqr_outlier_census_matches_numpy_ranks(spark, sf_small):
    """Quartiles are the exact rank-⌈n/4⌉/⌈3n/4⌉ order statistics and
    the census equals a python fence replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(round(r.value * 100))
    got = {
        r.event_type: r
        for r in QUERIES["stats_iqr_outlier_census"](spark, sf_small).collect()
    }
    for t, vals in groups.items():
        vals.sort()
        n = len(vals)
        q1 = vals[-(-n // 4) - 1]
        q3 = vals[-(-(3 * n) // 4) - 1]
        iqr = q3 - q1
        outs = sum(
            1
            for c in vals
            if 2 * c > 2 * q3 + 3 * iqr or 2 * c < 2 * q1 - 3 * iqr
        )
        r = got[t]
        assert (r.n, r.q1_cents, r.q3_cents, r.n_outliers) == (
            n, q1, q3, outs
        )


def test_langid_confusion_census(spark, sf_small):
    """Cells reconcile with the row-level langid output; row shares
    sum to 1 per declared language."""
    from collections import Counter, defaultdict

    from report_worker_spark.functions import text as tx
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    d = load(spark, sf_small, "documents")
    pred = tx.lang_id(d).select("lang", "lang_pred").collect()
    want = Counter((r.lang, r.lang_pred) for r in pred)
    rows = QUERIES["audit_langid_confusion"](spark, sf_small).collect()
    got = {(r.lang, r.lang_pred): r.n_docs for r in rows}
    assert got == dict(want)
    shares = defaultdict(float)
    for r in rows:
        shares[r.lang] += r.row_share
    assert all(abs(v - 1.0) < 1e-9 for v in shares.values())


def test_reactivated_users_matches_python(spark, sf_small):
    """Daily reactivation counts equal a python gap replay, and
    first-ever active days never count as reactivation."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("user_id", "ts").collect()
    days = defaultdict(set)
    for r in ev:
        days[r.user_id].add((r.ts.date() - epoch).days)
    want = defaultdict(lambda: [0, 0])
    for u, ds in days.items():
        prev = None
        for d in sorted(ds):
            want[d][0] += 1
            if prev is not None and d - prev > 7:
                want[d][1] += 1
            prev = d
    got = {
        r.day: [r.active_users, r.reactivated_users]
        for r in QUERIES["olap_reactivated_users"](spark, sf_small).collect()
    }
    assert got == dict(want)


def test_hits_matches_python_power_iteration(spark, sf_small):
    """Integer HITS equals a python adjacency replay of two
    unnormalized rounds, and hub/auth are exact path counts."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = (
        load(spark, sf_small, "orders")
        .filter("o_orderdate >= timestamp'1997-01-01'")
        .filter("o_orderdate < timestamp'1998-01-01'")
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    cust = {r.o_orderkey: r.o_custkey for r in o}
    edges = {
        (cust[r.l_orderkey], r.l_suppkey)
        for r in li
        if r.l_orderkey in cust
    }
    h = defaultdict(int, {s: 1 for s, _ in edges})
    a = defaultdict(int)
    for _ in range(2):
        a = defaultdict(int)
        for s, d in edges:
            a[d] += h[s]
        h = defaultdict(int)
        for s, d in edges:
            h[s] += a[d]
    got = {
        r.node: (r.hub, r.auth)
        for r in QUERIES["graph_hits_scores"](spark, sf_small).collect()
    }
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == (h.get(n, 0), a.get(n, 0))


def test_kaplan_meier_matches_python(spark, sf_small):
    """Conversion survival equals a python KM replay; S is monotone
    non-increasing from 1 and at-risk counts telescope."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    t0, tp = {}, {}
    for r in ev:
        import datetime

        epoch = datetime.datetime(2024, 1, 1)
        mu = (r.ts - epoch) // datetime.timedelta(seconds=1)
        t0[r.user_id] = min(t0.get(r.user_id, mu), mu)
        if r.event_type == "purchase":
            tp[r.user_id] = min(tp.get(r.user_id, mu), mu)
    per_t = defaultdict(lambda: [0, 0])
    for u in t0:
        h = (tp[u] - t0[u]) // 3600 if u in tp else None
        if h is not None and h <= 72:
            per_t[h][0] += 1
        else:
            per_t[72][1] += 1
    rows = QUERIES["olap_survival_kaplan_meier"](spark, sf_small).collect()
    rows.sort(key=lambda r: r.t)
    assert {r.t for r in rows} == set(per_t)
    n_rem = sum(d + c for d, c in per_t.values())
    s, prev_s = 1.0, 1.0
    for r in rows:
        d, c = per_t[r.t]
        assert (r.converted, r.censored, r.n_at_risk) == (d, c, n_rem)
        s *= 1.0 - d / n_rem
        assert abs(r.survival - s) < 1e-9
        assert r.survival <= prev_s + 1e-12
        prev_s = r.survival
        n_rem -= d + c
    assert n_rem == 0


def test_kruskal_wallis_matches_python_ranks(spark, sf_small):
    """H equals a python average-rank replay (tie-corrected too)."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "value"
    ).collect()
    allv = sorted(r.value for r in ev)
    # average rank per distinct value (1-based)
    first = {}
    for i, v in enumerate(allv):
        first.setdefault(v, i + 1)
    cnt = Counter(allv)
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    rsum, ng = defaultdict(float), Counter()
    for r in ev:
        rsum[r.event_type] += avg_rank[r.value]
        ng[r.event_type] += 1
    n = len(allv)
    h = 12.0 / (n * (n + 1)) * sum(
        rs * rs / ng[g] for g, rs in rsum.items()
    ) - 3.0 * (n + 1)
    tie = sum(t**3 - t for t in cnt.values())
    hc = h / (1.0 - tie / (n**3 - n))
    rows = QUERIES["stats_kruskal_wallis"](spark, sf_small).collect()
    assert {r.event_type for r in rows} == set(ng)
    for r in rows:
        assert r.n_g == ng[r.event_type]
        assert abs(r.rank_sum_x2 - 2 * rsum[r.event_type]) < 1e-6
        assert abs(r.h_stat - h) < 1e-8
        assert abs(r.h_tie_corrected - hc) < 1e-8


def test_binary_hamming_topk_matches_python(spark, sf_small):
    """Sign codes and top-5 Hamming neighbors equal a python replay."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    code = {
        r.vec_id: sum(1 << i for i, x in enumerate(r.embedding) if x > 0)
        for r in emb
    }
    want = {}
    for q in [v for v in code if v % 25 == 0]:
        cand = sorted(
            (bin(code[q] ^ code[c]).count("1"), c)
            for c in code
            if c != q
        )[:5]
        want[q] = [(c, h, i + 1) for i, (h, c) in enumerate(cand)]
    rows = QUERIES["emb_binary_hamming_topk"](spark, sf_small).collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.hamming, r.rank)
        )
    for q in got:
        got[q].sort(key=lambda t: t[2])
    assert got == want


def test_pmi_cooccurrence_matches_python(spark, sf_small):
    """PMI pairs equal a Counter replay over top-100-df vocab."""
    import math
    from collections import Counter
    from itertools import combinations

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select(
        "doc_id", "text"
    ).collect()
    docsets = {r.doc_id: set(r.text.strip().split()) for r in docs}
    df = Counter(w for s in docsets.values() for w in s)
    vocab = set(
        w
        for w, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    c12 = Counter()
    for s in docsets.values():
        for w1, w2 in combinations(sorted(s & vocab), 2):
            c12[(w1, w2)] += 1
    n = len(docsets)
    want = {
        p: (c, df[p[0]], df[p[1]], round(math.log(c * n / (df[p[0]] * df[p[1]])), 12))
        for p, c in c12.items()
        if c >= 5
    }
    rows = QUERIES["text_pmi_cooccurrence"](spark, sf_small).collect()
    got = {(r.w1, r.w2): (r.c12, r.df1, r.df2, r.pmi) for r in rows}
    assert set(got) == set(want)
    for p in want:
        assert got[p][:3] == want[p][:3]
        assert abs(got[p][3] - want[p][3]) < 1e-9


def test_bollinger_bands_matches_python(spark, sf_small):
    """Bands and integer breakout flags equal an exact-cents replay."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "value").collect()
    daily = defaultdict(int)
    for r in ev:
        # mirror round-half-even of F.round on *.5 cents
        daily[(r.ts.date() - epoch).days] += round(r.value * 100)
    days = sorted(daily)
    rows = {
        r.day: r
        for r in QUERIES["ts_bollinger_bands"](spark, sf_small).collect()
    }
    assert set(rows) == set(days[6:])
    for idx in range(6, len(days)):
        win = [daily[d] for d in days[idx - 6 : idx + 1]]
        x, s, ss = daily[days[idx]], sum(win), sum(v * v for v in win)
        r = rows[days[idx]]
        assert r.cents == x
        sigma = math.sqrt((7 * ss - s * s) / 49)
        assert abs(r.mid - s / 7) < 1e-6
        assert abs(r.upper - (s / 7 + 2 * sigma)) < 1e-6
        assert abs(r.lower - (s / 7 - 2 * sigma)) < 1e-6
        above = 7 * x - s > 0 and (7 * x - s) ** 2 > 4 * (7 * ss - s * s)
        below = 7 * x - s < 0 and (7 * x - s) ** 2 > 4 * (7 * ss - s * s)
        assert (r.breakout_above, r.breakout_below) == (
            int(above),
            int(below),
        )


def test_dtw_matches_python_dp(spark, sf_small):
    """Arrow-kernel DTW equals a pure-python DP over the same dense
    grids, and self-DTW lower-bounds hold (dtw >= |sum_a - sum_b|)."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    grids = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grids[r.event_type][d] += 1

    def dtw(a, b):
        big = float("inf")
        dp = [[big] * len(b) for _ in a]
        for i in range(len(a)):
            for j in range(len(b)):
                c = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    dp[i][j] = c
                else:
                    best = min(
                        dp[i - 1][j] if i else big,
                        dp[i][j - 1] if j else big,
                        dp[i - 1][j - 1] if i and j else big,
                    )
                    dp[i][j] = c + best
        return dp[-1][-1]

    rows = QUERIES["ts_dtw_pairs"](spark, sf_small).collect()
    types = sorted(grids)
    assert {(r.type_a, r.type_b) for r in rows} == {
        (a, b) for a in types for b in types if a < b
    }
    for r in rows:
        want = dtw(grids[r.type_a], grids[r.type_b])
        assert r.dtw == want
        assert r.dtw >= abs(sum(grids[r.type_a]) - sum(grids[r.type_b]))


def test_jarque_bera_matches_numpy(spark, sf_small):
    """JB, skewness, kurtosis equal a numpy replay on integer units."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "value"
    ).collect()
    import math

    groups = {}
    for r in ev:
        # HALF_UP like F.round / DuckDB round, not numpy's half-even
        groups.setdefault(r.event_type, []).append(
            int(math.floor(r.value + 0.5))
        )
    rows = {r.event_type: r for r in
            QUERIES["stats_jarque_bera"](spark, sf_small).collect()}
    assert set(rows) == set(groups)
    for g, vals in groups.items():
        x = np.asarray(vals, dtype=np.float64)
        n = len(x)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        skew, kurt = m3 / m2**1.5, m4 / m2**2
        jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
        r = rows[g]
        assert r.n == n
        assert abs(r.skewness - skew) < 1e-7
        assert abs(r.kurtosis - kurt) < 1e-7
        assert abs(r.jb_stat - jb) < 1e-5


def test_butterfly_support_matches_python(spark, sf_small):
    """Top-20 supplier pairs and the global butterfly count equal an
    itertools replay of the bipartite wedge census."""
    from collections import Counter
    from itertools import combinations

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = (
        load(spark, sf_small, "orders")
        .filter("o_orderdate >= timestamp'1997-01-01'")
        .filter("o_orderdate < timestamp'1998-01-01'")
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    cust = {r.o_orderkey: r.o_custkey for r in o}
    adj = {}
    for r in li:
        if r.l_orderkey in cust:
            adj.setdefault(cust[r.l_orderkey], set()).add(r.l_suppkey)
    sup = Counter()
    for ss in adj.values():
        for s1, s2 in combinations(sorted(ss), 2):
            sup[(s1, s2)] += 1
    butterflies = sum(c * (c - 1) // 2 for c in sup.values())
    want = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = sorted(
        QUERIES["graph_butterfly_support"](spark, sf_small).collect(),
        key=lambda r: r.rank,
    )
    assert [( (r.s1, r.s2), r.support) for r in rows] == want
    assert all(r.butterflies == butterflies for r in rows)


def test_permutation_test_matches_python(spark, sf_small):
    """Replica diffs, extreme flags, and p equal an md5 replay."""
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").filter(
        "event_type IN ('click', 'view')"
    ).select("event_id", "event_type", "value").collect()
    import math

    rows_in = [
        (r.event_id, int(math.floor(r.value * 100 + 0.5)),
         r.event_type == "click")
        for r in ev
    ]
    sa = sum(c for _, c, a in rows_in if a)
    sb = sum(c for _, c, a in rows_in if not a)
    na = sum(1 for *_, a in rows_in if a)
    nb = len(rows_in) - na
    obs = sa / na - sb / nb
    want = {}
    extremes = 0
    for k in range(1, 65):
        sra = nra = 0
        for eid, c, _ in rows_in:
            h = hashlib.md5(f"{eid}:{k}".encode()).hexdigest()[0]
            if h in "01234567":
                sra += c
                nra += 1
        dk = sra / nra - (sa + sb - sra) / (len(rows_in) - nra)
        ext = int(abs(dk) >= abs(obs))
        extremes += ext
        want[k] = (nra, round(dk, 6), ext)
    p = round((1 + extremes) / 65.0, 12)
    rows = QUERIES["stats_permutation_test"](spark, sf_small).collect()
    assert len(rows) == 64
    for r in rows:
        nra, dk, ext = want[r.k]
        assert r.n_a_k == nra
        assert abs(r.diff_k - dk) < 1e-6
        assert r.extreme == ext
        assert abs(r.obs_diff - round(obs, 6)) < 1e-6
        assert abs(r.p_value - p) < 1e-12


def test_knn_outlier_census_matches_numpy(spark, sf_small):
    """Top-30 isolation ranking equals a numpy exact replay on the
    quantized grid."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    import hashlib

    ids = np.array([r.vec_id for r in emb])
    qv = np.array(
        [[round(float(x) * 256) for x in r.embedding] for r in emb],
        dtype=np.int64,
    )
    sample_ids = set(
        i
        for _, i in sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), int(i)) for i in ids
        )[:200]
    )
    want = []
    for qi in np.where([int(i) in sample_ids for i in ids])[0]:
        d2 = ((qv - qv[qi]) ** 2).sum(axis=1)
        order = sorted(
            (int(d2[j]), int(ids[j]))
            for j in range(len(ids))
            if j != qi
        )[:5]
        want.append((int(ids[qi]), sum(d for d, _ in order)))
    want.sort(key=lambda t: (-t[1], t[0]))
    want = want[:30]
    rows = sorted(
        QUERIES["emb_knn_outlier_census"](spark, sf_small).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.vec_id, r.sum_d2_top5) for r in rows] == want


def test_peak_detection_matches_python(spark, sf_small):
    """Peaks equal a python shoulder scan of the dense grids."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    grids = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grids[r.event_type][d] += 1
    want = set()
    for t, g in grids.items():
        for d in range(3, 27):
            sh = max(g[d - 3 : d] + g[d + 1 : d + 4])
            if g[d] > sh:
                want.add((t, d, g[d], sh, g[d] - sh))
    got = {
        (r.event_type, r.day, r.n, r.shoulder_max, r.rise)
        for r in QUERIES["ts_peak_detection"](spark, sf_small).collect()
    }
    assert got == want


def test_levene_brownforsythe_matches_python(spark, sf_small):
    """Medians, mean |dev|, and F equal a python replay of the
    Brown-Forsythe recipe (median-centered Levene)."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "value"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(int(math.floor(r.value * 100 + 0.5)))
    meds, zs = {}, defaultdict(list)
    for g, vals in groups.items():
        sv = sorted(vals)
        meds[g] = sv[(len(sv) + 1) // 2 - 1]
        zs[g] = [abs(v - meds[g]) for v in vals]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    zbar = sum(sum(v) for v in zs.values()) / n
    num = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in zs.values())
    den = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in zs.values()
    )
    f = (num / (k - 1)) / (den / (n - k))
    rows = {r.event_type: r for r in
            QUERIES["stats_levene_brownforsythe"](spark, sf_small).collect()}
    assert set(rows) == set(groups)
    for g, r in rows.items():
        assert r.n_g == len(groups[g])
        assert r.median_cents == meds[g]
        assert abs(r.mean_absdev_cents - sum(zs[g]) / len(zs[g])) < 1e-6
        assert abs(r.f_stat - f) < 1e-8


def test_wow_growth_contributions_sum_to_topline(spark, sf_small):
    """Per-type contributions add up to the total WoW percentage, and
    WoW percentages match a python cents replay."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select(
        "ts", "event_type", "value"
    ).collect()
    weekly = defaultdict(int)
    for r in ev:
        w = (r.ts.date() - epoch).days // 7
        weekly[(r.event_type, w)] += int(math.floor(r.value * 100 + 0.5))
    rows = QUERIES["olap_wow_growth_decomposition"](
        spark, sf_small
    ).collect()
    by_week = defaultdict(list)
    for r in rows:
        assert r.cents == weekly[(r.event_type, r.week)]
        assert r.prev_cents == weekly[(r.event_type, r.week - 1)]
        want = (r.cents - r.prev_cents) * 100.0 / r.prev_cents
        assert abs(r.wow_pct - round(want, 6)) < 1e-9
        by_week[r.week].append(r)
    for w, rs in by_week.items():
        prev_total = sum(r.prev_cents for r in rs)
        cur_total = sum(r.cents for r in rs)
        topline = (cur_total - prev_total) * 100.0 / prev_total
        assert abs(sum(r.contribution_pct for r in rs) - topline) < 1e-4


def test_image_entropy_matches_python(spark, sf_small):
    """Entropy equals a Counter replay over the decoded R channel,
    and is bounded by ln(distinct_values)."""
    import math
    from collections import Counter

    import numpy as np

    from report_worker_spark.functions import multimodal as mm
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("doc_id").limit(40)
    media = mm.synthetic_image_media(docs, "doc_id").collect()
    want = {}
    for r in media:
        content = bytes(r.content)
        if content[:8] != mm.PNG_SIG:
            continue
        d = mm.decode_png_pixels(content)
        px = np.frombuffer(d["pixels"], dtype=np.uint8)[:: d["channels"]]
        c = Counter(px.tolist())
        n = len(px)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        want[r.media_id] = (n, len(c), h)
    rows = QUERIES["multimodal_image_entropy"](spark, sf_small).collect()
    got = {r.media_id: r for r in rows}
    assert set(want).issubset(set(got))
    for mid, (n, dv, h) in want.items():
        r = got[mid]
        assert (r.n_pixels, r.distinct_values) == (n, dv)
        assert abs(r.entropy - h) < 1e-9
        assert r.entropy <= math.log(max(dv, 1)) + 1e-9


def test_harmonic_closeness_matches_python_bfs(spark, sf_small):
    """Per-seed truncated harmonic centrality equals a python BFS."""
    from collections import defaultdict, deque

    from report_worker_spark.plans.catalog import QUERIES, _cooccur_edges

    e = _cooccur_edges(spark, sf_small).collect()
    adj = defaultdict(set)
    for r in e:
        adj[r.src].add(r.dst)
        adj[r.dst].add(r.src)
    deg = {n: len(v) for n, v in adj.items()}
    # undirected deg from the doubled edge list = len(neighbors)
    seeds = sorted(deg, key=lambda n: (-deg[n], n))[:8]
    rows = {r.node: r for r in
            QUERIES["graph_closeness_topk"](spark, sf_small).collect()}
    assert set(rows) == set(seeds)
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == 4:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        h = sum(1.0 / d for d in dist.values() if d > 0)
        r = rows[s]
        assert r.reached == len(dist) - 1
        assert abs(r.harmonic - h) < 1e-9


def test_trimmed_mean_matches_python_sort(spark, sf_small):
    """Exact 10% trim equals sorting and slicing in python."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "value"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(int(math.floor(r.value * 100 + 0.5)))
    rows = {r.event_type: r for r in
            QUERIES["stats_trimmed_mean"](spark, sf_small).collect()}
    assert set(rows) == set(groups)
    for g, vals in groups.items():
        sv = sorted(vals)
        k = len(sv) // 10
        mid = sv[k : len(sv) - k]
        r = rows[g]
        assert (r.n, r.k_trimmed) == (len(sv), k)
        assert r.trimmed_sum_cents == sum(mid)
        assert abs(r.trimmed_mean_cents - sum(mid) / len(mid)) < 1e-6


def test_scd2_pointintime_resolution(spark, sf_small):
    """Every purchase lands in exactly one version; pre-flip error
    users split their revenue at Jan 15; totals reconcile."""
    import datetime
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    eff = datetime.datetime(2024, 1, 15)
    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in load(spark, sf_small, "customer").select(
            "c_custkey", "c_mktsegment"
        ).collect()
    }
    flagged = {
        r.user_id
        for r in ev
        if r.event_type == "error" and r.ts < eff and r.user_id in cust
    }
    want = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.event_type != "purchase" or r.user_id not in cust:
            continue
        seg = (
            "FLAGGED"
            if r.user_id in flagged and r.ts >= eff
            else cust[r.user_id]
        )
        week = (r.ts.date() - epoch).days // 7
        cell = want[(seg, week)]
        cell[0] += 1
        cell[1] += int(math.floor(r.value * 100 + 0.5))
    got = {
        (r.seg, r.week): [r.purchases, r.cents]
        for r in QUERIES["join_scd2_pointintime"](spark, sf_small).collect()
    }
    assert got == dict(want)


def test_binary_segmentation_matches_python(spark, sf_small):
    """Best split day and variance reduction equal an exhaustive
    python scan of all 29 candidate splits."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select(
        "ts", "event_type", "value"
    ).collect()
    grids = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grids[r.event_type][d] += int(math.floor(r.value * 100 + 0.5))

    def sse(xs):
        n = len(xs)
        return sum(x * x for x in xs) - sum(xs) ** 2 / n

    rows = {r.event_type: r for r in
            QUERIES["ts_binary_segmentation"](spark, sf_small).collect()}
    assert set(rows) == set(grids)
    for t, g in grids.items():
        best = min(
            (sse(g[:s]) + sse(g[s:]), s) for s in range(1, 30)
        )
        r = rows[t]
        assert r.best_split_day == best[1]
        s = best[1]
        assert abs(r.left_mean_cents - sum(g[:s]) / s) < 1e-4
        assert abs(r.right_mean_cents - sum(g[s:]) / (30 - s)) < 1e-4
        want_red = (1 - best[0] / sse(g)) * 100
        assert abs(r.var_reduction_pct - want_red) < 1e-6


def test_burrows_delta_matches_python(spark, sf_small):
    """Delta distances equal a python z-score replay; delta is a
    symmetric premetric (>= 0, zero only for identical profiles)."""
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select(
        "source", "text"
    ).collect()
    cnt = defaultdict(Counter)
    for r in docs:
        cnt[r.source].update(r.text.strip().split())
    total = Counter()
    for c in cnt.values():
        total.update(c)
    top = [w for w, _ in
           sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]
    sources = sorted(cnt)
    f = {
        (s, w): 1000.0 * cnt[s][w] / sum(cnt[s].values())
        for s in sources
        for w in top
    }
    z = {}
    for w in top:
        vals = [f[(s, w)] for s in sources]
        mu = sum(vals) / len(vals)
        sig = math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
        for s in sources:
            z[(s, w)] = (f[(s, w)] - mu) / sig
    rows = QUERIES["text_burrows_delta"](spark, sf_small).collect()
    assert len(rows) == len(sources) * (len(sources) - 1) // 2
    for r in rows:
        want = sum(
            abs(z[(r.source_a, w)] - z[(r.source_b, w)]) for w in top
        ) / 30
        assert abs(r.delta - want) < 1e-7
        assert r.delta > 0


def test_hard_negative_mining_matches_numpy(spark, sf_small):
    """Top-5 different-label dot products equal a numpy replay, and
    no neighbor shares the anchor's label."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    labels = {r.vec_id: r.label for r in emb}
    qv = np.array(
        [[round(float(x) * 256) for x in r.embedding] for r in emb],
        dtype=np.int64,
    )
    want = {}
    for qi in np.where(ids % 25 == 0)[0]:
        dots = qv @ qv[qi]
        cand = sorted(
            (-int(dots[j]), int(ids[j]))
            for j in range(len(ids))
            if labels[int(ids[j])] != labels[int(ids[qi])]
        )[:5]
        want[int(ids[qi])] = [
            (c, -d, i + 1) for i, (d, c) in enumerate(cand)
        ]
    got = {}
    for r in QUERIES["emb_hard_negative_mining"](spark, sf_small).collect():
        got.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.dot, r.rank)
        )
        assert labels[r.neighbor_id] != labels[r.query_id]
    for q in got:
        got[q].sort(key=lambda t: t[2])
    assert got == want


def test_ks_uniformity_matches_python(spark, sf_small):
    """D+/D- equal a sorted-ECDF python replay with ties."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "ts", "event_type"
    ).collect()
    secs = defaultdict(list)
    for r in ev:
        t = r.ts
        secs[r.event_type].append(
            t.hour * 3600 + t.minute * 60 + t.second
        )
    rows = {r.event_type: r for r in
            QUERIES["stats_ks_uniformity"](spark, sf_small).collect()}
    assert set(rows) == set(secs)
    for g, vals in secs.items():
        n = len(vals)
        cnt = Counter(vals)
        cum = 0
        dplus = dminus = -1.0
        for v in sorted(cnt):
            prev = cum
            cum += cnt[v]
            dplus = max(dplus, cum / n - v / 86400)
            dminus = max(dminus, v / 86400 - prev / n)
        r = rows[g]
        assert r.n == n
        assert abs(r.d_plus - dplus) < 1e-9
        assert abs(r.d_minus - dminus) < 1e-9
        assert abs(r.sqrt_n_d - n**0.5 * max(dplus, dminus)) < 1e-8


def test_seasonal_strength_matches_python(spark, sf_small):
    """F_trend / F_seasonal equal a python classical decomposition,
    and both strengths live in [0, 1]."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r.ts.date() - epoch).days] += 1
    days = sorted(daily)
    c = [daily[d] for d in days]
    trend = {}
    for i, d in enumerate(days):
        if 3 <= i <= len(days) - 4:
            trend[d] = sum(c[i - 3 : i + 4]) / 7
    detr = {d: daily[d] - trend[d] for d in trend}
    sdow = defaultdict(list)
    for d in detr:
        sdow[d % 7].append(detr[d])
    s = {k: sum(v) / len(v) for k, v in sdow.items()}
    r = [detr[d] - s[d % 7] for d in sorted(detr)]
    tpr = [trend[d] + detr[d] - s[d % 7] for d in sorted(detr)]
    spr = [s[d % 7] + detr[d] - s[d % 7] for d in sorted(detr)]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum(x * x for x in xs) / len(xs) - m * m

    ft = max(0.0, 1 - var(r) / var(tpr))
    fs = max(0.0, 1 - var(r) / var(spr))
    rows = QUERIES["ts_seasonal_strength"](spark, sf_small).collect()
    assert len(rows) == 7
    for row in rows:
        assert abs(row.s_dow - s[row.dow]) < 1e-6
        assert abs(row.f_trend - ft) < 1e-8
        assert abs(row.f_seasonal - fs) < 1e-8
        assert 0.0 <= row.f_trend <= 1.0
        assert 0.0 <= row.f_seasonal <= 1.0


def test_mde_power_matches_python(spark, sf_small):
    """MDE table equals the (z_a + z_b) sigma sqrt(2/m) formula."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "value"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(int(math.floor(r.value * 100 + 0.5)))
    rows = {r.event_type: r for r in
            QUERIES["stats_mde_power"](spark, sf_small).collect()}
    for g, vals in groups.items():
        n = len(vals)
        mean = sum(vals) / n
        sig = math.sqrt(sum(v * v for v in vals) / n - mean * mean)
        mde = 2.8016 * sig * math.sqrt(2 / (n // 2))
        r = rows[g]
        assert r.n == n
        assert abs(r.mean_cents - mean) < 1e-6
        assert abs(r.sigma_cents - sig) < 1e-5
        assert abs(r.mde_cents - mde) < 1e-5
        assert abs(r.mde_rel_pct - mde / mean * 100) < 1e-5


def test_kcenter_matches_python_greedy(spark, sf_small):
    """Selection order, picks, and radii equal a numpy farthest-first
    replay; picked distances are non-increasing (k-center property)."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    qv = np.array(
        [[round(float(x) * 256) for x in r.embedding] for r in emb],
        dtype=np.int64,
    )
    first = int(np.argmin(ids))
    chosen = [first]
    d = ((qv - qv[first]) ** 2).sum(axis=1)
    want = [(1, int(ids[first]), 0)]
    for step in range(2, 9):
        # argmax with min-id tie-break
        best = max(zip(d, -ids), key=lambda t: (t[0], t[1]))
        idx = int(np.where((ids == -best[1]) & (d == best[0]))[0][0])
        want.append((step, int(ids[idx]), int(d[idx])))
        d = np.minimum(d, ((qv - qv[idx]) ** 2).sum(axis=1))
    rows = sorted(
        QUERIES["curation_coreset_kcenter"](spark, sf_small).collect(),
        key=lambda r: r.sel_order,
    )
    got = [(r.sel_order, r.vec_id, r.d2_when_picked) for r in rows]
    assert got == want
    picked = [r.d2_when_picked for r in rows[1:]]
    assert picked == sorted(picked, reverse=True)


def test_overdispersion_matches_python(spark, sf_small):
    """Dispersion index equals var/mean of the daily count series."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import datetime

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            daily[r.event_type][d] += 1
    rows = {r.event_type: r for r in
            QUERIES["ts_overdispersion_index"](spark, sf_small).collect()}
    assert set(rows) == set(daily)
    for t, byday in daily.items():
        c = list(byday.values())
        n = len(c)
        m = sum(c) / n
        v = sum(x * x for x in c) / n - m * m
        r = rows[t]
        assert (r.n_days, r.total) == (n, sum(c))
        assert abs(r.dispersion_index - v / m) < 1e-9
        assert abs(r.chi2_stat - (n - 1) * v / m) < 1e-6


def test_word_burstiness_matches_python(spark, sf_small):
    """Fano factors and peaks equal a Counter replay on the
    doc_id%30 buckets (absent cells count as zeros)."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select(
        "doc_id", "text"
    ).collect()
    cnt = defaultdict(Counter)
    total = Counter()
    for r in docs:
        for w in r.text.strip().split():
            cnt[w][r.doc_id % 30] += 1
            total[w] += 1
    top = [w for w, _ in
           sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:20]]
    rows = {r.w: r for r in
            QUERIES["text_word_burstiness"](spark, sf_small).collect()}
    assert set(rows) == set(top)
    for w in top:
        days = cnt[w]
        tot = total[w]
        m = tot / 30
        v = sum(c * c for c in days.values()) / 30 - m * m
        peak = max(days.values())
        peak_day = min(d for d, c in days.items() if c == peak)
        r = rows[w]
        assert (r.total, r.peak_count, r.peak_day) == (tot, peak, peak_day)
        assert abs(r.fano_factor - v / m) < 1e-9
        assert abs(r.peak_share_pct - peak / tot * 100) < 1e-6


def test_masked_position_pairs_rejects_wide_radius(spark):
    """ADVICE r7: blocking is complete only at distance 1 — max_dist=2
    must raise instead of silently missing distance-2 pairs."""
    import pytest as _pytest

    from report_worker_spark.operators import masked_position_pairs

    df = spark.createDataFrame([(1, "abc")], ["id", "name"])
    with _pytest.raises(ValueError, match="distance <= 1"):
        masked_position_pairs(df, "id", "name", max_dist=2)


def test_hits_rejects_nonpositive_rounds(spark):
    """ADVICE r7: rounds=0 raised an opaque AttributeError mid-plan;
    it must fail fast with a clear message."""
    import pytest as _pytest

    from report_worker_spark.functions.graph import hits

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with _pytest.raises(ValueError, match="rounds >= 1"):
        hits(e, rounds=0)


def test_cohens_d_matches_python(spark, sf_small):
    """Effect size equals a direct python replay on collected cents."""
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("event_type", "value").collect()
    a = [round(r.value * 100) for r in ev if r.event_type == "view"]
    b = [round(r.value * 100) for r in ev if r.event_type == "signup"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ssa = sum(x * x for x in a) - na * ma * ma
    ssb = sum(x * x for x in b) - nb * mb * mb
    d = (ma - mb) / math.sqrt((ssa + ssb) / (na + nb - 2))
    row = QUERIES["stats_cohens_d"](spark, sf_small).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert abs(row.cohens_d - d) < 1e-9
    assert abs(row.hedges_g - d * (1 - 3.0 / (4 * (na + nb) - 9))) < 1e-9


def test_grubbs_max_matches_python(spark, sf_small):
    """G statistic and argmax event id equal a python replay."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append((r.event_id, round(r.value * 100)))
    want = {}
    for t, xs in groups.items():
        n = len(xs)
        s = sum(c for _, c in xs)
        q = sum(c * c for _, c in xs)
        mean = s / n
        sd = math.sqrt((q - n * mean * mean) / (n - 1))
        best = min((-abs(n * c - s), eid) for eid, c in xs)
        want[t] = (n, (-best[0]) / n / sd, best[1])
    got = {
        r.event_type: (r.n, r.g_stat, r.argmax_event)
        for r in QUERIES["stats_grubbs_max"](spark, sf_small).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0]
        assert abs(got[t][1] - want[t][1]) < 1e-9
        assert got[t][2] == want[t][2], t


def test_hapax_ratio_matches_counter(spark, sf_small):
    """Vocab/hapax censuses equal a Counter replay per source."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    per_src = defaultdict(Counter)
    for r in docs:
        per_src[r.source].update(r.text.strip().split())
    got = {
        r.source: (r.vocab, r.tokens, r.hapax)
        for r in QUERIES["text_hapax_ratio"](spark, sf_small).collect()
    }
    for src, cnt in per_src.items():
        hap = sum(1 for c in cnt.values() if c == 1)
        assert got[src] == (len(cnt), sum(cnt.values()), hap), src


def test_lead_lag_xcorr_matches_python(spark, sf_small):
    """Per-lag correlation equals a numpy replay on the dense grids."""
    import datetime
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    x, y = [0] * 30, [0] * 30
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            if r.event_type == "click":
                x[d] += 1
            elif r.event_type == "purchase":
                y[d] += 1
    got = {
        r.lag: (r.n_days, r.cov_num, r.xcorr)
        for r in QUERIES["ts_lead_lag_xcorr"](spark, sf_small).collect()
    }
    for lag in range(-7, 8):
        pairs = [
            (x[d], y[d + lag]) for d in range(30) if 0 <= d + lag <= 29
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        num = n * sxy - sx * sy
        corr = num / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert got[lag][0] == n and got[lag][1] == num
        assert abs(got[lag][2] - corr) < 1e-9, lag


def test_hurst_rs_matches_python(spark, sf_small):
    """R/S means and the ln-ln slope equal a python replay."""
    import datetime
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    x = [0] * 30
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29 and r.event_type == "click":
            x[d] += 1
    pts = []
    for w in (5, 10, 15):
        vals = []
        for c in range(30 // w):
            chunk = x[c * w : (c + 1) * w]
            s, q = sum(chunk), sum(v * v for v in chunk)
            disc = w * q - s * s
            if disc <= 0:
                continue
            cums = []
            acc = 0
            for k, v in enumerate(chunk, start=1):
                acc += v
                cums.append(w * acc - k * s)
            vals.append((max(cums) - min(cums)) / math.sqrt(disc))
        rs_mean = sum(sorted(vals)) / len(vals)
        pts.append((w, len(vals), rs_mean))
    lx = [math.log(w) for w, _, _ in pts]
    ly = [math.log(m) for _, _, m in pts]
    n = len(pts)
    slope = (n * sum(a * b for a, b in zip(lx, ly)) - sum(lx) * sum(ly)) / (
        n * sum(a * a for a in lx) - sum(lx) ** 2
    )
    got = {
        r.w: (r.n_chunks, r.rs_mean, r.hurst)
        for r in QUERIES["ts_hurst_rs"](spark, sf_small).collect()
    }
    for w, nc, m in pts:
        assert got[w][0] == nc
        assert abs(got[w][1] - m) < 1e-9
        assert abs(got[w][2] - slope) < 1e-6


def test_median_order_gap_matches_python(spark, sf_small):
    """med2/min/max gaps equal a python replay per customer."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    per = defaultdict(list)
    for r in rows:
        per[r.o_custkey].append((r.o_orderdate.date(), r.o_orderkey))
    got = {
        r.o_custkey: (r.n_gaps, r.med2_gap_days, r.min_gap, r.max_gap)
        for r in QUERIES["olap_median_order_gap"](spark, sf_small).collect()
    }
    for ck, lst in per.items():
        lst.sort()
        gaps = sorted(
            (b[0] - a[0]).days for a, b in zip(lst, lst[1:])
        )
        if not gaps:
            assert ck not in got
            continue
        n = len(gaps)
        med2 = gaps[(n - 1) // 2] + gaps[n // 2]
        assert got[ck] == (n, med2, gaps[0], gaps[-1]), ck


def _py_cooccur_edges(spark, sf):
    import datetime

    from report_worker_spark.plans.tables import load

    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    ).collect()
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in li:
        if lo <= r.l_shipdate < hi:
            by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    return edges


def test_k_truss_matches_python(spark, sf_small):
    """3-round 4-truss peel census equals a python replay."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    sup = {}
    for _ in range(3):
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in edges
        }
        edges = {e for e, s in sup.items() if s >= 2}
    want = Counter(s for s in sup.values() if s >= 2)
    got = {
        r.sup: r.n_edges
        for r in QUERIES["graph_k_truss"](spark, sf_small).collect()
    }
    assert got == dict(want)


def test_rich_club_matches_python(spark, sf_small):
    """phi(k) equals a python replay for every threshold."""
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {
        r.k: (r.n_k, r.e_k, r.phi)
        for r in QUERIES["graph_rich_club"](spark, sf_small).collect()
    }
    for k in (2, 4, 8, 16, 32):
        rich = {n for n, d in deg.items() if d > k}
        if len(rich) < 2:
            assert k not in got
            continue
        ek = sum(1 for a, b in edges if a in rich and b in rich)
        nk = len(rich)
        assert got[k][0] == nk and got[k][1] == ek
        assert abs(got[k][2] - 2 * ek / (nk * (nk - 1))) < 1e-9


def test_centroid_shift_matches_numpy(spark, sf_small):
    """Per-label drift and argmax dim equal a numpy replay."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    labels = sorted({r.label for r in rows})
    got = {
        r.label: (r.n0, r.n1, r.drift_l2, r.max_dim)
        for r in QUERIES["emb_centroid_shift_drift"](spark, sf_small).collect()
    }
    for lab in labels:
        h0 = np.array(
            [[round(float(x) * 256) for x in r.embedding]
             for r in rows if r.label == lab and r.vec_id % 2 == 0],
            dtype=np.int64,
        )
        h1 = np.array(
            [[round(float(x) * 256) for x in r.embedding]
             for r in rows if r.label == lab and r.vec_id % 2 == 1],
            dtype=np.int64,
        )
        n0, n1 = len(h0), len(h1)
        d = n1 * h0.sum(axis=0) - n0 * h1.sum(axis=0)
        drift = np.sqrt(np.sum(np.sort(d.astype(np.float64) ** 2))) / (
            n0 * n1
        )
        mx = int(np.min(np.where(np.abs(d) == np.abs(d).max())))
        assert got[lab][0] == n0 and got[lab][1] == n1
        assert abs(got[lab][2] - drift) < 1e-9
        assert got[lab][3] == mx, lab


def _emb_sample_pairs_py(spark, sf, k=100):
    """Python replay of catalog._sample_pairs."""
    import hashlib

    import numpy as np

    from report_worker_spark.plans.tables import load

    rows = load(spark, sf, "embeddings").collect()
    ids = [r.vec_id for r in rows]
    labs = {r.vec_id: r.label for r in rows}
    qv = {
        r.vec_id: np.array(
            [round(float(x) * 256) for x in r.embedding], dtype=np.int64
        )
        for r in rows
    }
    sample = [
        i
        for _, i in sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), int(i)) for i in ids
        )[:k]
    ]
    pairs = []
    for q in sample:
        for n in ids:
            if n == q:
                continue
            d2 = int(((qv[q] - qv[n]) ** 2).sum())
            pairs.append((q, labs[q], n, labs[n], d2))
    return pairs


def test_range_search_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    pairs = _emb_sample_pairs_py(spark, sf_small)
    want = defaultdict(lambda: [0, 0, 0, None])
    for q, _, _, _, d2 in pairs:
        w = want[q]
        w[0] += d2 <= 100_000
        w[1] += d2 <= 120_000
        w[2] += d2 <= 140_000
        w[3] = d2 if w[3] is None else min(w[3], d2)
    got = {
        r.vec_id: [r.n_r100k, r.n_r120k, r.n_r140k, r.min_d2]
        for r in QUERIES["sim_range_search_radius"](spark, sf_small).collect()
    }
    assert got == {q: list(v) for q, v in want.items()}


def test_triplet_violation_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    pairs = _emb_sample_pairs_py(spark, sf_small)
    per = defaultdict(lambda: [None, None])
    anchor_lab = {}
    for q, ql, _, nl, d2 in pairs:
        anchor_lab[q] = ql
        slot = per[q]
        if nl == ql:
            slot[0] = d2 if slot[0] is None else min(slot[0], d2)
        else:
            slot[1] = d2 if slot[1] is None else min(slot[1], d2)
    by_lab = defaultdict(lambda: [0, 0])
    for q, (dp, dn) in per.items():
        if dp is None or dn is None:
            continue
        by_lab[anchor_lab[q]][0] += 1
        by_lab[anchor_lab[q]][1] += dp >= dn
    got = {
        r.label: (r.n_anchors, r.n_violations, r.violation_rate)
        for r in QUERIES["emb_triplet_violation_rate"](spark, sf_small).collect()
    }
    assert set(got) == set(by_lab)
    for lab, (n, v) in by_lab.items():
        assert got[lab][0] == n and got[lab][1] == v
        assert abs(got[lab][2] - v / n) < 1e-9


def test_silhouette_sample_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    pairs = _emb_sample_pairs_py(spark, sf_small)
    acc = defaultdict(lambda: [0, 0])
    anchor_lab = {}
    for q, ql, _, nl, d2 in pairs:
        anchor_lab[q] = ql
        acc[(q, nl)][0] += d2
        acc[(q, nl)][1] += 1
    got = {
        r.vec_id: (r.label, r.a2_milli, r.b2_milli, r.nn_label, r.silhouette)
        for r in QUERIES["emb_silhouette_sample"](spark, sf_small).collect()
    }
    for q, ql in anchor_lab.items():
        if (q, ql) not in acc:
            assert q not in got
            continue
        sa, na = acc[(q, ql)]
        a2 = sa / na
        best = min(
            (acc[(qq, nl)][0] / acc[(qq, nl)][1], nl)
            for (qq, nl) in acc
            if qq == q and nl != ql
        )
        b2, nn = best
        sb, nb = acc[(q, nn)]
        s = (b2 - a2) / max(a2, b2)
        assert got[q][0] == ql
        assert got[q][1] == sa * 1000 // na
        assert got[q][2] == sb * 1000 // nb
        assert got[q][3] == nn
        assert abs(got[q][4] - s) < 1e-9


def test_wav_clipping_matches_python(spark, sf_small):
    """Clipping census equals a python keystream replay."""
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [r.doc_id for r in load(spark, sf_small, "documents").select("doc_id").collect()]
    got = {
        r.media_id: (r.n_frames, r.clipped_frames, r.longest_clip_run,
                     r.peak_dev, r.clip_ppm)
        for r in QUERIES["multimodal_wav_clipping_rate"](spark, sf_small).collect()
    }
    for mid in ids:
        nf = mid % 96 + 32
        ks = b"".join(
            hashlib.md5(f"{mid}:wav:{b}".encode()).digest()
            for b in range((nf + 15) // 16)
        )[:nf]
        clipped = [v <= 2 or v >= 253 for v in ks]
        total = sum(clipped)
        longest = run = 0
        for f in clipped:
            run = run + 1 if f else 0
            longest = max(longest, run)
        peak = max(abs(v - 128) for v in ks)
        assert got[mid] == (nf, total, longest, peak,
                            total * 1_000_000 // nf), mid


def test_colorfulness_matches_python(spark, sf_small):
    """Opponent-channel sums and the metric equal a keystream replay."""
    import hashlib
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [r.doc_id for r in load(spark, sf_small, "documents").select("doc_id").collect()
           if r.doc_id % 2 == 0]
    got = {
        r.media_id: r
        for r in QUERIES["multimodal_image_colorfulness"](spark, sf_small).collect()
    }
    for mid in ids[:40]:
        w, h = mid % 31 + 2, mid % 23 + 2
        n = w * h * 3
        ks = b"".join(
            hashlib.md5(f"{mid}:{b}".encode()).digest()
            for b in range((n + 15) // 16)
        )[:n]
        rg = [ks[i] - ks[i + 1] for i in range(0, n, 3)]
        yb = [ks[i] + ks[i + 1] - 2 * ks[i + 2] for i in range(0, n, 3)]
        r = got[mid]
        np_ = w * h
        assert (r.n_pixels, r.sum_rg, r.sum_yb2x) == (np_, sum(rg), sum(yb))
        assert r.sum_rg2 == sum(v * v for v in rg)
        assert r.sum_yb2x_sq == sum(v * v for v in yb)
        var_rg = r.sum_rg2 / np_ - (r.sum_rg / np_) ** 2
        var_yb = (r.sum_yb2x_sq / np_ - (r.sum_yb2x / np_) ** 2) / 4
        c = math.sqrt(var_rg + var_yb) + 0.3 * math.sqrt(
            (r.sum_rg / np_) ** 2 + (r.sum_yb2x / (2 * np_)) ** 2
        )
        assert abs(r.colorfulness - c) < 1e-5, mid


def test_stratified_quota_exact_allocation(spark, sf_small):
    """Quotas sum to exactly 500, follow largest-remainder, and the
    kept checksum matches a python replay of the md5 keep order."""
    import hashlib
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select(
        "doc_id", "source", "lang"
    ).collect()
    strata = defaultdict(list)
    for r in docs:
        strata[(r.source, r.lang)].append(r.doc_id)
    N = len(docs)
    alloc = {
        k: (500 * len(v) // N, 500 * len(v) % N) for k, v in strata.items()
    }
    leftover = 500 - sum(b for b, _ in alloc.values())
    order = sorted(alloc, key=lambda k: (-alloc[k][1], k[0], k[1]))
    quota = {
        k: alloc[k][0] + (1 if i < leftover else 0)
        for i, k in enumerate(order)
    }
    got = {
        (r.source, r.lang): (r.n_stratum, r.quota, r.kept_id_sum)
        for r in QUERIES["curation_stratified_quota"](spark, sf_small).collect()
    }
    assert sum(q for _, q, _ in got.values()) == 500
    for k, ids in strata.items():
        keep = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[: quota[k]]
        assert got[k] == (len(ids), quota[k], sum(keep)), k


def test_js_divergence_matches_python(spark, sf_small):
    """JS divergence equals a python replay and sits in [0, ln 2]."""
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    per = defaultdict(Counter)
    corpus = Counter()
    for r in docs:
        ws = r.text.strip().split()
        per[r.source].update(ws)
        corpus.update(ws)
    N = sum(corpus.values())
    got = {
        r.source: (r.n_terms, r.js_nats)
        for r in QUERIES["text_js_divergence_sources"](spark, sf_small).collect()
    }
    for src, cnt in per.items():
        ns = sum(cnt.values())
        js = 0.0
        for w, c in cnt.items():
            p, q = c / ns, corpus[w] / N
            m = (p + q) / 2
            js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        js += 0.5 * math.log(2) * (
            1 - sum(corpus[w] for w in cnt) / N
        )
        assert got[src][0] == len(cnt)
        assert abs(got[src][1] - js) < 1e-9, src
        assert -1e-12 <= got[src][1] <= math.log(2) + 1e-12


def test_modularity_matches_python(spark, sf_small):
    """Q equals a python replay of 3-round min-label propagation."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lbl = {n: n for n in adj}
    for _ in range(3):
        lbl = {
            n: min([lbl[n]] + [lbl[x] for x in adj[n]]) for n in adj
        }
    m = len(edges)
    intra = sum(1 for a, b in edges if lbl[a] == lbl[b])
    dsum = defaultdict(int)
    for n in adj:
        dsum[lbl[n]] += len(adj[n])
    sum_d2 = sum(v * v for v in dsum.values())
    q = intra / m - sum_d2 / (4 * m * m)
    row = QUERIES["graph_modularity_labelprop"](spark, sf_small).collect()[0]
    assert (row.n_communities, row.n_edges, row.intra_edges, row.sum_d2) == (
        len(dsum), m, intra, sum_d2
    )
    assert abs(row.modularity - q) < 1e-9


def test_local_bridges_matches_python(spark, sf_small):
    """Bridge census and top-20 equal a python replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    bridges = [(a, b) for a, b in edges if not (adj[a] & adj[b])]
    want_top = sorted(
        ((len(adj[a]) * len(adj[b]), a, b) for a, b in bridges),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    rows = sorted(
        QUERIES["graph_local_bridges"](spark, sf_small).collect(),
        key=lambda r: r.rank,
    )
    assert all(
        (r.n_edges, r.n_bridges) == (len(edges), len(bridges)) for r in rows
    )
    assert [(r.deg_product, r.src, r.dst) for r in rows] == want_top


def test_friedman_matches_scipy_shape(spark, sf_small):
    """Doubled-rank sums and the statistic equal a python replay."""
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    types = sorted({r.event_type for r in ev})
    grid = defaultdict(lambda: {t: 0 for t in types})
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grid[d][r.event_type] += 1
    r2 = {t: 0 for t in types}
    for d in range(30):
        vals = grid[d]
        for t in types:
            less = sum(1 for u in types if vals[u] < vals[t])
            tie = sum(1 for u in types if vals[u] == vals[t])
            r2[t] += 2 * less + tie + 1
    k = len(types)
    ss = sum(v * v for v in r2.values())
    chi2 = 3.0 * ss / (30 * k * (k + 1)) - 3.0 * 30 * (k + 1)
    got = {
        r.event_type: (r.r2_sum, r.k, r.chi2_f)
        for r in QUERIES["stats_friedman_test"](spark, sf_small).collect()
    }
    for t in types:
        assert got[t][0] == r2[t]
        assert got[t][1] == k
        assert abs(got[t][2] - chi2) < 1e-9


def test_nearest_event_matches_python(spark, sf_small):
    """Bidirectional nearest-click match equals a python replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").filter(
        "event_type in ('click', 'purchase')"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(
            (r.ts, 0 if r.event_type == "click" else 1, r.event_id)
        )
    got = {
        r.purchase_id: (r.click_id, r.delta_us, r.delta_s)
        for r in QUERIES["join_nearest_event"](spark, sf_small).collect()
    }
    n_checked = 0
    for uid, rows in per.items():
        rows.sort()
        for i, (ts, knd, eid) in enumerate(rows):
            if knd != 1:
                continue
            prev = next_ = None
            for j in range(i, -1, -1):
                if rows[j][1] == 0:
                    prev = rows[j]
                    break
            for j in range(i, len(rows)):
                if rows[j][1] == 0:
                    next_ = rows[j]
                    break
            us = lambda a, b: round((b - a).total_seconds() * 1e6)
            if prev is None and next_ is None:
                want = (None, None, None)
            elif next_ is None:
                want = (prev[2], us(prev[0], ts), us(prev[0], ts) // 10**6)
            elif prev is None:
                want = (next_[2], us(ts, next_[0]), us(ts, next_[0]) // 10**6)
            elif us(prev[0], ts) <= us(ts, next_[0]):
                want = (prev[2], us(prev[0], ts), us(prev[0], ts) // 10**6)
            else:
                want = (next_[2], us(ts, next_[0]), us(ts, next_[0]) // 10**6)
            assert got[eid] == want, (uid, eid, got[eid], want)
            n_checked += 1
    assert n_checked > 50


def test_capture_recapture_matches_python(spark, sf_small):
    """Sample counts and estimators equal a python replay."""
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text").collect()
    by_text = {}
    for r in docs:
        h = hashlib.md5(r.text.encode()).hexdigest()
        i1 = hashlib.md5(f"s1:{r.doc_id}".encode()).hexdigest()[0] in "01234567"
        i2 = hashlib.md5(f"s2:{r.doc_id}".encode()).hexdigest()[0] in "01234567"
        a, b = by_text.get(h, (0, 0))
        by_text[h] = (max(a, i1), max(b, i2))
    n1 = sum(a for a, _ in by_text.values())
    n2 = sum(b for _, b in by_text.values())
    m = sum(a * b for a, b in by_text.values())
    row = QUERIES["stats_capture_recapture"](spark, sf_small).collect()[0]
    assert (row.n1, row.n2, row.m, row.true_distinct) == (
        n1, n2, m, len(by_text)
    )
    assert abs(row.lincoln_petersen - n1 * n2 / m) < 1e-9
    ch = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert abs(row.chapman - ch) < 1e-9
    assert abs(row.chapman_rel_err - (ch / len(by_text) - 1)) < 1e-9


def test_brand_weekend_lift_matches_python(spark, sf_small):
    """Per-brand weekend lift equals a python replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    ).collect()
    parts = {
        r.p_partkey: r.p_brand
        for r in load(spark, sf_small, "part").select("p_partkey", "p_brand").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        brand = parts[r.l_partkey]
        wknd = r.l_shipdate.weekday() >= 5  # Mon=0..Sun=6
        cents = round(r.l_extendedprice * 100)
        a = agg[brand]
        if wknd:
            a[0] += 1
            a[2] += cents
        else:
            a[1] += 1
            a[3] += cents
    got = {
        r.p_brand: (r.n_wknd, r.n_wkdy, r.cents_wknd, r.cents_wkdy,
                    r.daily_rate_lift)
        for r in QUERIES["olap_brand_weekend_lift"](spark, sf_small).collect()
    }
    for brand, (nw, nd, cw, cd) in agg.items():
        if nw == 0 or nd == 0:
            assert brand not in got
            continue
        assert got[brand][:4] == (nw, nd, cw, cd)
        assert abs(got[brand][4] - (cw / 2) / (cd / 5)) < 1e-9


def test_cohens_kappa_matches_python(spark, sf_small):
    """Kappa and the contingency counts equal a python replay."""
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    STOPS = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}
    docs = load(spark, sf_small, "documents").select(
        "text", "n_chars"
    ).collect()
    n = len(docs)
    n11 = n00 = a1 = b1 = 0
    for r in docs:
        ra = r.n_chars >= 250
        rb = sum(1 for t in r.text.strip().split() if t in STOPS) >= 3
        n11 += ra and rb
        n00 += (not ra) and (not rb)
        a1 += ra
        b1 += rb
    chance = a1 * b1 + (n - a1) * (n - b1)
    num, den = n * (n11 + n00) - chance, n * n - chance
    row = QUERIES["stats_cohens_kappa"](spark, sf_small).collect()[0]
    assert (row.n, row.n11, row.n00, row.a1, row.b1) == (n, n11, n00, a1, b1)
    assert (row.kappa_num, row.kappa_den) == (num, den)
    assert abs(row.kappa - num / den) < 1e-12


def test_simpson_diversity_matches_python(spark, sf_small):
    """Coincidence counts and the index equal a Counter replay."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    per = defaultdict(Counter)
    for r in docs:
        per[r.source].update(r.text.strip().split())
    got = {
        r.source: (r.tokens, r.vocab, r.coincide, r.simpson_diversity)
        for r in QUERIES["text_simpson_diversity"](spark, sf_small).collect()
    }
    for src, cnt in per.items():
        N = sum(cnt.values())
        co = sum(c * (c - 1) for c in cnt.values())
        assert got[src][:3] == (N, len(cnt), co)
        assert abs(got[src][3] - (1 - co / (N * (N - 1)))) < 1e-12


def test_hill_estimator_matches_python(spark, sf_small):
    """Hill alpha equals a python replay over the top-20 tail."""
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(r.text.strip().split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    thr = ranked[20][1]
    ssum = sum(sorted(math.log(f / thr) for _, f in ranked[:20]))
    row = QUERIES["stats_hill_tail_estimator"](spark, sf_small).collect()[0]
    assert (row.k, row.f_threshold) == (20, thr)
    assert abs(row.hill_alpha - 20.0 / ssum) < 1e-9


def test_ship_delay_profile_matches_python(spark, sf_small):
    """Exact med2/p90 delay profile equals a python replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    orders = {
        r.o_orderkey: (r.o_orderdate.date(), r.o_orderpriority)
        for r in load(spark, sf_small, "orders").collect()
    }
    per = defaultdict(list)
    for r in load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        od, prio = orders[r.l_orderkey]
        per[prio].append((r.l_shipdate.date() - od).days)
    got = {
        r.o_orderpriority: (r.n_lines, r.min_delay, r.max_delay,
                            r.med2_delay, r.p90_delay)
        for r in QUERIES["olap_ship_delay_by_priority"](spark, sf_small).collect()
    }
    for prio, ds in per.items():
        ds.sort()
        n = len(ds)
        med2 = ds[(n - 1) // 2] + ds[n // 2]
        p90 = ds[(n * 9 + 9) // 10 - 1]  # ceil-rank
        assert got[prio] == (n, ds[0], ds[-1], med2, p90), prio


def test_odds_ratio_matches_python(spark, sf_small):
    """2x2 cells and Woolf CI equal a python replay at user-day grain."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    flags = defaultdict(lambda: [0, 0])
    for r in ev:
        k = (r.user_id, r.ts.date())
        slot = flags[k]  # every user-day is a trial, whatever its events
        if r.event_type == "click":
            slot[0] = 1
        elif r.event_type == "purchase":
            slot[1] = 1
    a = sum(1 for c, b in flags.values() if c and b)
    b = sum(1 for c, bo in flags.values() if c and not bo)
    c = sum(1 for cl, bo in flags.values() if not cl and bo)
    d = sum(1 for cl, bo in flags.values() if not cl and not bo)
    row = QUERIES["stats_odds_ratio_ci"](spark, sf_small).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(row.odds_ratio - orr) < 1e-9
    assert abs(row.ci_low - math.exp(math.log(orr) - 1.96 * se)) < 1e-9
    assert abs(row.ci_high - math.exp(math.log(orr) + 1.96 * se)) < 1e-9


def test_yield_curve_matches_python(spark, sf_small):
    """Per-decile novelty counts equal a python replay in md5 order."""
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text").collect()
    ordered = sorted(
        docs, key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(),
                             r.doc_id)
    )
    n = len(ordered)
    seen = set()
    docs_per, new_per = [0] * 10, [0] * 10
    for i, r in enumerate(ordered):
        dec = i * 10 // n
        docs_per[dec] += 1
        h = hashlib.md5(r.text.encode()).hexdigest()
        if h not in seen:
            seen.add(h)
            new_per[dec] += 1
    got = {
        r.decile: (r.docs, r.new_distinct, r.novelty_rate)
        for r in QUERIES["dedup_yield_curve"](spark, sf_small).collect()
    }
    for dec in range(10):
        if docs_per[dec] == 0:
            continue
        assert got[dec][0] == docs_per[dec]
        assert got[dec][1] == new_per[dec], dec
        assert abs(got[dec][2] - new_per[dec] / docs_per[dec]) < 1e-12


def test_norm_profile_matches_python(spark, sf_small):
    """Per-label norm quantiles equal a python replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    per = defaultdict(list)
    for r in rows:
        q = [round(float(x) * 256) for x in r.embedding]
        per[r.label].append(sum(v * v for v in q))
    got = {
        r.label: (r.n_vecs, r.min_nn, r.max_nn, r.med2_nn, r.q1_nn, r.q3_nn)
        for r in QUERIES["emb_norm_profile"](spark, sf_small).collect()
    }
    for lab, ns in per.items():
        ns.sort()
        n = len(ns)
        med2 = ns[(n - 1) // 2] + ns[n // 2]
        q1 = ns[(n + 3) // 4 - 1]
        q3 = ns[(n * 3 + 3) // 4 - 1]
        assert got[lab] == (n, ns[0], ns[-1], med2, q1, q3), lab


def test_dup_rate_by_source_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    per = defaultdict(set)
    cnt = defaultdict(int)
    for r in docs:
        per[r.source].add(r.text)
        cnt[r.source] += 1
    got = {
        r.source: (r.n_docs, r.n_distinct, r.n_redundant, r.dup_share)
        for r in QUERIES["curation_dup_rate_by_source"](spark, sf_small).collect()
    }
    for src in per:
        nd, ndist = cnt[src], len(per[src])
        assert got[src][:3] == (nd, ndist, nd - ndist)
        assert abs(got[src][3] - (nd - ndist) / nd) < 1e-12


def test_missing_data_audit_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    grid = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grid[r.event_type][d] += 1
    got = {
        r.event_type: (r.zero_days, r.n_gaps, r.longest_gap, r.missing_share)
        for r in QUERIES["ts_missing_data_audit"](spark, sf_small).collect()
    }
    for t, xs in grid.items():
        runs, cur = [], 0
        for v in xs:
            if v == 0:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        zd = sum(runs)
        assert got[t] == (zd, len(runs), max(runs) if runs else 0,
                          round(zd / 30, 12) if zd else 0.0), t


def test_linear_counting_matches_python(spark, sf_small):
    import hashlib
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("text").collect()
    buckets = set()
    texts = set()
    for r in docs:
        h = hashlib.md5(r.text.encode()).hexdigest()
        texts.add(h)
        buckets.add(int(h[:3], 16))
    row = QUERIES["agg_linear_counting"](spark, sf_small).collect()[0]
    assert (row.occupied, row.m, row.true_distinct) == (
        len(buckets), 4096, len(texts)
    )
    est = 4096 * math.log(4096 / (4096 - len(buckets)))
    assert abs(row.lc_estimate - est) < 1e-6
    assert abs(row.rel_err - (est / len(texts) - 1)) < 1e-6


def test_sprt_monitor_matches_python(spark, sf_small):
    """Cumulative LLR trajectory equals a python replay in day order."""
    import datetime
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            if r.event_type == "purchase":
                daily[d][0] += 1
                daily[d][1] += 1
            elif r.event_type == "click":
                daily[d][1] += 1
    got = {
        r.day: (r.k, r.n, r.cum_llr, r.decision)
        for r in QUERIES["stats_sprt_ab_monitor"](spark, sf_small).collect()
    }
    cum = 0.0
    bound = math.log(19.0)
    for d in sorted(daily):
        k, n = daily[d]
        cum += k * math.log(0.35 / 0.30) + (n - k) * math.log(0.65 / 0.70)
        want_dec = (
            "accept_h1" if cum >= bound
            else "accept_h0" if cum <= -bound
            else "continue"
        )
        assert got[d][0] == k and got[d][1] == n
        assert abs(got[d][2] - cum) < 1e-6  # cum_llr rounds at 6
        assert got[d][3] == want_dec, d


def test_mixing_anneal_matches_python(spark, sf_small):
    """Annealed weights equal a python replay and sum to 1 per epoch."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    counts = Counter(
        r.source
        for r in load(spark, sf_small, "documents").select("source").collect()
    )
    got = defaultdict(dict)
    for r in QUERIES["curation_mixing_anneal"](spark, sf_small).collect():
        got[r.epoch][r.source] = (r.n_docs, r.mix_weight)
    for e in range(5):
        alpha = 1.0 - 0.125 * e
        ws = {s: n ** alpha for s, n in counts.items()}
        z = sum(sorted(ws.values()))
        tot = 0.0
        for s, n in counts.items():
            assert got[e][s][0] == n
            assert abs(got[e][s][1] - ws[s] / z) < 1e-9
            tot += got[e][s][1]
        assert abs(tot - 1.0) < 1e-6


def test_customer_hhi_matches_python(spark, sf_small):
    """Per-nation HHI equals a python replay."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    nat = {
        r.c_custkey: r.c_nationkey
        for r in load(spark, sf_small, "customer").collect()
    }
    import math

    rev = defaultdict(lambda: defaultdict(int))
    for r in load(spark, sf_small, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        # engines round HALF_UP; python round() is banker's
        rev[nat[r.o_custkey]][r.o_custkey] += math.floor(
            r.o_totalprice + 0.5
        )
    got = {
        r.c_nationkey: (r.n_customers, r.total_dollars, r.hhi,
                        r.hhi_normalized)
        for r in QUERIES["olap_customer_hhi"](spark, sf_small).collect()
    }
    for nk, cust in rev.items():
        n = len(cust)
        if n <= 1:
            assert nk not in got
            continue
        tot = sum(cust.values())
        hhi = sum(v * v for v in cust.values()) / (tot * tot)
        assert got[nk][0] == n and got[nk][1] == tot
        assert abs(got[nk][2] - hhi) < 1e-12
        assert abs(got[nk][3] - (hhi - 1 / n) / (1 - 1 / n)) < 1e-9


def test_return_rate_matches_python(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    parts = {
        r.p_partkey: r.p_brand
        for r in load(spark, sf_small, "part").select("p_partkey", "p_brand").collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_returnflag"
    ).collect():
        a = agg[parts[r.l_partkey]]
        a[0] += 1
        a[1] += r.l_returnflag == "R"
    got = {
        r.p_brand: (r.n_lines, r.n_returns, r.return_rate,
                    r.wilson_low, r.wilson_high)
        for r in QUERIES["olap_return_rate_by_brand"](spark, sf_small).collect()
    }
    z2 = 1.96 * 1.96
    for brand, (n, k) in agg.items():
        p = k / n
        half = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        lo = (p + z2 / (2 * n) - half) / (1 + z2 / n)
        hi = (p + z2 / (2 * n) + half) / (1 + z2 / n)
        assert got[brand][:2] == (n, k)
        assert abs(got[brand][2] - p) < 1e-12
        assert abs(got[brand][3] - lo) < 1e-9
        assert abs(got[brand][4] - hi) < 1e-9


def test_log_odds_terms_matches_python(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    per = defaultdict(Counter)
    corpus = Counter()
    for r in docs:
        ws = r.text.strip().split()
        per[r.source].update(ws)
        corpus.update(ws)
    N = sum(corpus.values())
    V = len(corpus)
    got = defaultdict(dict)
    for r in QUERIES["text_log_odds_terms"](spark, sf_small).collect():
        got[r.source][r.rnk] = (r.term, r.n, r.log_odds)
    for src, cnt in per.items():
        ns = sum(cnt.values())
        scored = []
        for w, n in cnt.items():
            n_out = corpus[w] - n
            lo = math.log((2 * n + 1) / (2 * (ns - n) + V)) - math.log(
                (2 * n_out + 1) / (2 * (N - ns - n_out) + V)
            )
            scored.append((lo, w, n))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rnk in (1, 2, 3):
            lo, w, n = scored[rnk - 1]
            term, gn, glo = got[src][rnk]
            assert (term, gn) == (w, n), (src, rnk)
            assert abs(glo - lo) < 1e-9


def test_negbin_fit_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    grid = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grid[r.event_type][d] += 1
    got = {
        r.event_type: (r.mean, r.variance, r.nb_r, r.nb_p, r.overdispersed)
        for r in QUERIES["stats_negbin_fit"](spark, sf_small).collect()
    }
    for t, xs in grid.items():
        n = 30
        m = sum(xs) / n
        v = (sum(x * x for x in xs) - n * m * m) / (n - 1)
        assert abs(got[t][0] - m) < 1e-9
        assert abs(got[t][1] - v) < 1e-6
        if v > m:
            assert abs(got[t][2] - m * m / (v - m)) < 1e-6
            assert abs(got[t][3] - m / v) < 1e-9
            assert got[t][4] is True
        else:
            assert got[t][2] is None and got[t][3] is None


def test_twonn_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    pairs = _emb_sample_pairs_py(spark, sf_small)
    from collections import defaultdict

    dists = defaultdict(list)
    for q, _, _, _, d2 in pairs:
        dists[q].append(d2)
    mus = []
    for q, ds in dists.items():
        ds.sort()
        r1 = ds[0]
        r2 = next((d for d in ds if d > r1), None)
        if r2 is None:
            continue
        mus.append(0.5 * math.log(r2 / r1))
    want = len(mus) / sum(sorted(mus))
    row = QUERIES["emb_intrinsic_dim_twonn"](spark, sf_small).collect()[0]
    assert row.n_anchors == len(mus)
    assert abs(row.intrinsic_dim - want) < 1e-9


def test_markov_transitions_match_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts = defaultdict(int)
    for rows in per.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            counts[(a, b)] += 1
    row_tot = defaultdict(int)
    for (a, _), n in counts.items():
        row_tot[a] += n
    got = {
        (r.from_type, r.to_type): (r.n, r.row_total, r.p)
        for r in QUERIES["stats_markov_transitions"](spark, sf_small).collect()
    }
    assert set(got) == set(counts)
    for k, n in counts.items():
        assert got[k][0] == n
        assert got[k][1] == row_tot[k[0]]
        assert abs(got[k][2] - n / row_tot[k[0]]) < 1e-12


def test_degree_ccdf_matches_python(spark, sf_small):
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    buckets = Counter(int(math.floor(math.log2(d))) for d in deg.values())
    got = {
        r.log2_bucket: (r.n_in_bucket, r.n_at_least, r.ccdf)
        for r in QUERIES["graph_degree_ccdf"](spark, sf_small).collect()
    }
    n_nodes = len(deg)
    running = 0
    for b in sorted(buckets, reverse=True):
        running += buckets[b]
        assert got[b][0] == buckets[b]
        assert got[b][1] == running
        assert abs(got[b][2] - running / n_nodes) < 1e-12


def test_pii_scrub_matches_python(spark, sf_small):
    """Redaction counts and residuals equal a python regex replay."""
    import re
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    email = re.compile(r"[A-Za-z0-9._]+@[A-Za-z0-9.]+")
    phone = re.compile(r"555-[0-9]{4}")
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in docs:
        t = r.text
        if r.doc_id % 7 == 0:
            t += f" contact user{r.doc_id}@example.com now"
        elif r.doc_id % 11 == 0:
            t += f" call 555-{1000 + r.doc_id % 9000} today"
        ne = len(email.findall(t))
        np_ = len(phone.findall(t))
        clean = phone.sub("<PHONE>", email.sub("<EMAIL>", t))
        a = agg[r.source]
        a[0] += 1
        a[1] += (ne + np_) > 0
        a[2] += ne
        a[3] += np_
        a[4] += "@" in clean
    got = {
        r.source: (r.n_docs, r.docs_with_pii, r.emails_redacted,
                   r.phones_redacted, r.residual_at_signs)
        for r in QUERIES["curation_pii_scrub_census"](spark, sf_small).collect()
    }
    for src, a in agg.items():
        assert got[src] == tuple(a), src
        assert got[src][4] == 0  # scrub leaves no residual


def test_funnel_report_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    STOPS = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}
    docs = load(spark, sf_small, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    s0 = len(docs)
    s1 = [r for r in docs if r.n_chars >= 100]
    s2 = [
        r for r in s1
        if sum(1 for t in r.text.strip().split() if t in STOPS) >= 1
    ]
    s3 = len({r.text for r in s2})
    want = [s0, len(s1), len(s2), s3]
    rows = sorted(
        QUERIES["curation_funnel_report"](spark, sf_small).collect(),
        key=lambda r: r.stage,
    )
    assert [r.docs for r in rows] == want
    assert [r.name for r in rows] == [
        "raw", "length_gate", "stopword_gate", "exact_dedup"
    ]
    for i, r in enumerate(rows):
        if i < 3:
            assert r.removed_next == want[i] - want[i + 1]
        else:
            assert r.removed_next is None
        assert abs(r.survival_rate - want[i] / want[0]) < 1e-12


def test_linecount_profile_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    per = Counter(
        r.l_orderkey
        for r in load(spark, sf_small, "lineitem").select("l_orderkey").collect()
    )
    hist = Counter(per.values())
    total = sum(hist.values())
    got = {
        r.n_lines: (r.n_orders, r.cum_orders, r.share)
        for r in QUERIES["olap_order_linecount_profile"](spark, sf_small).collect()
    }
    cum = 0
    for nl in sorted(hist):
        cum += hist[nl]
        assert got[nl][0] == hist[nl]
        assert got[nl][1] == cum
        assert abs(got[nl][2] - hist[nl] / total) < 1e-12


def test_diff_in_diff_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    grid = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grid[r.event_type][d] += 1
    t, c = grid["click"], grid["view"]
    t_pre, t_post = sum(t[:15]) / 15, sum(t[15:]) / 15
    c_pre, c_post = sum(c[:15]) / 15, sum(c[15:]) / 15
    row = QUERIES["ts_diff_in_diff"](spark, sf_small).collect()[0]
    assert abs(row.treated_pre_mean - t_pre) < 1e-9
    assert abs(row.treated_post_mean - t_post) < 1e-9
    assert abs(row.control_pre_mean - c_pre) < 1e-9
    assert abs(row.control_post_mean - c_post) < 1e-9
    assert abs(row.did_estimate - ((t_post - t_pre) - (c_post - c_pre))) < 1e-9
    assert abs(row.naive_estimate - (t_post - t_pre)) < 1e-9


def test_oov_rate_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    corpus = Counter()
    per = defaultdict(list)
    for r in docs:
        ws = r.text.strip().split()
        corpus.update(ws)
        per[r.source].extend(ws)
    vocab = {
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    }
    got = {
        r.source: (r.tokens, r.oov_tokens, r.oov_rate)
        for r in QUERIES["text_oov_rate"](spark, sf_small).collect()
    }
    for src, ws in per.items():
        oov = sum(1 for w in ws if w not in vocab)
        assert got[src][0] == len(ws)
        assert got[src][1] == oov, src
        assert abs(got[src][2] - oov / len(ws)) < 1e-12


def test_mcnemar_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    STOPS = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}
    docs = load(spark, sf_small, "documents").select("text", "n_chars").collect()
    b = c = 0
    for r in docs:
        ra = r.n_chars >= 250
        rb = sum(1 for t in r.text.strip().split() if t in STOPS) >= 3
        b += ra and not rb
        c += rb and not ra
    row = QUERIES["stats_mcnemar_test"](spark, sf_small).collect()[0]
    assert (row.b, row.c) == (b, c)
    assert row.chi2_num == (b - c) ** 2 and row.chi2_den == b + c
    assert abs(row.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-9
    assert abs(row.mcnemar_chi2_cc - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-9


def test_cohort_ltv_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()

    def week_start(d):
        return d - datetime.timedelta(days=d.weekday())

    first = {}
    for r in ev:
        d = week_start(r.ts.date())
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    sizes = defaultdict(int)
    for u, c in first.items():
        sizes[c] += 1
    weekly = defaultdict(int)
    import math

    for r in ev:
        if r.event_type != "purchase":
            continue
        c = first[r.user_id]
        wn = (week_start(r.ts.date()) - c).days // 7
        weekly[(c, wn)] += math.floor(r.value * 100 + 0.5)
    got = {
        (r.cohort.date(), r.week_n): (r.cohort_users, r.week_cents,
                                      r.cum_cents, r.ltv_per_user)
        for r in QUERIES["olap_cohort_ltv_curve"](spark, sf_small).collect()
    }
    cum = defaultdict(int)
    for (c, wn) in sorted(weekly):
        cum[c] += weekly[(c, wn)]
        assert got[(c, wn)][0] == sizes[c]
        assert got[(c, wn)][1] == weekly[(c, wn)], (c, wn)
        assert got[(c, wn)][2] == cum[c]
        assert abs(got[(c, wn)][3] - cum[c] / (100 * sizes[c])) < 1e-9


def test_ego_density_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    hubs = sorted(adj, key=lambda n: (-len(adj[n]), n))[:5]
    got = {
        r.hub: (r.degree, r.intra_edges, r.ego_density)
        for r in QUERIES["graph_ego_density_top"](spark, sf_small).collect()
    }
    for h in hubs:
        nbrs = adj[h]
        intra = sum(
            1 for a, b in edges if a in nbrs and b in nbrs
        )
        d = len(nbrs)
        assert got[h][0] == d
        assert got[h][1] == intra, h
        assert abs(got[h][2] - 2 * intra / (d * (d - 1))) < 1e-9


def test_shingle_df_profile_matches_python(spark, sf_small):
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("text").collect()
    df = Counter()
    for r in docs:
        ws = r.text.strip().split()
        sh = {
            " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)
        }
        df.update(sh)
    buckets = Counter()
    postings = Counter()
    for s, f in df.items():
        b = int(math.floor(math.log2(f)))
        buckets[b] += 1
        postings[b] += f
    total = sum(postings.values())
    got = {
        r.log2_bucket: (r.n_shingles, r.postings, r.postings_share)
        for r in QUERIES["dedup_shingle_df_profile"](spark, sf_small).collect()
    }
    assert set(got) == set(buckets)
    for b in buckets:
        assert got[b][0] == buckets[b]
        assert got[b][1] == postings[b]
        assert abs(got[b][2] - postings[b] / total) < 1e-12


def test_gumbel_fit_matches_python(spark, sf_small):
    import datetime
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    hourly = defaultdict(int)
    for r in ev:
        if r.event_type != "click":
            continue
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            hourly[(d, r.ts.hour)] += 1
    mx = defaultdict(int)
    for (d, _), n in hourly.items():
        mx[d] = max(mx[d], n)
    vals = list(mx.values())
    n = len(vals)
    m = sum(vals) / n
    sd = math.sqrt((sum(v * v for v in vals) - n * m * m) / (n - 1))
    beta = sd * math.sqrt(6.0) / math.pi
    mu = m - 0.5772156649015329 * beta
    row = QUERIES["stats_gumbel_block_maxima"](spark, sf_small).collect()[0]
    assert (row.n_blocks, row.overall_max) == (n, max(vals))
    assert abs(row.mean_max - m) < 1e-9
    assert abs(row.gumbel_beta - beta) < 1e-9
    assert abs(row.gumbel_mu - mu) < 1e-9


def test_theil_index_matches_python(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    nat = {
        r.c_custkey: r.c_nationkey
        for r in load(spark, sf_small, "customer").collect()
    }
    rev = defaultdict(lambda: defaultdict(int))
    for r in load(spark, sf_small, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        rev[nat[r.o_custkey]][r.o_custkey] += math.floor(
            r.o_totalprice + 0.5
        )
    got = {
        r.c_nationkey: (r.n_customers, r.theil_t)
        for r in QUERIES["stats_theil_index"](spark, sf_small).collect()
    }
    for nk, cust in rev.items():
        xs = [v for v in cust.values() if v > 0]
        n, X = len(xs), sum(xs)
        t = sum(sorted((x / X) * math.log(x * n / X) for x in xs))
        assert got[nk][0] == n
        assert abs(got[nk][1] - t) < 1e-9, nk


def test_haar_energy_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    xs = [0] * 32
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29 and r.event_type == "click":
            xs[d] += 1
    got = {
        r.level: (r.energy, r.n_coeffs)
        for r in QUERIES["ts_haar_energy"](spark, sf_small).collect()
    }
    cur = xs
    for level in range(1, 6):
        sums = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        diffs = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
        assert got[level] == (sum(d * d for d in diffs), len(diffs)), level
        cur = sums


def test_davies_bouldin_matches_numpy(spark, sf_small):
    """Per-label worst DB ratio and confusable neighbor equal numpy."""
    import numpy as np

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    labels = sorted({r.label for r in rows})
    mats = {
        lab: np.array(
            [[round(float(x) * 256) for x in r.embedding]
             for r in rows if r.label == lab],
            dtype=np.int64,
        )
        for lab in labels
    }
    s2 = {}
    mu = {}
    for lab, m in mats.items():
        n = len(m)
        mu[lab] = m.sum(axis=0) / n
        s2[lab] = (m.astype(float) ** 2).sum() / n - sum(
            sorted(mu[lab] ** 2)
        )
    got = {
        r.label: (r.worst_neighbor, r.db_ratio)
        for r in QUERIES["emb_davies_bouldin_sq"](spark, sf_small).collect()
    }
    for lab in labels:
        best = None
        for other in labels:
            if other == lab:
                continue
            d2 = float(((mu[lab] - mu[other]) ** 2).sum())
            ratio = (s2[lab] + s2[other]) / d2
            key = (-ratio, other)
            if best is None or key < best[0]:
                best = (key, other, ratio)
        assert got[lab][0] == best[1], lab
        assert abs(got[lab][1] - best[2]) < 1e-6, lab


def test_record_days_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    grid = defaultdict(lambda: [0] * 30)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            grid[r.event_type][d] += 1
    got = {
        r.event_type: (r.n_records, r.record_excess)
        for r in QUERIES["stats_record_days"](spark, sf_small).collect()
    }
    h30 = sum(1.0 / k for k in range(1, 31))
    for t, xs in grid.items():
        records = 0
        best = None
        for v in xs:
            if best is None or v > best:
                records += 1
                best = max(v, best or v)
        assert got[t][0] == records, t
        assert abs(got[t][1] - records / h30) < 1e-9


def test_price_elasticity_matches_python(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    per = defaultdict(lambda: [0, 0, 0])
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    ).collect():
        a = per[r.l_partkey]
        a[0] += math.floor(r.l_extendedprice * 100 + 0.5)
        a[1] += int(r.l_quantity)
        a[2] += 1
    pts = [
        (math.log(c / q), math.log(q / n))
        for c, q, n in per.values()
        if q > 0 and c > 0
    ]
    n = len(pts)
    sx = sum(sorted(x for x, _ in pts))
    sy = sum(sorted(y for _, y in pts))
    sxy = sum(sorted(x * y for x, y in pts))
    sxx = sum(sorted(x * x for x, _ in pts))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = QUERIES["olap_price_qty_elasticity"](spark, sf_small).collect()[0]
    assert row.n_parts == n
    assert abs(row.elasticity - slope) < 1e-9
    assert abs(row.intercept - (sy / n - slope * sx / n)) < 1e-9


def test_csv_roundtrip_identity(spark, sf_small):
    """Serialize->parse returns every field byte-identically."""
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    base = {
        r.c_custkey: (r.c_name, r.c_mktsegment,
                      math.floor(r.c_acctbal * 100 + 0.5))
        for r in load(spark, sf_small, "customer").collect()
    }
    rows = QUERIES["s4_csv_roundtrip"](spark, sf_small).collect()
    assert len(rows) == len(base)
    for r in rows:
        assert r.roundtrip_ok
        assert (r.name_rt, r.seg_rt, r.bal_cents_rt) == base[r.c_custkey]


def test_ljung_box_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    cnt = defaultdict(int)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29 and r.event_type == "click":
            cnt[d] += 1
    days = sorted(cnt)
    xs = {d: cnt[d] for d in days}
    n = len(days)
    s = sum(xs.values())
    c0 = sum((n * xs[d] - s) ** 2 for d in days)
    terms = []
    for k in range(1, 8):
        chat = sum(
            (n * xs[d] - s) * (n * xs[d + k] - s)
            for d in days
            if d + k in xs
        )
        terms.append((chat / c0) ** 2 / (n - k))
    q = n * (n + 2) * sum(sorted(terms))
    row = QUERIES["stats_ljung_box"](spark, sf_small).collect()[0]
    assert row.n_days == n and row.n_lags == 7
    assert abs(row.ljung_box_q - q) < 1e-9
    assert row.reject_white_noise_05 == (q > 14.067)


def test_hubness_audit_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    pairs = _emb_sample_pairs_py(spark, sf_small)
    per = defaultdict(list)
    for q, _, nid, _, d2 in pairs:
        per[q].append((d2, nid))
    occ = Counter()
    for q, lst in per.items():
        lst.sort()
        for _, nid in lst[:5]:
            occ[nid] += 1
    hist = defaultdict(lambda: [0, None])
    for nid, k in occ.items():
        h = hist[k]
        h[0] += 1
        h[1] = nid if h[1] is None else min(h[1], nid)
    got = {
        r.k_occurrence: (r.n_points, r.example_id)
        for r in QUERIES["emb_hubness_audit"](spark, sf_small).collect()
    }
    assert got == {k: tuple(v) for k, v in hist.items()}


def test_time_to_first_purchase_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    first_seen = {}
    first_buy = {}
    for r in ev:
        d = r.ts.date()
        if r.user_id not in first_seen or d < first_seen[r.user_id]:
            first_seen[r.user_id] = d
        if r.event_type == "purchase" and (
            r.user_id not in first_buy or d < first_buy[r.user_id]
        ):
            first_buy[r.user_id] = d
    gaps = sorted(
        (first_buy[u] - first_seen[u]).days for u in first_buy
    )
    n = len(gaps)
    row = QUERIES["olap_time_to_first_purchase"](spark, sf_small).collect()[0]
    assert (row.n_converting_users, row.n_users) == (n, len(first_seen))
    assert (row.min_days, row.max_days) == (gaps[0], gaps[-1])
    assert row.med2_days == gaps[(n - 1) // 2] + gaps[n // 2]


def test_birthday_collisions_match_python(spark, sf_small):
    import hashlib
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [r.doc_id for r in load(spark, sf_small, "documents").select("doc_id").collect()]
    buckets = Counter(
        int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) for i in ids
    )
    n = len(ids)
    pairs2 = sum(v * (v - 1) for v in buckets.values())
    row = QUERIES["stats_birthday_collision_check"](spark, sf_small).collect()[0]
    assert (row.n_items, row.occupied, row.max_bucket) == (
        n, len(buckets), max(buckets.values())
    )
    assert row.observed_pairs == pairs2 // 2
    assert abs(row.expected_pairs - n * (n - 1) / 512) < 1e-5
    assert abs(row.collision_ratio - pairs2 * 256 / (n * (n - 1))) < 1e-9


def test_mann_kendall_matches_python(spark, sf_small):
    import datetime
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    cnt = defaultdict(int)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29 and r.event_type == "click":
            cnt[d] += 1
    days = sorted(cnt)
    xs = [cnt[d] for d in days]
    n = len(xs)
    S = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    sd = math.sqrt(var18 / 18.0)
    z = (S - 1) / sd if S > 0 else (S + 1) / sd if S < 0 else 0.0
    row = QUERIES["stats_mann_kendall"](spark, sf_small).collect()[0]
    assert (row.s, row.n, row.var18) == (S, n, var18)
    assert abs(row.z_stat - z) < 1e-9
    assert row.trend_05 == (abs(z) > 1.96)


def test_degree_h_index_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES

    edges = _py_cooccur_edges(spark, sf_small)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    ds = sorted(deg.values(), reverse=True)
    h = max(
        (rk for rk, d in enumerate(ds, start=1) if d >= rk), default=0
    )
    row = QUERIES["graph_degree_h_index"](spark, sf_small).collect()[0]
    assert row.h_index == h
    assert row.n_nodes == len(deg)
    assert row.max_degree == max(deg.values())
    assert row.n_at_h == sum(1 for d in deg.values() if d >= h)


def test_wav_dc_offset_matches_python(spark, sf_small):
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [r.doc_id for r in load(spark, sf_small, "documents").select("doc_id").collect()]
    got = {
        r.media_id: (r.n_frames, r.offset_sum, r.dc_offset_milli,
                     r.offset_flagged)
        for r in QUERIES["multimodal_wav_dc_offset"](spark, sf_small).collect()
    }
    for mid in ids[:100]:
        nf = mid % 96 + 32
        ks = b"".join(
            hashlib.md5(f"{mid}:wav:{b}".encode()).digest()
            for b in range((nf + 15) // 16)
        )[:nf]
        osum = sum(v - 128 for v in ks)
        # Spark/DuckDB integer div truncates toward zero; python floors
        q, r_ = divmod(osum * 1000, nf)
        trunc = q if r_ == 0 or osum >= 0 else q + 1
        assert got[mid][0] == nf
        assert got[mid][1] == osum, mid
        assert got[mid][2] == trunc, mid
        assert got[mid][3] == (abs(osum / nf) > 8)


def test_bh_fdr_matches_python(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate", "o_orderpriority"
    ).collect()
    cnat = {
        r.c_custkey: r.c_nationkey
        for r in load(spark, sf_small, "customer").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n1, x1, n2, x2
    for r in o:
        d = r.o_orderdate
        if not (d.year == 1995):
            continue
        nat = cnat[r.o_custkey]
        hi = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        if (d.month, d.day) < (7, 1):
            agg[nat][0] += 1
            agg[nat][1] += hi
        else:
            agg[nat][2] += 1
            agg[nat][3] += hi
    pvals = {}
    for nat, (n1, x1, n2, x2) in agg.items():
        if n1 == 0 or n2 == 0:
            continue
        pooled = (x1 + x2) / (n1 + n2)
        z = (x1 / n1 - x2 / n2) / math.sqrt(
            pooled * (1 - pooled) * (1 / n1 + 1 / n2)
        )
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        p = (
            0.254829592 * t
            - 0.284496736 * t * t
            + 1.421413741 * t**3
            - 1.453152027 * t**4
            + 1.061405429 * t**5
        ) * math.exp(-x * x)
        pvals[nat] = (round(p, 12), z, n1 + n2)
    m = len(pvals)
    order = sorted(pvals, key=lambda nat: (pvals[nat][0], nat))
    k = max(
        (i for i, nat in enumerate(order, 1)
         if pvals[nat][0] <= i * 0.10 / m),
        default=0,
    )
    got = {
        r.nation: r
        for r in QUERIES["stats_bh_fdr"](spark, sf_small).collect()
    }
    assert set(got) == set(pvals)
    for i, nat in enumerate(order, 1):
        r = got[nat]
        assert r.p_rank == i
        assert abs(r.p_value - pvals[nat][0]) < 1e-12
        assert abs(r.z_stat - pvals[nat][1]) < 1e-8
        assert r.n_orders == pvals[nat][2]
        assert r.rejected == (i <= k)


def _py_daily_grid(spark, sf):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ev = load(spark, sf, "events").select("ts", "event_type").collect()
    cnt = defaultdict(int)
    types = set()
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            cnt[(r.event_type, d)] += 1
            types.add(r.event_type)
    return {
        t: [cnt.get((t, d), 0) for d in range(30)] for t in sorted(types)
    }


def test_wilcoxon_signed_rank_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    ds = [
        c - v
        for c, v in zip(grid["click"], grid["view"])
        if c != v
    ]
    n = len(ds)
    absd = sorted(abs(d) for d in ds)
    two_w = 0
    tie = 0
    from collections import Counter

    groups = Counter(absd)
    for d in ds:
        if d > 0:
            less = sum(1 for a in absd if a < abs(d))
            t = groups[abs(d)]
            two_w += 2 * less + t + 1
    tie = sum(t**3 - t for t in groups.values() if t > 1)
    z = (two_w / 2.0 - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1.0) * (2 * n + 1) / 24.0 - tie / 48.0
    )
    row = QUERIES["stats_wilcoxon_signed_rank"](spark, sf_small).collect()[0]
    assert (row.n, row.two_w_plus, row.tie_term) == (n, two_w, tie)
    assert abs(row.z_stat - z) < 1e-9


def test_page_hinkley_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    want = {}
    for t, xs in grid.items():
        s = 0
        m_t = 0.0
        seen = []
        for day, x in enumerate(xs):
            s += x
            m_t += x - s / (day + 1)
            seen.append(m_t)
            ph = max(seen) - m_t
            if t not in want or ph > want[t][0] + 1e-15:
                want[t] = (ph, day)
    got = {
        r.event_type: (r.ph_max, r.argmax_day)
        for r in QUERIES["stats_page_hinkley"](spark, sf_small).collect()
    }
    assert set(got) == set(want)
    for t, (ph, day) in want.items():
        assert abs(got[t][0] - ph) < 1e-8, t
        assert got[t][1] == day, t


def test_rfm_segmentation_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    horizon = datetime.date(1998, 8, 2)
    agg = defaultdict(lambda: [None, 0, 0])  # last, freq, cents
    for r in load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect():
        a = agg[r.o_custkey]
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        a[0] = od if a[0] is None else max(a[0], od)
        a[1] += 1
        a[2] += round(r.o_totalprice * 100)

    def ntile5(keys):
        n = len(keys)
        base, extra = divmod(n, 5)
        out = {}
        i = 0
        for q in range(1, 6):
            size = base + (1 if q <= extra else 0)
            for k in keys[i : i + size]:
                out[k] = q
            i += size
        return out

    custs = sorted(agg)
    rq = ntile5(
        sorted(custs, key=lambda c: ((horizon - agg[c][0]).days, c))
    )
    fq = ntile5(sorted(custs, key=lambda c: (-agg[c][1], c)))
    mq = ntile5(sorted(custs, key=lambda c: (-agg[c][2], c)))
    want = defaultdict(lambda: [0, 0, None])
    for c in custs:
        k = (rq[c], fq[c], mq[c])
        want[k][0] += 1
        want[k][1] += agg[c][2]
        want[k][2] = c if want[k][2] is None else min(want[k][2], c)
    got = {
        (r.r_quintile, r.f_quintile, r.m_quintile): (
            r.n_customers,
            r.segment_cents,
            r.sample_cust,
        )
        for r in QUERIES["olap_rfm_segmentation"](spark, sf_small).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_retention_triangle_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    orders = load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    first = {}
    for r in orders:
        m = (r.o_orderdate.year, r.o_orderdate.month)
        if r.o_custkey not in first or m < first[r.o_custkey]:
            first[r.o_custkey] = m
    cohort_n = defaultdict(int)
    for c, m in first.items():
        if m[0] == 1995:
            cohort_n[m] += 1
    active = set()
    for r in orders:
        m0 = first[r.o_custkey]
        if m0[0] != 1995:
            continue
        age = (r.o_orderdate.year - m0[0]) * 12 + r.o_orderdate.month - m0[1]
        if 0 <= age <= 12:
            active.add((m0, r.o_custkey, age))
    want = defaultdict(int)
    for m0, _, age in active:
        want[(m0, age)] += 1
    got = {
        ((int(r.cohort_month[:4]), int(r.cohort_month[5:7])), r.age_months): (
            r.n_active,
            r.n_cohort,
            r.retention_milli,
        )
        for r in QUERIES["olap_retention_triangle"](spark, sf_small).collect()
    }
    assert set(got) == set(want)
    for k, n in want.items():
        assert got[k][0] == n
        assert got[k][1] == cohort_n[k[0]]
        assert got[k][2] == n * 1000 // cohort_n[k[0]]


def test_psi_drift_matches_python(spark, sf_small):
    import datetime
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    cnt = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_small, "events").select("ts", "event_type").collect():
        d = (r.ts.date() - epoch).days
        if not (0 <= d <= 29):
            continue
        half = 0 if d < 15 else 1
        cnt[("event_type", r.event_type)][half] += 1
        cnt[("hour_of_day", f"{r.ts.hour:02d}")][half] += 1
    tots = defaultdict(lambda: [0, 0, 0])
    for (dim, _), (a, b) in cnt.items():
        t = tots[dim]
        t[0] += a
        t[1] += b
        t[2] += 1
    got = {
        (r.dimension, r.category): (r.n_first, r.n_second, r.psi_term)
        for r in QUERIES["audit_psi_drift"](spark, sf_small).collect()
    }
    assert set(got) == set(cnt)
    for key, (a, b) in cnt.items():
        t1, t2, k = tots[key[0]]
        p = (a + 1) / (t1 + k)
        q = (b + 1) / (t2 + k)
        term = (p - q) * math.log(p / q)
        assert got[key][0] == a and got[key][1] == b
        assert abs(got[key][2] - term) < 1e-10, key


def test_flesch_reading_ease_matches_python(spark, sf_small):
    import re

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_small, "documents").collect()
    }
    got = {
        r.doc_id: (r.n_words, r.n_syllables, r.n_sentences, r.fre)
        for r in QUERIES["text_flesch_reading_ease"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(docs)
    for did, text in docs.items():
        w = len(text.split(" "))
        syl = len(re.findall(r"[aeiouy]+", text.lower()))
        s = max(len(re.findall(r"[.!?]", text)), 1)
        fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert got[did][0] == w and got[did][1] == syl
        assert got[did][2] == s
        assert abs(got[did][3] - fre) < 1e-6, did


def test_yule_k_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    per = defaultdict(Counter)
    for r in load(spark, sf_small, "documents").collect():
        per[r.source].update(r.text.split(" "))
    got = {
        r.source: (r.n_tokens, r.n_types, r.sum_c2, r.yule_k)
        for r in QUERIES["text_yule_k"](spark, sf_small).collect()
    }
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        c2 = sum(c * c for c in cnt.values())
        k = 10000.0 * (c2 - n) / (n * n)
        assert got[src][:3] == (n, len(cnt), c2)
        assert abs(got[src][3] - k) < 1e-8


def test_mattr_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, sf_small, "documents").collect()
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_windows, r.sum_distinct, r.mattr)
        for r in QUERIES["text_mattr_sliding"](spark, sf_small).collect()
    }
    want_ids = {d for d, t in docs.items() if len(t) >= 10}
    assert set(got) == want_ids
    for did in want_ids:
        t = docs[did]
        n = len(t)
        wins = [len(set(t[s : s + 10])) for s in range(n - 9)]
        sd = sum(wins)
        assert got[did][0] == n
        assert got[did][1] == n - 9
        assert got[did][2] == sd, did
        assert abs(got[did][3] - sd / ((n - 9) * 10)) < 1e-12


def test_degree_gini_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES

    deg = Counter()
    for a, b in _py_cooccur_edges(spark, sf_small):
        deg[a] += 1
        deg[b] += 1
    ds = sorted(deg.values())
    n = len(ds)
    rw = sum(i * d for i, d in enumerate(ds, 1))
    gini = 2.0 * rw / (n * sum(ds)) - (n + 1.0) / n
    row = QUERIES["graph_degree_gini"](spark, sf_small).collect()[0]
    assert (row.n_nodes, row.sum_deg, row.rank_weighted) == (
        n,
        sum(ds),
        rw,
    )
    assert abs(row.gini - gini) < 1e-10


def test_harmonic_2hop_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    nbr = defaultdict(set)
    for a, b in _py_cooccur_edges(spark, sf_small):
        nbr[a].add(b)
        nbr[b].add(a)
    got = {
        r.node: (r.n1, r.n2, r.harmonic_sixths)
        for r in QUERIES["graph_harmonic_2hop"](spark, sf_small).collect()
    }
    assert set(got) == set(nbr)
    for u, ns in nbr.items():
        two = set()
        for v in ns:
            two |= nbr[v]
        two -= ns
        two.discard(u)
        assert got[u] == (
            len(ns),
            len(two),
            6 * len(ns) + 3 * len(two),
        ), u


def test_avg_neighbor_degree_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    nbr = defaultdict(list)
    for a, b in _py_cooccur_edges(spark, sf_small):
        nbr[a].append(b)
        nbr[b].append(a)
    deg = {u: len(v) for u, v in nbr.items()}
    per = defaultdict(lambda: [set(), 0, 0])
    for u, ns in nbr.items():
        k = deg[u]
        per[k][0].add(u)
        per[k][1] += len(ns)
        per[k][2] += sum(deg[v] for v in ns)
    got = {
        r.degree_class: (
            r.n_nodes,
            r.n_edge_ends,
            r.sum_neighbor_deg,
            r.knn_k,
        )
        for r in QUERIES["graph_avg_neighbor_degree"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(per)
    for k, (nodes, ends, snd) in per.items():
        assert got[k][:3] == (len(nodes), ends, snd)
        assert abs(got[k][3] - snd / ends) < 1e-10


def test_goertzel_weekly_power_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    got = {
        r.event_type: (r.total, r.weekly_amplitude_ratio)
        for r in QUERIES["ts_goertzel_weekly_power"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(grid)
    for t, xs in grid.items():
        c = sum(
            x * math.cos(2 * math.pi * i / 7) for i, x in enumerate(xs)
        )
        s = sum(
            x * math.sin(2 * math.pi * i / 7) for i, x in enumerate(xs)
        )
        total = sum(xs)
        amp = math.sqrt(c * c + s * s) / total
        assert got[t][0] == total
        assert abs(got[t][1] - amp) < 1e-6, t


def test_spc_western_electric_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    want = {}
    for t, xs in grid.items():
        n = len(xs)
        mu = sum(xs) / n
        sigma = math.sqrt(sum(x * x for x in xs) / n - mu * mu)
        up = lambda k, x: x > mu + k * sigma
        dn = lambda k, x: x < mu - k * sigma
        # r13: mu/sigma from the unfaulted baseline, rules on the
        # deterministically faulted monitored stream (see the query)
        ms = [
            x * 4 if d % 11 == 7 else x // 4 if d % 13 == 9 else x
            for d, x in enumerate(xs)
        ]
        for d, x in enumerate(ms):
            w3 = ms[max(0, d - 2) : d + 1]
            w5 = ms[max(0, d - 4) : d + 1]
            w8 = ms[max(0, d - 7) : d + 1]
            r1 = up(3, x) or dn(3, x)
            r2 = (
                sum(up(2, v) for v in w3) >= 2
                or sum(dn(2, v) for v in w3) >= 2
            )
            r3 = (
                sum(up(1, v) for v in w5) >= 4
                or sum(dn(1, v) for v in w5) >= 4
            )
            r4 = (
                sum(v > mu for v in w8) == 8
                or sum(v < mu for v in w8) == 8
            )
            if r1 or r2 or r3 or r4:
                want[(t, d)] = (x, r1, r2, r3, r4)
    got = {
        (r.event_type, r.day): (r.n, r.rule1, r.rule2, r.rule3, r.rule4)
        for r in QUERIES["ts_spc_western_electric"](
            spark, sf_small
        ).collect()
    }
    assert got == want


def test_tost_equivalence_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    got = {
        r.event_type: r
        for r in QUERIES["stats_tost_equivalence"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(grid)
    for t, xs in grid.items():
        a, b = xs[:15], xs[15:]
        m1, m2 = sum(a) / 15, sum(b) / 15
        v1 = (sum(x * x for x in a) - sum(a) ** 2 / 15) / 14
        v2 = (sum(x * x for x in b) - sum(b) ** 2 / 15) / 14
        margin = 0.1 * (sum(xs) / 30)
        se = math.sqrt(v1 / 15 + v2 / 15)
        t_lo = (m1 - m2 + margin) / se
        t_hi = (m1 - m2 - margin) / se
        r = got[t]
        assert abs(r.mean_h1 - m1) < 1e-8
        assert abs(r.mean_h2 - m2) < 1e-8
        assert abs(r.t_lower - t_lo) < 1e-8
        assert abs(r.t_upper - t_hi) < 1e-8
        assert r.equivalent == (t_lo > 1.645 and t_hi < -1.645)


def _py_sample_pairs(spark, sf, k=100):
    import hashlib

    from report_worker_spark.plans.tables import load

    rows = load(spark, sf, "embeddings").collect()
    base = {
        r.vec_id: (
            r.label,
            [round(float(x) * 256) for x in r.embedding],
        )
        for r in rows
    }
    sample = sorted(
        base,
        key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
    )[:k]
    out = []
    for q in sample:
        qlab, qa = base[q]
        for n, (nlab, nv) in base.items():
            if n == q:
                continue
            d2 = sum((a - b) * (a - b) for a, b in zip(qa, nv))
            out.append((q, qlab, n, nlab, d2))
    return base, sample, out


def test_same_label_auc_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    _, _, pairs = _py_sample_pairs(spark, sf_small)
    same = sorted(d for _, ql, _, nl, d in pairs if ql == nl)
    diff = sorted(d for _, ql, _, nl, d in pairs if ql != nl)
    import bisect

    two_u = 0
    for d in same:
        lo = bisect.bisect_left(diff, d)
        hi = bisect.bisect_right(diff, d)
        two_u += 2 * lo + (hi - lo)
    auc = 1.0 - two_u / (2.0 * len(same) * len(diff))
    row = QUERIES["emb_same_label_auc"](spark, sf_small).collect()[0]
    assert (row.n_same, row.n_diff, row.two_u) == (
        len(same),
        len(diff),
        two_u,
    )
    assert abs(row.same_label_auc - auc) < 1e-12


def test_nn_margin_audit_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    _, _, pairs = _py_sample_pairs(spark, sf_small)
    mins = defaultdict(lambda: [None, None])
    for q, ql, _, nl, d in pairs:
        m = mins[(q, ql)]
        i = 0 if ql == nl else 1
        m[i] = d if m[i] is None else min(m[i], d)
    want = {
        k: (m[0], m[1], m[1] < m[0])
        for k, m in mins.items()
        if m[0] is not None and m[1] is not None
    }
    got = {
        (r.vec_id, r.label): (
            r.min_same_d2,
            r.min_other_d2,
            r.nn_violation,
        )
        for r in QUERIES["emb_nn_margin_audit"](spark, sf_small).collect()
    }
    assert got == want


def test_cosine_anisotropy_matches_python(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    base, sample, _ = _py_sample_pairs(spark, sf_small)
    want = defaultdict(lambda: [0, 0])
    for q in sample:
        qa = base[q][1]
        daa = sum(x * x for x in qa)
        for n, (_, nv) in base.items():
            if n == q:
                continue
            dab = sum(a * b for a, b in zip(qa, nv))
            dbb = sum(x * x for x in nv)
            cm = math.floor(1000.0 * dab / math.sqrt(daa * dbb))
            b = math.floor(cm / 100)
            want[b][0] += 1
            want[b][1] += cm
    got = {
        r.cos_bucket: (r.n_pairs, r.sum_cos_milli)
        for r in QUERIES["emb_cosine_anisotropy_hist"](
            spark, sf_small
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_session_conversion_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    by_user = defaultdict(list)
    for r in load(spark, sf_small, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect():
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    per = []
    for u, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        cur = None
        for ts, _, et in evs:
            if cur is None or (ts - cur[0]).total_seconds() >= 1800:
                if cur is not None:
                    per.append(cur[1:])
                cur = [ts, 0, 0]
            cur[0] = ts
            cur[1] += 1
            cur[2] = max(cur[2], et == "purchase")
        if cur is not None:
            per.append(cur[1:])
    want = defaultdict(lambda: [0, 0])
    for n, conv in per:
        b = "1" if n == 1 else "2" if n == 2 else "3-5" if n <= 5 else "6+"
        want[b][0] += 1
        want[b][1] += conv
    got = {
        r.depth_bucket: (r.n_sessions, r.n_converting, r.conversion_milli)
        for r in QUERIES["olap_session_conversion_by_depth"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(want)
    for b, (ns, nc) in want.items():
        assert got[b] == (ns, nc, nc * 1000 // ns), b


def test_cvm_test_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    a, b = [], []
    for r in load(spark, sf_small, "events").select(
        "event_type", "value"
    ).collect():
        if r.event_type == "click":
            a.append(r.value)
        elif r.event_type == "view":
            b.append(r.value)
    n, m = len(a), len(b)
    combined = sorted(
        [(v, 0) for v in a] + [(v, 1) for v in b], key=lambda p: p[0]
    )
    # min-rank on ties
    ranks = {}
    for idx, (v, _) in enumerate(combined, 1):
        ranks.setdefault(v, idx)
    da = sum(
        (ranks[v] - i) ** 2 for i, v in enumerate(sorted(a), 1)
    )
    db = sum(
        (ranks[v] - j) ** 2 for j, v in enumerate(sorted(b), 1)
    )
    u = n * da + m * db
    t = u / (n * m * (n + m)) - (4.0 * n * m - 1) / (6.0 * (n + m))
    row = QUERIES["stats_cvm_test"](spark, sf_small).collect()[0]
    assert (row.n, row.m, row.u_stat) == (n, m, u)
    assert abs(row.t_stat - t) < 1e-9


def test_dunn_index_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    _, _, pairs = _py_sample_pairs(spark, sf_small)
    same = [d for _, ql, _, nl, d in pairs if ql == nl]
    cross = [d for _, ql, _, nl, d in pairs if ql != nl]
    row = QUERIES["stats_dunn_index"](spark, sf_small).collect()[0]
    assert row.min_cross_d2 == min(cross)
    assert row.max_same_d2 == max(same)
    assert abs(row.dunn_sq - min(cross) / max(same)) < 1e-12


def test_topk_coverage_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    cnt = Counter()
    for r in load(spark, sf_small, "documents").collect():
        cnt.update(w for w in r.text.split(" ") if w)
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r.k: (r.n_types_used, r.cum_tokens, r.coverage_milli)
        for r in QUERIES["text_topk_coverage_curve"](
            spark, sf_small
        ).collect()
    }
    for k in (1, 2, 5, 10, 20, 50, 100, 500):
        used = min(k, len(ranked))
        cum = sum(c for _, c in ranked[:used])
        assert got[k] == (used, cum, cum * 1000 // total), k


def test_heaps_bigram_fit_matches_python(spark, sf_small):
    import hashlib
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, sf_small, "documents").collect()
    }
    order = sorted(
        docs,
        key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
    )
    n_docs = len(order)
    cps = sorted({(n_docs * k + 9) // 10 for k in range(1, 11)})
    seen = set()
    firsts = {}
    cum_n = 0
    cums = {}
    for p, did in enumerate(order, 1):
        t = docs[did]
        cum_n += len(t)
        cums[p] = cum_n
        for i in range(len(t) - 1):
            g = t[i] + " " + t[i + 1]
            if g not in seen:
                seen.add(g)
                firsts[g] = p
    xs, ys = [], []
    for cp in cps:
        v = sum(1 for fp in firsts.values() if fp <= cp)
        xs.append(round(math.log(cums[cp]), 12))
        ys.append(round(math.log(v), 12))
    n = len(xs)
    sx, sy = sum(sorted(xs)), sum(sorted(ys))
    sxy = sum(sorted(x * y for x, y in zip(xs, ys)))
    sxx = sum(sorted(x * x for x in xs))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk = (sy - beta * sx) / n
    row = QUERIES["text_heaps_bigram_fit"](spark, sf_small).collect()[0]
    assert row.n == n
    assert abs(row.heaps_beta - beta) < 1e-8
    assert abs(row.heaps_lnk - lnk) < 1e-8


def test_png_quadrant_stats_matches_python(spark, sf_small):
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [
        r.doc_id
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
        if r.doc_id % 2 == 0
    ]
    got = {
        r.media_id: (r.width, r.height, r.q_tl, r.q_tr, r.q_bl, r.q_br)
        for r in QUERIES["multimodal_png_quadrant_stats"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(ids)
    for mid in ids[:50]:
        w, h = mid % 31 + 2, mid % 23 + 2
        n = w * h * 3
        ks = b"".join(
            hashlib.md5(f"{mid}:{b}".encode()).digest()
            for b in range((n + 15) // 16)
        )[:n]
        q = [0, 0, 0, 0]
        for gi, v in enumerate(ks):
            pi = gi // 3
            r_, c_ = pi // w, pi % w
            idx = (0 if r_ < h // 2 else 2) + (0 if c_ < w // 2 else 1)
            q[idx] += v
        assert got[mid] == (w, h, q[0], q[1], q[2], q[3]), mid


def test_rolling_distinct_users_matches_python(spark, sf_small):
    import datetime

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ud = set()
    for r in load(spark, sf_small, "events").select("user_id", "ts").collect():
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            ud.add((r.user_id, d))
    got = {
        r.day: r.dau_7d
        for r in QUERIES["ts_rolling_distinct_users"](
            spark, sf_small
        ).collect()
    }
    for day in range(30):
        users = {u for u, d in ud if day - 6 <= d <= day}
        if users:
            assert got[day] == len(users), day


def test_open_order_aging_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    horizon = datetime.date(1998, 8, 2)
    want = defaultdict(lambda: [0, 0, None, None])
    for r in load(spark, sf_small, "orders").collect():
        if r.o_orderstatus != "O":
            continue
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        age = (horizon - od).days
        b = (
            "0-1y" if age < 365
            else "1-2y" if age < 730
            else "2-4y" if age < 1460
            else "4y+"
        )
        w = want[b]
        w[0] += 1
        w[1] += round(r.o_totalprice * 100)
        w[2] = age if w[2] is None else min(w[2], age)
        w[3] = age if w[3] is None else max(w[3], age)
    got = {
        r.age_bucket: (
            r.n_orders,
            r.open_cents,
            r.min_age_days,
            r.max_age_days,
        )
        for r in QUERIES["olap_open_order_aging"](spark, sf_small).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_chatterjee_xi_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    xs, ys = grid["click"], grid["view"]
    days = list(range(30))
    order = sorted(days, key=lambda d: (xs[d], d))
    ranks = {d: sum(1 for e in days if ys[e] <= ys[d]) for d in days}
    sad = sum(
        abs(ranks[order[i + 1]] - ranks[order[i]])
        for i in range(len(order) - 1)
    )
    n = len(days)
    xi = 1.0 - 3.0 * sad / (n * n - 1)
    row = QUERIES["stats_chatterjee_xi"](spark, sf_small).collect()[0]
    assert (row.n, row.sum_abs_dr) == (n, sad)
    assert abs(row.xi - xi) < 1e-12


def test_join_fanout_forecast_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    nl = Counter(
        r.o_orderkey
        for r in load(spark, sf_small, "orders").select("o_orderkey").collect()
    )
    nr = Counter(
        r.l_orderkey
        for r in load(spark, sf_small, "lineitem").select("l_orderkey").collect()
    )
    keys = set(nl) | set(nr)
    prods = {k: nl.get(k, 0) * nr.get(k, 0) for k in keys}
    worst = max(prods.values())
    row = QUERIES["audit_join_fanout_forecast"](spark, sf_small).collect()[0]
    assert row.left_rows == sum(nl.values())
    assert row.right_rows == sum(nr.values())
    assert row.n_keys == len(keys)
    assert row.forecast_join_rows == sum(prods.values())
    assert row.worst_key_rows == worst
    assert row.worst_key == min(k for k, p in prods.items() if p == worst)


def test_max_drawdown_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    daily = defaultdict(int)
    for r in load(spark, sf_small, "orders").collect():
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        if od.year == 1995:
            daily[od] += round(r.o_totalprice * 100)
    c = 0
    peak = None
    dds = []
    for day in sorted(daily):
        c += daily[day]
        peak = c if peak is None else max(peak, c)
        dds.append((day, peak - c))
    mx = max(d for _, d in dds)
    trough = min(day for day, d in dds if d == mx)
    n = sum(1 for _, d in dds if d == mx)
    row = QUERIES["ts_max_drawdown"](spark, sf_small).collect()[0]
    assert row.max_drawdown_cents == mx
    td = row.trough_day
    td = td.date() if hasattr(td, "date") and not isinstance(td, datetime.date) else td
    assert str(td)[:10] == str(trough)
    assert row.n_days == n


def test_pack_straddle_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    toks = {
        r.doc_id: len(r.text.split())
        for r in load(spark, sf_small, "documents").collect()
    }
    before = 0
    want = defaultdict(lambda: [0, 0, 0, 0])
    for did in sorted(toks):
        n = toks[did]
        pid, off = before // 2048, before % 2048
        w = want[pid]
        w[0] += 1
        if off + n > 2048:
            w[1] += 1
            w[2] += off + n - 2048
        w[3] += n
        before += n
    got = {
        r.pack_id: (
            r.n_docs_starting,
            r.n_straddling,
            r.straddle_tokens,
            r.tokens_starting,
        )
        for r in QUERIES["curation_pack_straddle_audit"](
            spark, sf_small
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_price_volume_bridge_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    brand = {
        r.p_partkey: r.p_brand
        for r in load(spark, sf_small, "part").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])  # q0 r0 q1 r1
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect():
        sd = (
            r.l_shipdate.date()
            if isinstance(r.l_shipdate, datetime.datetime)
            else r.l_shipdate
        )
        if sd.year not in (1995, 1996):
            continue
        a = agg[brand[r.l_partkey]]
        o = 0 if sd.year == 1995 else 2
        a[o] += int(r.l_quantity)
        a[o + 1] += round(r.l_extendedprice * 100)
    got = {
        r.brand: r
        for r in QUERIES["olap_price_volume_bridge"](
            spark, sf_small
        ).collect()
    }
    want = {b: a for b, a in agg.items() if a[0] and a[2]}
    assert set(got) == set(want)
    for b, (q0, r0, q1, r1) in want.items():
        g = got[b]
        assert (g.q0, g.r0, g.q1, g.r1) == (q0, r0, q1, r1)
        assert g.delta_cents == r1 - r0
        ve = (q1 - q0) * (r0 / q0)
        pe = q1 * (r1 / q1 - r0 / q0)
        assert abs(g.volume_effect_cents - ve) < 1e-4
        assert abs(g.price_effect_cents - pe) < 1e-4
        # the two effects reconstruct the delta
        assert abs((ve + pe) - (r1 - r0)) < 1e-4


def test_prefix_clusters_matches_python(spark, sf_small):
    import hashlib
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    groups = defaultdict(list)
    for r in load(spark, sf_small, "documents").collect():
        groups[r.text[:64]].append(r.doc_id)
    want = {
        hashlib.md5(p.encode()).hexdigest(): (len(ids), min(ids))
        for p, ids in groups.items()
        if len(ids) > 1
    }
    got = {
        r.prefix_key: (r.n_docs, r.canonical_id)
        for r in QUERIES["dedup_prefix_clusters"](spark, sf_small).collect()
    }
    assert got == want


def test_kendall_w_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    m, n = len(grid), 30
    two_r = {}
    tt = 0
    for t, xs in grid.items():
        cnt = Counter(xs)
        tt += sum(c**3 - c for c in cnt.values() if c > 1)
        for d in range(n):
            less = sum(1 for v in xs if v < xs[d])
            two_r[(t, d)] = 2 * less + cnt[xs[d]] + 1
    D = [sum(two_r[(t, d)] for t in grid) for d in range(n)]
    num = 3 * (n * sum(x * x for x in D) - sum(D) ** 2)
    den = n * (m * m * (n**3 - n) - m * tt)
    row = QUERIES["stats_kendall_w"](spark, sf_small).collect()[0]
    assert (row.m, row.n, row.w_num, row.w_den) == (m, n, num, den)
    assert abs(row.kendall_w - num / den) < 1e-12


def test_fof_recommendations_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    nbr = defaultdict(set)
    for a, b in _py_cooccur_edges(spark, sf_small):
        nbr[a].add(b)
        nbr[b].add(a)
    want = {}
    for u, ns in nbr.items():
        common = Counter()
        for v in ns:
            for w in nbr[v]:
                if w != u and w not in ns:
                    common[w] += 1
        top = sorted(common.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (rec, c) in enumerate(top, 1):
            want[(u, rec)] = (c, rk)
    got = {
        (r.node, r.rec): (r.common, r.rk)
        for r in QUERIES["graph_fof_recommendations"](
            spark, sf_small
        ).collect()
    }
    assert got == want


def test_xyz_classification_matches_python(spark, sf_small):
    import datetime
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    monthly = defaultdict(int)
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect():
        sd = (
            r.l_shipdate.date()
            if isinstance(r.l_shipdate, datetime.datetime)
            else r.l_shipdate
        )
        if sd.year == 1996:
            monthly[(r.l_partkey, sd.month)] += int(r.l_quantity)
    per = defaultdict(list)
    for (part, _), q in monthly.items():
        per[part].append(q)
    want = Counter()
    for part, qs in per.items():
        # r13: zero-demand months count as zeros in the CV (they add
        # nothing to s/s2 but n stays 12) — no all-months-required gate
        s, s2 = sum(qs), sum(q * q for q in qs)
        disp = 12 * s2 - s * s
        if 4 * disp <= s * s:
            want["X"] += 1
        elif disp <= s * s:
            want["Y"] += 1
        else:
            want["Z"] += 1
    got = {
        r.xyz: r.n_parts
        for r in QUERIES["olap_xyz_classification"](spark, sf_small).collect()
    }
    assert got == dict(want)


def test_wav_goertzel_matches_python(spark, sf_small):
    import hashlib
    import math

    from report_worker_spark.functions.multimodal import (
        G32_COS_Q,
        G32_SIN_Q,
        GOERTZEL_BINS,
    )
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [
        r.doc_id
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
    ]
    got = {
        r.media_id: (r.n_frames, r.amp_k1, r.amp_k2, r.amp_k4, r.amp_k8)
        for r in QUERIES["multimodal_wav_goertzel_bins"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(ids)
    for mid in ids[:50]:
        nf = mid % 96 + 32
        ks = b"".join(
            hashlib.md5(f"{mid}:wav:{b}".encode()).digest()
            for b in range(2)
        )[:32]
        sm = [v - 128 for v in ks]
        assert got[mid][0] == nf
        for i, k in enumerate(GOERTZEL_BINS):
            c = sum(v * w for v, w in zip(sm, G32_COS_Q[k]))
            s = sum(v * w for v, w in zip(sm, G32_SIN_Q[k]))
            amp = math.sqrt(c * c + s * s) / (128 * 32 * 8192)
            assert abs(got[mid][1 + i] - amp) < 1e-9, (mid, k)


def test_dedup_quality_confusion_matches_python(spark, sf_small):
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "documents").select(
        "text", "n_chars"
    ).collect()
    tc = Counter(r.text for r in rows)
    a = b = c = d = 0
    for r in rows:
        hi, dup = r.n_chars >= 300, tc[r.text] > 1
        if hi and dup:
            a += 1
        elif hi:
            b += 1
        elif dup:
            c += 1
        else:
            d += 1
    lor = math.log(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)))
    row = QUERIES["curation_dedup_quality_confusion"](
        spark, sf_small
    ).collect()[0]
    assert (row.hi_dup, row.hi_unique, row.lo_dup, row.lo_unique) == (
        a,
        b,
        c,
        d,
    )
    assert abs(row.log_odds_ratio - lor) < 1e-8


def test_triangle_participation_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    edges = set()
    nbr = defaultdict(set)
    for a, b in _py_cooccur_edges(spark, sf_small):
        edges.add((a, b))
        nbr[a].add(b)
        nbr[b].add(a)
    per = Counter()
    for a, b in edges:
        for c in nbr[a] & nbr[b]:
            if c > b:
                per[a] += 1
                per[b] += 1
                per[c] += 1
    hist = Counter(per.get(n, 0) for n in nbr)
    got = {
        r.tri_count: r.n_nodes
        for r in QUERIES["graph_triangle_participation"](
            spark, sf_small
        ).collect()
    }
    assert got == dict(hist)


def test_csv_malformed_rate_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    agg = defaultdict(lambda: [0, 0, 0])
    for r in load(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type", "value"
    ).collect():
        bad = r.event_id % 7 == 0
        a = agg[r.event_type]
        a[0] += 1
        if bad:
            a[1] += 1
        else:
            a[2] += round(r.value * 100)
    got = {
        r.event_type: (
            r.n_msgs,
            r.n_malformed,
            r.recovered_cents,
            r.malformed_rate,
        )
        for r in QUERIES["s3_csv_malformed_rate"](spark, sf_small).collect()
    }
    assert set(got) == set(agg)
    for t, (n, m, cents) in agg.items():
        assert got[t][:3] == (n, m, cents), t
        assert abs(got[t][3] - m / n) < 1e-12


def test_eb_shrinkage_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    brand = {
        r.p_partkey: r.p_brand
        for r in load(spark, sf_small, "part").collect()
    }
    per = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_returnflag"
    ).collect():
        a = per[brand[r.l_partkey]]
        a[0] += 1
        a[1] += r.l_returnflag == "R"
    ps = {b: k / n for b, (n, k) in per.items()}
    nb = len(ps)
    m1 = sum(sorted(ps.values())) / nb
    sp = sum(sorted(ps.values()))
    sp2 = sum(sorted(p * p for p in ps.values()))
    v = (sp2 - sp * sp / nb) / nb
    ab_sum = m1 * (1.0 - m1) / v - 1.0
    got = {
        r.brand: r
        for r in QUERIES["stats_eb_shrinkage"](spark, sf_small).collect()
    }
    assert set(got) == set(per)
    for b, (n, k) in per.items():
        g = got[b]
        assert (g.n_items, g.n_returns, g.raw_milli) == (
            n,
            k,
            k * 1000 // n,
        )
        assert abs(
            g.shrunk_rate - (k + m1 * ab_sum) / (n + ab_sum)
        ) < 1e-7, b


def test_dau_wau_stickiness_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    epoch = datetime.date(2024, 1, 1)
    ud = set()
    for r in load(spark, sf_small, "events").select("user_id", "ts").collect():
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            ud.add((r.user_id, d))
    by_day = defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    got = {
        r.day: (r.dau, r.wau, r.stickiness_milli)
        for r in QUERIES["olap_dau_wau_stickiness"](
            spark, sf_small
        ).collect()
    }
    for day in range(30):
        dau = len(by_day.get(day, set()))
        wau = len(
            set().union(
                *(by_day.get(d, set()) for d in range(day - 6, day + 1))
            )
        )
        if dau:
            assert got[day] == (dau, wau, dau * 1000 // wau), day


def test_soft_dedup_weights_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    tc = Counter(r.text for r in rows)
    want = defaultdict(lambda: [0, 0, 0, None])
    for r in rows:
        c = tc[r.text]
        w = want[r.source]
        w[0] += 1
        if c > 1:
            w[1] += 1
            w[3] = r.doc_id if w[3] is None else min(w[3], r.doc_id)
        w[2] += 1000 // c
    got = {
        r.source: (
            r.n_docs,
            r.n_dup_members,
            r.effective_milli,
            r.sample_dup_doc,
        )
        for r in QUERIES["curation_soft_dedup_weights"](
            spark, sf_small
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_part_adoption_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    firsts = {}
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate"
    ).collect():
        sd = (
            r.l_shipdate.date()
            if isinstance(r.l_shipdate, datetime.datetime)
            else r.l_shipdate
        )
        m = (sd.year, sd.month)
        if r.l_partkey not in firsts or m < firsts[r.l_partkey]:
            firsts[r.l_partkey] = m
    n_parts = load(spark, sf_small, "part").count()
    monthly = defaultdict(int)
    for m in firsts.values():
        monthly[m] += 1
    got = {
        r.month: (r.n_new, r.cum_adopted, r.coverage_milli)
        for r in QUERIES["olap_part_adoption_curve"](
            spark, sf_small
        ).collect()
    }
    cum = 0
    for m in sorted(monthly):
        cum += monthly[m]
        key = f"{m[0]:04d}-{m[1]:02d}"
        assert got[key] == (monthly[m], cum, cum * 1000 // n_parts), m


def test_sequence_inversions_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import hashlib

    def seq_id(eid):
        # r13 fault injection: md5-seeded ~3% of events report a
        # stale sequence id (see the query's docstring)
        h = int(hashlib.md5(str(eid).encode()).hexdigest()[:2], 16)
        return eid - 997 if h < 8 else eid

    by_user = defaultdict(list)
    for r in load(spark, sf_small, "events").select(
        "user_id", "ts", "event_id"
    ).collect():
        by_user[r.user_id].append((r.ts, r.event_id, seq_id(r.event_id)))
    want = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        steps = len(evs) - 1
        inv = sum(
            1 for i in range(1, len(evs)) if evs[i][2] < evs[i - 1][2]
        )
        if inv > 0:
            want[u] = (steps, inv, inv * 1000 // steps)
    got = {
        r.user_id: (r.n_steps, r.n_inversions, r.inversion_milli)
        for r in QUERIES["audit_sequence_inversions"](
            spark, sf_small
        ).collect()
    }
    assert got == want


def test_hodges_lehmann_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    diffs = sorted(
        a - b for a in grid["click"] for b in grid["view"]
    )
    n = len(diffs)
    lo = diffs[(n + 1) // 2 - 1]
    hi = diffs[n // 2]
    row = QUERIES["stats_hodges_lehmann"](spark, sf_small).collect()[0]
    assert row.n_pairs == n
    assert row.two_hl == lo + hi
    assert abs(row.hl_shift - (lo + hi) / 2.0) < 1e-9


def test_edge_embeddedness_matches_python(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    edges = set()
    nbr = defaultdict(set)
    for a, b in _py_cooccur_edges(spark, sf_small):
        edges.add((a, b))
        nbr[a].add(b)
        nbr[b].add(a)
    hist = Counter(len(nbr[a] & nbr[b]) for a, b in edges)
    got = {
        r.embeddedness: r.n_edges
        for r in QUERIES["graph_edge_embeddedness"](
            spark, sf_small
        ).collect()
    }
    assert got == dict(hist)


def test_turning_points_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    got = {
        r.event_type: (r.n_days, r.t, r.z_stat, r.nonrandom_05)
        for r in QUERIES["ts_turning_points_test"](
            spark, sf_small
        ).collect()
    }
    for t, xs in grid.items():
        n = len(xs)
        tp = sum(
            1
            for i in range(1, n - 1)
            if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
            or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
        )
        z = (tp - 2.0 * (n - 2) / 3) / math.sqrt((16.0 * n - 29) / 90)
        assert got[t][0] == n and got[t][1] == tp
        assert abs(got[t][2] - z) < 1e-9
        assert got[t][3] == (abs(z) > 1.96)


def test_brand_assortativity_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    brand = {
        r.p_partkey: r.p_brand
        for r in load(spark, sf_small, "part").collect()
    }
    edges = _py_cooccur_edges(spark, sf_small)
    m = len(edges)
    trace = sum(1 for a, b in edges if brand[a] == brand[b])
    ends = Counter()
    for a, b in edges:
        ends[brand[a]] += 1
        ends[brand[b]] += 1
    ssq = sum(k * k for k in ends.values())
    num, den = 4 * m * trace - ssq, 4 * m * m - ssq
    row = QUERIES["graph_brand_assortativity"](spark, sf_small).collect()[0]
    assert (row.m, row.trace_cnt, row.sum_ends_sq) == (m, trace, ssq)
    assert (row.r_num, row.r_den) == (num, den)
    assert abs(row.assortativity - num / den) < 1e-12


def test_centroid_mrr_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    base = {
        r.vec_id: (r.label, [round(float(x) * 256) for x in r.embedding])
        for r in rows
    }
    sums = defaultdict(lambda: [0] * 64)
    counts = defaultdict(int)
    for lab, v in base.values():
        counts[lab] += 1
        for i, x in enumerate(v):
            sums[lab][i] += x
    want = defaultdict(lambda: [0, 0])
    for vid, (lab, v) in base.items():
        scores = {
            cl: sum(a * b for a, b in zip(v, sums[cl])) / counts[cl]
            for cl in sums
        }
        order = sorted(scores, key=lambda cl: (-scores[cl], cl))
        r = order.index(lab) + 1
        w = want[lab]
        w[0] += 1
        w[1] += 2520 // r
    got = {
        r.label: (r.n_vecs, r.sum_recip_2520, r.mrr)
        for r in QUERIES["emb_centroid_mrr"](spark, sf_small).collect()
    }
    assert set(got) == set(want)
    for lab, (n, s) in want.items():
        assert got[lab][:2] == (n, s), lab
        assert abs(got[lab][2] - s / (2520.0 * n)) < 1e-9


def test_matthews_corr_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    a = b = c = d = 0
    for r in load(spark, sf_small, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).collect():
        hi = r.o_totalprice >= 150000
        ur = r.o_orderpriority == "1-URGENT"
        if hi and ur:
            a += 1
        elif hi:
            b += 1
        elif ur:
            c += 1
        else:
            d += 1
    num = a * d - b * c
    den = math.sqrt(
        ((a + b) * (a + c)) * ((b + d) * (c + d))
    )
    row = QUERIES["stats_matthews_corr"](spark, sf_small).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.mcc_num) == (a, b, c, d, num)
    assert abs(row.mcc - num / den) < 1e-10


def test_rolling_median_band_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    daily = defaultdict(int)
    for r in load(spark, sf_small, "orders").collect():
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        if datetime.date(1995, 3, 1) <= od < datetime.date(1995, 6, 1):
            daily[od] += round(r.o_totalprice * 100)
    days = sorted(daily)
    got = {}
    for r in QUERIES["ts_rolling_median_band"](spark, sf_small).collect():
        d = r.day
        d = d.date() if hasattr(d, "date") and not isinstance(d, datetime.date) else d
        got[str(d)[:10]] = (
            r.rev,
            r.n_win,
            r.two_median,
            r.win_max,
            r.above_band,
        )
    for i, d in enumerate(days):
        w = sorted(daily[x] for x in days[max(0, i - 6) : i + 1])
        n = len(w)
        two_med = w[(n + 1) // 2 - 1] + w[n // 2]
        assert got[str(d)] == (
            daily[d],
            n,
            two_med,
            w[-1],
            2 * daily[d] > two_med,
        ), d


def test_poisson_etest_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    got = {
        r.day: (r.k1, r.k2, r.z_stat, r.flagged_3sigma)
        for r in QUERIES["stats_poisson_etest_daily"](
            spark, sf_small
        ).collect()
    }
    for d in range(30):
        k1, k2 = grid["click"][d], grid["error"][d]
        if k1 + k2 == 0:
            assert d not in got
            continue
        z = (k1 - k2) / math.sqrt(k1 + k2)
        assert got[d][:2] == (k1, k2)
        assert abs(got[d][2] - z) < 1e-9
        assert got[d][3] == (abs(z) > 3.0)


def test_partition_checksums_matches_python(spark, sf_small):
    import datetime
    import hashlib
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    want = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_small, "orders").collect():
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        if od.year != 1995:
            continue
        key = f"{od.year:04d}-{od.month:02d}"
        h = int(
            hashlib.md5(
                f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}".encode()
            ).hexdigest()[:8],
            16,
        )
        want[key][0] += 1
        want[key][1] += h
    got = {
        r.month: (r.n_rows, r.checksum)
        for r in QUERIES["audit_partition_checksums"](
            spark, sf_small
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_threshold_yield_curve_matches_python(spark, sf_small):
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    shingles = {}
    for r in load(spark, sf_small, "documents").collect():
        t = r.text.strip().split()
        if len(t) >= 3:
            shingles[r.doc_id] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    ids = sorted(shingles)
    hist = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(shingles[a] & shingles[b])
            if not inter:
                continue
            j = inter / (len(shingles[a]) + len(shingles[b]) - inter)
            if j >= 0.5:
                hist[math.floor(j * 10)] += 1
    got = {
        r.jaccard_decile: r.n_pairs
        for r in QUERIES["dedup_threshold_yield_curve"](
            spark, sf_small
        ).collect()
    }
    assert got == dict(hist)


def test_gamma_fit_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    per = defaultdict(lambda: [0, 0, 0])
    for r in load(spark, sf_small, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect():
        c = round(r.o_totalprice)
        # python round() banker-rounds; Spark/DuckDB round half-up
        if abs(r.o_totalprice - int(r.o_totalprice) - 0.5) < 1e-9:
            c = int(r.o_totalprice) + 1
        a = per[r.o_orderpriority]
        a[0] += 1
        a[1] += c
        a[2] += c * c
    got = {
        r.priority: r
        for r in QUERIES["stats_gamma_fit_moments"](spark, sf_small).collect()
    }
    assert set(got) == set(per)
    for pr, (n, s, s2) in per.items():
        m = s / n
        v = (s2 - s * s / n) / n
        g = got[pr]
        assert g.n == n
        assert abs(g.mean_dollars - m) < 1e-4
        assert abs(g.gamma_shape_k - m * m / v) < 1e-6
        assert abs(g.gamma_scale_dollars - v / m) < 1e-4


def test_order_regularity_matches_python(spark, sf_small):
    import datetime
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    by_cust = defaultdict(list)
    for r in load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect():
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        by_cust[r.o_custkey].append((od, r.o_orderkey))
    want = Counter()
    for _, orders in by_cust.items():
        orders.sort()
        gaps = [
            (orders[i][0] - orders[i - 1][0]).days
            for i in range(1, len(orders))
        ]
        if len(gaps) < 3 or sum(gaps) == 0:
            continue
        n, s, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        disp = n * s2 - s * s
        if 4 * disp <= s * s:
            want["steady"] += 1
        elif disp <= s * s:
            want["variable"] += 1
        else:
            want["erratic"] += 1
    got = {
        r.regularity: r.n_customers
        for r in QUERIES["olap_customer_order_regularity"](
            spark, sf_small
        ).collect()
    }
    assert got == dict(want)


def test_gif_index_histogram_matches_python(spark, sf_small):
    import hashlib
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [
        r.doc_id
        for r in load(spark, sf_small, "documents").select("doc_id").collect()
    ]
    got = {
        r.media_id: (
            r.width,
            r.height,
            r.n_pixels,
            r.n_distinct_idx,
            r.mode_idx,
            r.mode_count,
        )
        for r in QUERIES["multimodal_gif_index_histogram"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(ids)
    for mid in ids[:50]:
        w, h = mid % 13 + 4, mid % 11 + 4
        n = w * h
        idxs = []
        for i in range(n):
            hx = hashlib.md5(f"{mid}:gifpix:{i // 16}".encode()).hexdigest()
            idxs.append(int(hx[2 * (i % 16) + 1], 16))
        cnt = Counter(idxs)
        mc = max(cnt.values())
        mi = min(i for i, c in cnt.items() if c == mc)
        assert got[mid] == (w, h, n, len(cnt), mi, mc), mid


def test_youden_sweep_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).collect()
    got = {
        r.threshold: (r.tp, r.fp, r.fn, r.tn, r.youden_j_milli)
        for r in QUERIES["stats_youden_threshold_sweep"](
            spark, sf_small
        ).collect()
    }
    for t in range(50000, 450001, 50000):
        tp = fp = fn = tn = 0
        for r in rows:
            hi = r.o_totalprice >= t
            ur = r.o_orderpriority == "1-URGENT"
            if hi and ur:
                tp += 1
            elif hi:
                fp += 1
            elif ur:
                fn += 1
            else:
                tn += 1
        j = tp * 1000 // (tp + fn) - fp * 1000 // (fp + tn)
        assert got[t] == (tp, fp, fn, tn, j), t


def test_sample_size_planner_matches_python(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rows = load(spark, sf_small, "documents").select(
        "source", "text"
    ).collect()
    tc = Counter(r.text for r in rows)
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        a = per[r.source]
        a[0] += 1
        a[1] += tc[r.text] > 1
    got = {
        r.source: (
            r.n_docs,
            r.n_dups,
            r.dup_milli,
            r.n_required,
            r.sample_sufficient,
        )
        for r in QUERIES["curation_sample_size_planner"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(per)
    for s, (n, d) in per.items():
        p = d / n
        req = math.ceil(9604.0 * p * (1.0 - p))
        assert got[s] == (n, d, d * 1000 // n, req, n >= req), s


def test_winnowing_matches_python(spark, sf_small):
    import hashlib

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = {
        r.doc_id: r.text.strip().split()
        for r in load(spark, sf_small, "documents").collect()
    }
    got = {
        r.doc_id: (r.n_fingerprints, r.n_distinct_fp, r.min_fp)
        for r in QUERIES["dedup_winnowing_fingerprints"](
            spark, sf_small
        ).collect()
    }
    for did, t in docs.items():
        if len(t) < 3:
            assert did not in got
            continue
        hs = [
            hashlib.md5(" ".join(t[i : i + 3]).encode()).hexdigest()
            for i in range(len(t) - 2)
        ]
        if len(hs) < 4:
            assert did not in got
            continue
        sel = set()
        for i in range(len(hs) - 3):
            win = hs[i : i + 4]
            m = min(win)
            # rightmost minimum
            pos = i + 4 - win[::-1].index(m)
            sel.add((pos, m))
        fps = [fp for _, fp in sel]
        assert got[did] == (len(sel), len(set(fps)), min(fps)), did


def test_mix_residual_heatmap_matches_python(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    pri = {
        r.o_orderkey: r.o_orderpriority
        for r in load(spark, sf_small, "orders").collect()
    }
    cells = Counter()
    for r in load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_returnflag"
    ).collect():
        cells[(r.l_returnflag, pri[r.l_orderkey])] += 1
    rows = defaultdict(int)
    colsum = defaultdict(int)
    total = sum(cells.values())
    for (rf, p), c in cells.items():
        rows[rf] += c
        colsum[p] += c
    got = {
        (r.returnflag, r.priority): (r.observed, r.expected, r.pearson_residual)
        for r in QUERIES["olap_mix_residual_heatmap"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(cells)
    gsum = 0.0
    for (rf, p), c in cells.items():
        e = rows[rf] * colsum[p] / total
        res = (c - e) / math.sqrt(e)
        assert got[(rf, p)][0] == c
        assert abs(got[(rf, p)][1] - e) < 1e-4
        assert abs(got[(rf, p)][2] - res) < 1e-7
        gsum += c * math.log(c * total / (rows[rf] * colsum[p]))
    grow = QUERIES["stats_gtest_independence"](spark, sf_small).collect()[0]
    assert grow.n_rows_cat == len(rows)
    assert grow.n_cols_cat == len(colsum)
    assert grow.dof == (len(rows) - 1) * (len(colsum) - 1)
    assert abs(grow.g_stat - 2.0 * gsum) < 1e-4


def test_abc_xyz_matrix_matches_python(spark, sf_small):
    import datetime
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rev = defaultdict(int)
    monthly = defaultdict(int)
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_shipdate", "l_quantity"
    ).collect():
        rev[r.l_partkey] += round(r.l_extendedprice * 100)
        sd = (
            r.l_shipdate.date()
            if isinstance(r.l_shipdate, datetime.datetime)
            else r.l_shipdate
        )
        if sd.year == 1996:
            monthly[(r.l_partkey, sd.month)] += int(r.l_quantity)
    tot = sum(rev.values())
    abc = {}
    cum = 0
    for pk in sorted(rev, key=lambda k: (-rev[k], k)):
        cum += rev[pk]
        abc[pk] = "A" if cum * 5 <= tot * 4 else "B" if cum * 20 <= tot * 19 else "C"
    qs = defaultdict(list)
    for (pk, _), q in monthly.items():
        qs[pk].append(q)
    xyz = {}
    for pk, lst in qs.items():
        # r13: zero-inclusive CV, same as the standalone classifier
        s, s2 = sum(lst), sum(q * q for q in lst)
        d = 12 * s2 - s * s
        xyz[pk] = "X" if 4 * d <= s * s else "Y" if d <= s * s else "Z"
    want = Counter((abc[pk], xyz.get(pk, "Z")) for pk in abc)
    got = {
        (r.abc, r.xyz): r.n_parts
        for r in QUERIES["olap_abc_xyz_matrix"](spark, sf_small).collect()
    }
    assert got == dict(want)


def test_cooks_distance_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    ys = grid["click"]
    xs = list(range(30))
    days = [d for d in xs if True]
    n = len(days)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rs, hs = {}, {}
    for x in xs:
        pred = sy / n + b1 * (x - sx / n)
        rs[x] = ys[x] - pred
        hs[x] = 1.0 / n + n * (x - sx / n) ** 2 / (n * sxx - sx * sx)
    sse = sum(sorted(round(r * r, 9) for r in rs.values()))
    got = {
        r.day: (r.residual, r.leverage, r.cooks_d, r.influential)
        for r in QUERIES["stats_cooks_distance"](spark, sf_small).collect()
    }
    for x in xs:
        d = (
            rs[x] ** 2
            * hs[x]
            / ((1 - hs[x]) ** 2)
            / (2.0 * sse / (n - 2))
        )
        assert abs(got[x][0] - rs[x]) < 1e-6
        assert abs(got[x][1] - hs[x]) < 1e-10
        assert abs(got[x][2] - d) < 1e-6
        assert got[x][3] == (d > 4.0 / n)


def test_supplier_diversification_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    per = defaultdict(lambda: [set(), 0])
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    ).collect():
        a = per[r.l_partkey]
        a[0].add(r.l_suppkey)
        a[1] += round(r.l_extendedprice * 100)
    want = defaultdict(lambda: [0, 0, None])
    for _, (sups, rev) in per.items():
        b = "single" if len(sups) == 1 else "dual" if len(sups) == 2 else "multi"
        w = want[b]
        w[0] += 1
        w[1] += rev
        if len(sups) == 1:
            w[2] = rev if w[2] is None else max(w[2], rev)
    got = {
        r.sourcing: (r.n_parts, r.revenue_cents, r.max_single_part_cents)
        for r in QUERIES["olap_supplier_diversification"](
            spark, sf_small
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_permutation_entropy_matches_python(spark, sf_small):
    import math
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    got = {
        r.event_type: (r.n_windows, r.n_patterns, r.perm_entropy_norm)
        for r in QUERIES["ts_permutation_entropy"](
            spark, sf_small
        ).collect()
    }
    for t, xs in grid.items():
        pats = Counter()
        for i in range(len(xs) - 2):
            a, b, c = xs[i], xs[i + 1], xs[i + 2]
            if a <= b <= c:
                p = "012"
            elif a <= c < b:
                p = "021"
            elif b < a <= c:
                p = "102"
            elif c < a <= b:
                p = "120"
            elif b <= c < a:
                p = "201"
            else:
                p = "210"
            pats[p] += 1
        n = sum(pats.values())
        ent = sum(
            sorted(
                round(-(c / n) * math.log(c / n), 12)
                for c in pats.values()
            )
        ) / math.log(6.0)
        assert got[t][0] == n and got[t][1] == len(pats)
        assert abs(got[t][2] - ent) < 1e-8, t


def test_cochran_q_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    flags = {}
    for t, xs in grid.items():
        w = sorted(xs)
        two_med = w[14] + w[15]
        flags[t] = [1 if 2 * x > two_med else 0 for x in xs]
    types = sorted(flags)
    k = len(types)
    cj = [sum(flags[t]) for t in types]
    ri = [sum(flags[t][d] for t in types) for d in range(30)]
    sr, srr = sum(ri), sum(r * r for r in ri)
    scc = sum(c * c for c in cj)
    qn = k * (k - 1) * scc - (k - 1) * sr * sr
    qd = k * sr - srr
    row = QUERIES["stats_cochran_q"](spark, sf_small).collect()[0]
    assert (row.k, row.total_successes, row.q_num, row.q_den) == (
        k,
        sr,
        qn,
        qd,
    )
    assert abs(row.cochran_q - qn / qd) < 1e-9


def test_rbo_vocab_overlap_matches_python(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    cnt = {"src0": Counter(), "src1": Counter()}
    for r in load(spark, sf_small, "documents").collect():
        if r.source in cnt:
            cnt[r.source].update(w for w in r.text.split(" ") if w)
    tops = {
        s: [
            w
            for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        ][:50]
        for s, c in cnt.items()
    }
    ra = {w: i + 1 for i, w in enumerate(tops["src0"])}
    rb = {w: i + 1 for i, w in enumerate(tops["src1"])}
    shared = {
        w: max(ra[w], rb[w]) for w in set(ra) & set(rb)
    }
    p = 0.9
    terms = []
    ov50 = 0
    for d in range(1, 51):
        ov = sum(1 for m in shared.values() if m <= d)
        ov50 = max(ov50, ov)
        terms.append(ov * ((1 - p) * p ** (d - 1) / d))
    rbo = sum(sorted(terms))
    row = QUERIES["text_rbo_vocab_overlap"](spark, sf_small).collect()[0]
    assert row.overlap_at_50 == ov50
    assert abs(row.rbo_ub - rbo) < 1e-8


def test_lin_ccc_matches_python(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    xs, ys = grid["click"], grid["view"]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = 2 * (n * sxy - sx * sy)
    den = (n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) ** 2
    row = QUERIES["stats_lin_ccc"](spark, sf_small).collect()[0]
    assert (row.n, row.ccc_num, row.ccc_den) == (n, num, den)
    assert abs(row.lin_ccc - num / den) < 1e-12


def test_price_decile_migration_matches_python(spark, sf_small):
    import datetime
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    rev = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    ).collect():
        sd = (
            r.l_shipdate.date()
            if isinstance(r.l_shipdate, datetime.datetime)
            else r.l_shipdate
        )
        if sd.year == 1995:
            rev[r.l_partkey][0] += round(r.l_extendedprice * 100)
        elif sd.year == 1996:
            rev[r.l_partkey][1] += round(r.l_extendedprice * 100)
    both = {k: v for k, v in rev.items() if v[0] and v[1]}

    def ntile10(keys):
        n = len(keys)
        base, extra = divmod(n, 10)
        out = {}
        i = 0
        for q in range(1, 11):
            size = base + (1 if q <= extra else 0)
            for k in keys[i : i + size]:
                out[k] = q
            i += size
        return out

    d_from = ntile10(sorted(both, key=lambda k: (-both[k][0], k)))
    d_to = ntile10(sorted(both, key=lambda k: (-both[k][1], k)))
    want = Counter((d_from[k], d_to[k]) for k in both)
    got = {
        (r.d_from, r.d_to): (r.n_parts, r.shift)
        for r in QUERIES["olap_price_decile_migration"](
            spark, sf_small
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == dict(want)
    for (a, b), (_, shift) in got.items():
        assert shift == b - a


def test_exact_dup_vectors_matches_python(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    groups = defaultdict(list)
    for r in load(spark, sf_small, "embeddings").collect():
        key = tuple(round(float(x) * 256) for x in r.embedding)
        groups[key].append((r.vec_id, r.label))
    clusters = [v for v in groups.values() if len(v) > 1]
    row = QUERIES["emb_exact_dup_vectors"](spark, sf_small).collect()[0]
    assert row.n_clusters == len(clusters)
    assert row.n_dup_vectors == sum(len(c) for c in clusters)
    assert row.n_label_conflicts == sum(
        1 for c in clusters if len({lab for _, lab in c}) > 1
    )
    if clusters:
        assert row.sample_canonical == min(
            min(v for v, _ in c) for c in clusters
        )
    else:
        assert row.sample_canonical is None


def test_sign_test_matches_python(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    grid = _py_daily_grid(spark, sf_small)
    np_ = sum(
        1 for c, v in zip(grid["click"], grid["view"]) if c > v
    )
    nn = sum(
        1 for c, v in zip(grid["click"], grid["view"]) if c < v
    )
    corr = (
        np_ - nn - 1 if np_ > nn else np_ - nn + 1 if np_ < nn else 0
    )
    z = corr / math.sqrt(np_ + nn)
    row = QUERIES["stats_sign_test"](spark, sf_small).collect()[0]
    assert (row.n_pos, row.n_neg) == (np_, nn)
    assert abs(row.z_stat - z) < 1e-12
    assert row.significant_05 == (abs(z) > 1.96)


def test_aov_quarterly_matches_python(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    per = defaultdict(lambda: [0, 0])
    for r in load(spark, sf_small, "orders").collect():
        od = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, datetime.datetime)
            else r.o_orderdate
        )
        if od.year in (1995, 1996):
            key = (od.year, (od.month + 2) // 3)
            per[key][0] += 1
            per[key][1] += round(r.o_totalprice * 100)
    got = {
        (r.yr, r.qtr): (
            r.n_orders,
            r.rev_cents,
            r.aov_cents,
            r.qoq_delta_milli,
        )
        for r in QUERIES["olap_aov_quarterly"](spark, sf_small).collect()
    }
    assert set(got) == set(per)
    prev = None
    for key in sorted(per):
        n, rev = per[key]
        aov = rev // n
        delta = 0 if prev is None else aov * 1000 // prev - 1000
        assert got[key] == (n, rev, aov, delta), key
        prev = aov


def test_dtw_distance_banded_kernel():
    """VERDICT r9 #6: the anti-diagonal-vectorized DP must equal the
    naive nested-loop DP exactly (band=None), a wide band must not
    change the answer, a tight band must only increase it, and an
    infeasible band must raise."""
    import numpy as np
    import pytest as _pt

    from report_worker_spark.functions.timeseries import dtw_distance

    def naive(a, b):
        a, b = np.asarray(a), np.asarray(b)
        cost = np.abs(a[:, None] - b[None, :])
        dp = np.zeros_like(cost)
        dp[0, 0] = cost[0, 0]
        dp[0, 1:] = np.cumsum(cost[0, 1:]) + cost[0, 0]
        dp[1:, 0] = np.cumsum(cost[1:, 0]) + cost[0, 0]
        for i in range(1, len(a)):
            for j in range(1, len(b)):
                dp[i, j] = cost[i, j] + min(
                    dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
                )
        return int(dp[-1, -1])

    rng = np.random.default_rng(7)
    for n, m in [(1, 1), (1, 5), (5, 1), (2, 2), (30, 30), (17, 23)]:
        a = rng.integers(0, 500, n).tolist()
        b = rng.integers(0, 500, m).tolist()
        full = dtw_distance(a, b, band=None)
        assert full == naive(a, b), (n, m)
        # a band covering the whole grid is the unconstrained DP
        assert dtw_distance(a, b, band=n + m) == full, (n, m)
        # tighter bands restrict paths: distance non-decreasing as the
        # band shrinks, never below the unconstrained optimum
        prev = None
        for band in range(n + m, abs(n - m) - 1, -1):
            d = dtw_distance(a, b, band=band)
            assert d >= full
            assert prev is None or d >= prev, (n, m, band)
            prev = d
    # phase-shifted ramps: a diagonal band still finds the alignment
    a = list(range(20))
    b = [0, 0] + list(range(18))
    assert dtw_distance(a, b, band=3) == dtw_distance(a, b, band=None)
    with _pt.raises(ValueError, match="band"):
        dtw_distance([1, 2, 3, 4, 5], [1], band=2)


def test_mood_median_test_replica(spark, sf_small):
    """Python replay: exact upper-median convention (smallest u with
    2·cum >= N+1), 2×k contingency, chi2 terms."""
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("event_type", "value").collect()
    us = sorted(int(round_half_up(r.value)) for r in ev)
    n = len(us)
    cnt = Counter(us)
    cum, med = 0, None
    for u in sorted(cnt):
        cum += cnt[u]
        if 2 * cum >= n + 1:
            med = u
            break
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        u = int(round_half_up(r.value))
        per[r.event_type][0] += 1
        per[r.event_type][1] += int(u > med)
    a_tot = sum(v[1] for v in per.values())
    rows = {r.event_type: r for r in QUERIES["stats_mood_median_test"](spark, sf_small).collect()}
    assert set(rows) == set(per)
    for t, (n_i, n_above) in per.items():
        r = rows[t]
        assert (r.n_i, r.n_above, r.n_below) == (n_i, n_above, n_i - n_above)
        ea = n_i * a_tot / n
        eb = n_i * (n - a_tot) / n
        want = (n_above - ea) ** 2 / ea + ((n_i - n_above) - eb) ** 2 / eb
        assert abs(r.chi2_term - want) < 1e-6


def round_half_up(x: float) -> float:
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_cronbach_alpha_replica(spark, sf_small):
    """Python replay over the dense user × type count matrix."""
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("user_id", "event_type").collect()
    cells = Counter((r.user_id, r.event_type) for r in ev)
    users = sorted({r.user_id for r in ev})
    types = sorted({r.event_type for r in ev})
    n, k = len(users), len(types)
    mat = {u: {t: cells.get((u, t), 0) for t in types} for u in users}
    ivars = []
    for t in types:
        xs = [mat[u][t] for u in users]
        m = sum(xs) / n
        ivars.append(sum(x * x for x in xs) / n - m * m)
    tots = [sum(mat[u].values()) for u in users]
    mt = sum(tots) / n
    tvar = sum(x * x for x in tots) / n - mt * mt
    alpha = (k / (k - 1)) * (1 - sum(ivars) / tvar)
    r = QUERIES["stats_cronbach_alpha"](spark, sf_small).collect()[0]
    assert (r.n_users, r.k_items) == (n, k)
    assert abs(r.sum_item_var - sum(ivars)) < 1e-6
    assert abs(r.total_var - tvar) < 1e-6
    assert abs(r.alpha - alpha) < 1e-6


def test_icc_oneway_replica(spark, sf_small):
    """Python replay of the unbalanced one-way ANOVA ICC(1,1)."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select("o_custkey", "o_totalprice").collect()
    c = load(spark, sf_small, "customer").select("c_custkey", "c_nationkey").collect()
    nat = {r.c_custkey: r.c_nationkey for r in c}
    groups = defaultdict(list)
    for r in o:
        groups[nat[r.o_custkey]].append(int(round_half_up(r.o_totalprice)))
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    sy = sum(sum(v) for v in groups.values())
    ssq = sum(sum(v) ** 2 / len(v) for v in groups.values())
    s2_tot = sum(x * x for v in groups.values() for x in v)
    sn2 = sum(len(v) ** 2 for v in groups.values())
    msb = (ssq - sy * sy / nn) / (k - 1)
    msw = (s2_tot - ssq) / (nn - k)
    n0 = (nn - sn2 / nn) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    r = QUERIES["stats_icc_oneway"](spark, sf_small).collect()[0]
    assert (r.n_groups, r.n_total) == (k, nn)
    assert abs(r.n0 - n0) < 1e-4
    assert abs(r.msb - msb) < max(1e-3, abs(msb) * 1e-9)
    assert abs(r.msw - msw) < max(1e-3, abs(msw) * 1e-9)
    assert abs(r.icc1 - icc) < 1e-6


def test_holm_bonferroni_replica(spark, sf_small):
    """Step-down invariants: rejected set is a prefix of the p-rank
    order, thresholds are alpha/(m-rank+1), and rejection stops at the
    first rank whose p exceeds its threshold. Cross-checked against
    the BH twin's shared z/p columns."""
    from report_worker_spark.plans.catalog import QUERIES

    rows = sorted(
        QUERIES["stats_holm_bonferroni"](spark, sf_small).collect(),
        key=lambda r: r.p_rank,
    )
    m = len(rows)
    ok = True
    for r in rows:
        thr = 0.05 / (m - r.p_rank + 1)
        assert abs(r.holm_threshold - thr) < 1e-12
        ok = ok and (r.p_value <= thr)
        assert r.rejected == ok
    bh = {r.nation: r for r in QUERIES["stats_bh_fdr"](spark, sf_small).collect()}
    for r in rows:
        assert bh[r.nation].p_value == r.p_value
        assert bh[r.nation].z_stat == r.z_stat


def test_durbin_watson_replica(spark, sf_small):
    """Python OLS + DW replay on the same daily series."""
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("ts", "value").collect()
    epoch = datetime.date(2024, 1, 1)
    daily = defaultdict(int)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            daily[d] += int(round_half_up(r.value))
    xs = sorted(daily)
    ys = [daily[x] for x in xs]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [y - a - b * x for x, y in zip(xs, ys)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(
        v * v for v in e
    )
    r = QUERIES["stats_durbin_watson"](spark, sf_small).collect()[0]
    assert r.n_days == n
    assert abs(r.dw - dw) < 1e-6
    assert abs(r.rho1_approx - (1 - dw / 2)) < 1e-6


def test_bartlett_replica(spark, sf_small):
    """Python replay of Bartlett's T with the C correction."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups = defaultdict(list)
    for r in o:
        groups[r.o_orderpriority].append(int(round_half_up(r.o_totalprice)))
    groups = {g: v for g, v in groups.items() if len(v) > 1}
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    variances = {}
    for g, v in groups.items():
        m = sum(v) / len(v)
        variances[g] = sum((x - m) ** 2 for x in v) / (len(v) - 1)
    sp2 = sum((len(v) - 1) * variances[g] for g, v in groups.items()) / (
        nn - k
    )
    t_num = (nn - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(variances[g]) for g, v in groups.items()
    )
    c = 1 + (
        sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (nn - k)
    ) / (3 * (k - 1))
    r = QUERIES["stats_bartlett_test"](spark, sf_small).collect()[0]
    assert (r.n_groups, r.n_total) == (k, nn)
    assert abs(r.pooled_var - sp2) < max(1e-2, sp2 * 1e-8)
    assert abs(r.bartlett_stat - t_num / c) < 1e-5


def _daily_series(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("ts", "value").collect()
    epoch = datetime.date(2024, 1, 1)
    daily = defaultdict(int)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            daily[d] += int(round_half_up(r.value))
    xs = sorted(daily)
    return xs, [daily[x] for x in xs]


def test_variance_ratio_replica(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    xs, ys = _daily_series(spark, sf_small)
    n1 = len(xs) - 1
    mu = (ys[-1] - ys[0]) / n1
    d1 = [ys[i] - ys[i - 1] for i in range(1, len(ys))]
    d5 = [ys[i] - ys[i - 5] for i in range(5, len(ys))]
    ss1 = sum((d - mu) ** 2 for d in d1)
    ss5 = sum((d - 5 * mu) ** 2 for d in d5)
    vr = (ss5 / (5 * len(d5))) / (ss1 / len(d1))
    r = QUERIES["ts_variance_ratio_test"](spark, sf_small).collect()[0]
    assert (r.n_diffs, r.n_qdiffs, r.q) == (len(d1), len(d5), 5)
    assert abs(r.vr - vr) < 1e-6


def test_sample_entropy_replica(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    xs, ys = _daily_series(spark, sf_small)
    n = len(ys)
    m = sum(ys) / n
    var = sum(y * y for y in ys) / n - m * m
    rtol = max(1, int(math.floor(0.2 * math.sqrt(var))))
    tpl = [(ys[i], ys[i + 1], ys[i + 2]) for i in range(n - 2)]
    bb = aa = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            a, b = tpl[i], tpl[j]
            if abs(a[0] - b[0]) <= rtol and abs(a[1] - b[1]) <= rtol:
                bb += 1
                if abs(a[2] - b[2]) <= rtol:
                    aa += 1
    r = QUERIES["ts_sample_entropy"](spark, sf_small).collect()[0]
    assert (r.r_tol, r.b_count, r.a_count) == (rtol, bb, aa)
    if aa and bb:
        assert abs(r.sampen - (-math.log(aa / bb))) < 1e-6


def test_madogram_replica(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    xs, ys = _daily_series(spark, sf_small)
    a1 = [abs(ys[i] - ys[i - 1]) for i in range(1, len(ys))]
    a2 = [abs(ys[i] - ys[i - 2]) for i in range(2, len(ys))]
    v1 = sum(a1) / (2 * len(a1))
    v2 = sum(a2) / (2 * len(a2))
    d = 2 - (math.log(v2) - math.log(v1)) / (2 * math.log(2))
    r = QUERIES["ts_madogram_fractal"](spark, sf_small).collect()[0]
    assert (r.n_lag1, r.n_lag2) == (len(a1), len(a2))
    assert abs(r.v1 - v1) < 1e-5 and abs(r.v2 - v2) < 1e-5
    assert abs(r.fractal_d - d) < 1e-6


def test_recurrence_rate_replica(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES

    xs, ys = _daily_series(spark, sf_small)
    n = len(ys)
    eps = max(1, (max(ys) - min(ys)) // 10)
    rec = diag = tot = 0
    for i in range(n):
        for j in range(i + 1, n):
            tot += 1
            if abs(ys[i] - ys[j]) <= eps:
                rec += 1
                nxt = (
                    i + 1 < n and j + 1 < n
                    and abs(ys[i + 1] - ys[j + 1]) <= eps
                )
                prv = i > 0 and j > 0 and abs(ys[i - 1] - ys[j - 1]) <= eps
                diag += int(nxt or prv)
    r = QUERIES["ts_recurrence_rate"](spark, sf_small).collect()[0]
    assert (r.n_points, r.eps, r.n_pairs) == (n, eps, tot)
    assert (r.n_recurrent, r.n_diagonal) == (rec, diag)
    assert abs(r.rr - rec / tot) < 1e-9
    if rec:
        assert abs(r.det - diag / rec) < 1e-9


def test_bcg_matrix_replica(spark, sf_small):
    """Quadrants: strict > median cuts on integer r95 and milli
    growth; exactly the four labels partition the brand set."""
    from report_worker_spark.plans.catalog import QUERIES

    rows = QUERIES["olap_bcg_matrix"](spark, sf_small).collect()
    r95s = sorted((r.rev_y2_cents, r.brand) for r in rows)
    gs = sorted((r.growth_milli, r.brand) for r in rows)
    m = len(rows)
    med_r = r95s[(m + 1) // 2 - 1][0]
    med_g = gs[(m + 1) // 2 - 1][0]
    tot = sum(r.rev_y2_cents for r in rows)
    for r in rows:
        hi_s, hi_g = r.rev_y2_cents > med_r, r.growth_milli > med_g
        want = (
            "star" if hi_s and hi_g
            else "cash_cow" if hi_s
            else "question_mark" if hi_g
            else "dog"
        )
        assert r.quadrant == want, r
        assert abs(r.share_y2 - r.rev_y2_cents / tot) < 1e-9
        d = (r.rev_y2_cents - r.rev_y1_cents) * 1000
        assert r.growth_milli == int(d / r.rev_y1_cents)  # trunc toward 0


def test_log_histogram_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select("o_totalprice").collect()
    buckets = defaultdict(list)
    for r in o:
        d = max(1, int(round_half_up(r.o_totalprice)))
        buckets[d.bit_length()].append(d)
    rows = {r.log2_bucket: r for r in QUERIES[
        "olap_order_value_log_histogram"](spark, sf_small).collect()}
    assert set(rows) == set(buckets)
    for k, v in buckets.items():
        r = rows[k]
        assert (r.n_orders, r.sum_dollars) == (len(v), sum(v))
        assert (r.min_dollars, r.max_dollars) == (min(v), max(v))
        assert r.bucket_low_dollars == 2 ** (k - 1)
        assert all(2 ** (k - 1) <= d < 2**k for d in v)


def test_richness_panel_replica(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    freq = defaultdict(Counter)
    for r in docs:
        freq[r.source].update(r.text.split(" "))
    rows = {r.source: r for r in QUERIES["text_richness_panel"](spark, sf_small).collect()}
    assert set(rows) == set(freq)
    for s, c in freq.items():
        n, v = sum(c.values()), len(c)
        v1 = sum(1 for x in c.values() if x == 1)
        v2 = sum(1 for x in c.values() if x == 2)
        r = rows[s]
        assert (r.n_tokens, r.n_types, r.n_hapax, r.n_dis) == (n, v, v1, v2)
        assert abs(r.guiraud_r - v / math.sqrt(n)) < 1e-6
        assert abs(r.herdan_c - math.log(v) / math.log(n)) < 1e-6
        if v1 < v:
            assert abs(r.honore_r - 100 * math.log(n) / (1 - v1 / v)) < 1e-4
        else:
            assert r.honore_r is None
        assert abs(r.sichel_s - v2 / v) < 1e-9


def test_char_entropy_replica(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    freq = defaultdict(Counter)
    for r in docs:
        freq[r.source].update(r.text)
    rows = {r.source: r for r in QUERIES["text_char_entropy_by_source"](spark, sf_small).collect()}
    for s, c in freq.items():
        n = sum(c.values())
        ent = -sum((x / n) * math.log(x / n) for x in c.values())
        r = rows[s]
        assert (r.n_chars, r.n_distinct_chars) == (n, len(c))
        assert abs(r.char_entropy_nats - ent) < 1e-6


def test_gunning_fog_replica(spark, sf_small):
    import re

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text").collect()
    rows = {r.doc_id: r for r in QUERIES["text_gunning_fog"](spark, sf_small).collect()}
    for d in docs:
        ws = d.text.split(" ")
        sents = max(len(re.findall(r"[.!?]", d.text)), 1)
        comp = sum(
            1 for w in ws if len(re.findall(r"[aeiouy]+", w.lower())) >= 3
        )
        r = rows[d.doc_id]
        assert (r.n_words, r.n_sentences, r.n_complex) == (len(ws), sents, comp)
        fog = 0.4 * (len(ws) / sents + 100 * comp / len(ws))
        assert abs(r.fog_index - fog) < 1e-6


def test_path_census_replica(spark, sf_small):
    """P2/P3 closed forms vs brute-force path enumeration on the
    co-occurrence graph."""
    from collections import defaultdict
    from itertools import combinations

    from report_worker_spark.plans.catalog import QUERIES, _cooccur_edges

    ed = {(r.src, r.dst) for r in _cooccur_edges(spark, sf_small).collect()}
    adj = defaultdict(set)
    for s, t in ed:
        adj[s].add(t)
        adj[t].add(s)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    # brute triangles: each unordered triangle is seen once per edge
    tri = sum(len(adj[s] & adj[t]) for s, t in ed) // 3
    p3 = sum(
        (len(adj[s]) - 1) * (len(adj[t]) - 1) for s, t in ed
    ) - 3 * tri
    r = QUERIES["graph_path_census"](spark, sf_small).collect()[0]
    assert (r.n_nodes, r.n_edges) == (len(adj), len(ed))
    assert (r.n_paths2, r.n_triangles, r.n_paths3) == (wedges, tri, p3)
    assert abs(r.transitivity - 3 * tri / wedges) < 1e-9
    # spot-verify P3 by enumeration on a small sub-sample of paths
    brute_p3 = 0
    for s, t in ed:
        for u in adj[s] - {t}:
            for v in adj[t] - {s, u}:
                brute_p3 += 1
    assert brute_p3 == p3


def test_uniformity_alignment_replica(spark, sf_small):
    import hashlib
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").collect()
    qs = [
        (
            r.vec_id,
            r.label,
            hashlib.md5(str(r.vec_id).encode()).hexdigest()[0],
            [int(round_half_up(float(v) * 256)) for v in r.embedding],
        )
        for r in emb
    ]
    from collections import defaultdict

    bkts = defaultdict(list)
    for t in qs:
        bkts[t[2]].append(t)
    n_pairs = n_same = 0
    sum_d2_same = 0
    sum_eq = 0
    for vs in bkts.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                if a[0] > b[0]:
                    a, b = b, a
                d2 = sum((x - y) ** 2 for x, y in zip(a[3], b[3]))
                n_pairs += 1
                if a[1] == b[1]:
                    n_same += 1
                    sum_d2_same += d2
                sum_eq += int(
                    round_half_up(math.exp(-2.0 * d2 / 65536.0) * 2**40)
                )
    r = QUERIES["emb_uniformity_alignment"](spark, sf_small).collect()[0]
    assert (r.n_pairs, r.n_same_label) == (n_pairs, n_same)
    assert abs(r.alignment - sum_d2_same / (65536.0 * n_same)) < 1e-6
    assert abs(
        r.uniformity - math.log(sum_eq / n_pairs / 2**40)
    ) < 1e-6


def test_centroid_confusion_replica(spark, sf_small):
    """Confusion matrix marginals must agree with the accuracy op."""
    from report_worker_spark.plans.catalog import QUERIES

    conf = QUERIES["emb_centroid_confusion"](spark, sf_small).collect()
    acc = {
        r.label: r
        for r in QUERIES["emb_nearest_centroid_accuracy"](
            spark, sf_small
        ).collect()
    }
    from collections import defaultdict

    row_tot = defaultdict(int)
    diag = {}
    for r in conf:
        row_tot[r.label] += r.n_vecs
        if r.label == r.pred_label:
            diag[r.label] = r.n_vecs
    for lbl, a in acc.items():
        assert row_tot[lbl] == a.n_vecs
        assert diag.get(lbl, 0) == a.n_correct
    for r in conf:
        assert abs(r.row_share - r.n_vecs / row_tot[r.label]) < 1e-9


def _py_md5_minhash(docs, n_hashes=16):
    import hashlib

    def h12(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    per = {}
    for doc_id, text in docs:
        if doc_id % 101 != 0:
            continue
        t = text.strip().split()
        if len(t) < 3:
            continue
        shingles = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
        hs = {h12(s) for s in shingles}
        sig = [
            min(h12(f"{i}:{s}") for s in shingles)
            for i in range(n_hashes)
        ]
        per[doc_id] = (hs, sig)
    return per


def test_minhash_estimate_audit_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = [
        (r.doc_id, r.text)
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    per = _py_md5_minhash(docs)
    ids = sorted(per)
    agg = defaultdict(lambda: [0, 0, 0.0])  # n, sum_matches, sum_abs_err
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ha, sa = per[ids[i]]
            hb, sb = per[ids[j]]
            inter = len(ha & hb)
            uni = len(ha | hb)
            matches = sum(1 for x, y in zip(sa, sb) if x == y)
            dec = (10 * inter) // uni
            agg[dec][0] += 1
            agg[dec][1] += matches
            agg[dec][2] += abs(matches * uni - 16 * inter) / (16 * uni)
    rows = {r.jaccard_decile: r for r in QUERIES[
        "dedup_minhash_estimate_audit"](spark, sf_small).collect()}
    assert set(rows) == set(agg)
    for dec, (n, sm, se) in agg.items():
        r = rows[dec]
        assert (r.n_pairs, r.sum_matches) == (n, sm)
        assert abs(r.mean_estimate - sm / (16 * n)) < 1e-9
        assert abs(r.mean_abs_err - se / n) < 1e-6


def test_band_scurve_audit_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = [
        (r.doc_id, r.text)
        for r in load(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    per = _py_md5_minhash(docs)
    ids = sorted(per)
    agg = defaultdict(lambda: [0, 0, 0.0])
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ha, sa = per[ids[i]]
            hb, sb = per[ids[j]]
            inter, uni = len(ha & hb), len(ha | hb)
            dec = (10 * inter) // uni
            coll = any(
                all(sa[b * 4 + k] == sb[b * 4 + k] for k in range(4))
                for b in range(4)
            )
            s = inter / uni
            theory = 1 - (1 - s**4) ** 4
            agg[dec][0] += 1
            agg[dec][1] += int(coll)
            agg[dec][2] += theory
    rows = {r.jaccard_decile: r for r in QUERIES[
        "dedup_band_scurve_audit"](spark, sf_small).collect()}
    assert set(rows) == set(agg)
    for dec, (n, nc, st) in agg.items():
        r = rows[dec]
        assert (r.n_pairs, r.n_collided) == (n, nc)
        assert abs(r.empirical_rate - nc / n) < 1e-9
        assert abs(r.mean_theory_p - st / n) < 1e-6


def test_timestamp_granularity_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("event_type", "ts").collect()
    agg = defaultdict(lambda: [0, 0, 0, set()])
    for r in ev:
        t = r.ts
        usec = t.microsecond
        a = agg[r.event_type]
        a[0] += 1
        a[1] += int(usec == 0)
        a[2] += int(usec == 0 and t.second == 0)
        a[3].add(t.replace(microsecond=0))
    rows = {r.event_type: r for r in QUERIES[
        "audit_timestamp_granularity"](spark, sf_small).collect()}
    for et, (n, ws, wm, secs) in agg.items():
        r = rows[et]
        assert (r.n_events, r.n_whole_second, r.n_whole_minute) == (n, ws, wm)
        assert r.n_distinct_seconds == len(secs)
        assert r.truncation_suspect == (ws * 100 > n)


def test_wav_peak_bin_replica(spark, sf_small):
    """Peak bin/share consistent with the amp-producing goertzel op:
    peak_k must be the argmax of amp_k (smallest-k ties) and share in
    (0, 1]."""
    from report_worker_spark.plans.catalog import QUERIES

    amps = {
        r.media_id: r
        for r in QUERIES["multimodal_wav_goertzel_bins"](
            spark, sf_small
        ).collect()
    }
    rows = QUERIES["multimodal_wav_peak_bin"](spark, sf_small).collect()
    assert len(rows) == len(amps)
    for r in rows:
        a = amps[r.media_id]
        best = max(
            (getattr(a, f"amp_k{k}"), -k) for k in (1, 2, 4, 8)
        )
        assert r.peak_k == -best[1]
        assert 0 < r.peak_share <= 1
        # p = (amp * AMP_MAX)^2, so share from amps must match closely
        ps = {k: getattr(a, f"amp_k{k}") ** 2 for k in (1, 2, 4, 8)}
        want = ps[r.peak_k] / sum(ps.values())
        assert abs(r.peak_share - want) < 1e-4


def test_wav_spectral_entropy_replica(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES

    amps = {
        r.media_id: r
        for r in QUERIES["multimodal_wav_goertzel_bins"](
            spark, sf_small
        ).collect()
    }
    rows = QUERIES["multimodal_wav_spectral_entropy"](
        spark, sf_small
    ).collect()
    for r in rows:
        a = amps[r.media_id]
        ps = [getattr(a, f"amp_k{k}") ** 2 for k in (1, 2, 4, 8)]
        tot = sum(ps)
        if tot == 0:
            assert r.spectral_entropy_norm is None
            continue
        h = -sum(
            (p / tot) * math.log(p / tot) for p in ps if p > 0
        ) / math.log(4)
        assert abs(r.spectral_entropy_norm - h) < 1e-4
        assert -1e-9 <= r.spectral_entropy_norm <= 1 + 1e-9


def test_backlog_timeline_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    ).collect()
    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    last = defaultdict(lambda: None)
    for r in li:
        k = r.l_orderkey
        if last[k] is None or r.l_shipdate > last[k]:
            last[k] = r.l_shipdate
    placed = defaultdict(int)
    done = defaultdict(int)
    for r in o:
        placed[r.o_orderdate.strftime("%Y-%m")] += 1
        if r.o_orderstatus == "F" and last[r.o_orderkey] is not None:
            done[last[r.o_orderkey].strftime("%Y-%m")] += 1
    months = sorted(set(placed) | set(done))
    rows = {r.month: r for r in QUERIES["olap_order_backlog_timeline"](
        spark, sf_small).collect()}
    assert set(rows) == set(months)
    run = 0
    for m in months:
        run += placed[m] - done[m]
        r = rows[m]
        assert (r.n_placed, r.n_completed, r.open_backlog) == (
            placed[m], done[m], run
        )


def test_fleiss_kappa_replica(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("ts", "event_type").collect()
    epoch = datetime.date(2024, 1, 1)
    cell = defaultdict(int)
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            cell[(d, r.event_type)] += 1
    days = sorted({d for d, _ in cell})
    n_i = {d: sum(v for (dd, _), v in cell.items() if dd == d) for d in days}
    days = [d for d in days if n_i[d] > 1]
    p_is = []
    for d in days:
        s2 = sum(v * v for (dd, _), v in cell.items() if dd == d)
        p_is.append((s2 - n_i[d]) / (n_i[d] * (n_i[d] - 1)))
    n_tot = sum(n_i[d] for d in days)
    cats = defaultdict(int)
    for (d, t), v in cell.items():
        if d in set(days):
            cats[t] += v
    p_bar = sum(p_is) / len(days)
    p_e = sum((v / n_tot) ** 2 for v in cats.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    r = QUERIES["stats_fleiss_kappa"](spark, sf_small).collect()[0]
    assert (r.n_subjects, r.n_ratings) == (len(days), n_tot)
    assert abs(r.p_bar - p_bar) < 1e-6
    assert abs(r.p_e - p_e) < 1e-6
    assert abs(r.fleiss_kappa - kappa) < 1e-6


def test_tukey_hsd_replica(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups = defaultdict(list)
    for r in o:
        groups[r.o_orderpriority].append(int(round_half_up(r.o_totalprice)))
    nn = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v)
        for v in groups.values()
    )
    msw = ssw / (nn - k)
    rows = {(r.group_a, r.group_b): r for r in QUERIES[
        "stats_tukey_hsd"](spark, sf_small).collect()}
    gs = sorted(groups)
    assert len(rows) == k * (k - 1) // 2
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            a, b = gs[i], gs[j]
            r = rows[(a, b)]
            diff = sum(groups[a]) / len(groups[a]) - sum(groups[b]) / len(
                groups[b]
            )
            q = diff / math.sqrt(
                msw / 2 * (1 / len(groups[a]) + 1 / len(groups[b]))
            )
            assert abs(r.mean_diff - diff) < 1e-4
            assert abs(r.q_stat - q) < 1e-6


def test_log_rank_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    c = {r.c_custkey: r.c_mktsegment for r in load(
        spark, sf_small, "customer").select("c_custkey", "c_mktsegment").collect()}
    by_cust = defaultdict(list)
    for r in o:
        by_cust[r.o_custkey].append(r.o_orderdate)
    horizon = max(r.o_orderdate for r in o)
    subj = []
    for cust, dts in by_cust.items():
        dts.sort()
        first = dts[0]
        later = [d for d in dts if d > first]
        if later:
            subj.append((c[cust] == "BUILDING", 1, (later[0] - first).days))
        else:
            subj.append((c[cust] == "BUILDING", 0, (horizon - first).days))
    times = sorted({t for _, e, t in subj if e})
    soe = sv = 0.0
    for et in times:
        at_risk = [s for s in subj if s[2] >= et]
        n_t = len(at_risk)
        n1_t = sum(1 for s in at_risk if s[0])
        d_t = sum(1 for s in subj if s[1] and s[2] == et)
        d1_t = sum(1 for s in subj if s[0] and s[1] and s[2] == et)
        soe += d1_t - d_t * n1_t / n_t
        if n_t > 1:
            sv += (
                d_t * n1_t / n_t * (1 - n1_t / n_t) * (n_t - d_t) / (n_t - 1)
            )
    r = QUERIES["stats_log_rank_test"](spark, sf_small).collect()[0]
    assert r.n_event_times == len(times)
    assert abs(r.observed_minus_expected - soe) < 1e-4
    assert abs(r.variance_sum - sv) < 1e-4
    assert abs(r.log_rank_chi2 - soe * soe / sv) < 1e-6


def test_forward_fill_replica(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "ts", "value"
    ).collect()
    epoch = datetime.date(2024, 1, 1)
    daily = defaultdict(int)
    types = set()
    for r in ev:
        d = (r.ts.date() - epoch).days
        if 0 <= d <= 29:
            daily[(r.event_type, d)] += int(round_half_up(r.value * 100))
            types.add(r.event_type)
    rows = {(r.event_type, r.day): r for r in QUERIES[
        "win_forward_fill_gaps"](spark, sf_small).collect()}
    assert len(rows) == 30 * len(types)
    for t in types:
        last = 0
        for d in range(30):
            r = rows[(t, d)]
            if (t, d) in daily:
                last = daily[(t, d)]
                assert not r.was_filled
            else:
                assert r.was_filled
            assert r.cents_filled == last


def test_range_interval_sum_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").filter(
        "event_type = 'purchase'"
    ).select("user_id", "ts", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(
            (int(r.ts.timestamp()), int(round_half_up(r.value * 100)))
        )
    rows = QUERIES["win_range_interval_sum"](spark, sf_small).collect()
    got = defaultdict(list)
    for r in rows:
        got[r.user_id].append(r)
    for uid, evs in per.items():
        for r in got[uid]:
            win = [c for (e, c) in evs if r.epoch_s - 3600 <= e <= r.epoch_s]
            assert r.n_1h == len(win)
            assert r.sum_1h_cents == sum(win)


def test_weighted_percentile_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in li:
        per[r.l_returnflag][
            int(round_half_up(r.l_extendedprice * 100))
        ] += int(r.l_quantity)
    rows = {r.returnflag: r for r in QUERIES[
        "agg_weighted_percentile"](spark, sf_small).collect()}
    for flag, wmap in per.items():
        tw = sum(wmap.values())
        r = rows[flag]
        assert r.total_qty == tw
        for qn, col in ((1, "wp25_cents"), (2, "wp50_cents"), (3, "wp75_cents")):
            cw = 0
            want = None
            for p in sorted(wmap):
                cw += wmap[p]
                if 4 * cw >= qn * tw if qn != 2 else 2 * cw >= tw:
                    want = p
                    break
            assert getattr(r, col) == want, (flag, col)


def test_token_budget_audit_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in docs:
        n = len(r.text.strip().split())
        a = agg[r.source]
        a[0] += 1
        a[1] += int(n > 64)
        a[2] += n
        a[3] += min(n, 64)
        a[4] += max(n - 64, 0)
    rows = {r.source: r for r in QUERIES[
        "curation_token_budget_audit"](spark, sf_small).collect()}
    for s, (nd, nob, tt, tk, tl) in agg.items():
        r = rows[s]
        assert (r.n_docs, r.n_over_budget, r.tokens_total) == (nd, nob, tt)
        assert (r.tokens_kept, r.tokens_lost) == (tk, tl)
        assert abs(r.loss_share - tl / tt) < 1e-9


def test_cosine_threshold_census_replica(spark, sf_small):
    import hashlib
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").collect()
    from collections import defaultdict

    bkts = defaultdict(list)
    for r in emb:
        q = [int(round_half_up(float(v) * 256)) for v in r.embedding]
        bkts[hashlib.md5(str(r.vec_id).encode()).hexdigest()[0]].append(
            (r.vec_id, q, sum(x * x for x in q))
        )
    thr = [(1, 4), (9, 25), (49, 100), (16, 25), (81, 100)]
    counts = {t: [0, 0] for t in thr}
    for vs in bkts.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                ab = sum(x * y for x, y in zip(a[1], b[1]))
                for num, den in thr:
                    counts[(num, den)][0] += 1
                    if ab > 0 and den * ab * ab >= num * a[2] * b[2]:
                        counts[(num, den)][1] += 1
    rows = {round(math.sqrt(n / d), 9): (n, d) for n, d in thr}
    got = {r.threshold: r for r in QUERIES[
        "sim_cosine_threshold_census"](spark, sf_small).collect()}
    assert set(got) == set(rows)
    for t, (num, den) in rows.items():
        r = got[t]
        n_pairs, n_above = counts[(num, den)]
        assert (r.n_pairs, r.n_above) == (n_pairs, n_above)
        assert abs(r.share_above - n_above / n_pairs) < 1e-9


def test_cross_source_clusters_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    import hashlib

    docs = [
        (r.doc_id, r.source, r.text)
        for r in load(spark, sf_small, "documents").select(
            "doc_id", "source", "text"
        ).collect()
    ]
    # r13 fault injection: md5-seeded ~5% of documents gain a
    # 'syndicated' replica with a shifted id (see the query)
    docs += [
        (did + 10_000_000, "syndicated", text)
        for did, _, text in docs
        if int(hashlib.md5(str(did).encode()).hexdigest()[:2], 16) < 13
    ]
    cl = defaultdict(list)
    for did, srcname, text in docs:
        cl[text].append((did, srcname))
    sizes = defaultdict(lambda: [0, 0, []])
    for v in cl.values():
        if len(v) < 2:
            continue
        a = sizes[len(v)]
        a[0] += 1
        a[1] += int(len({s for _, s in v}) > 1)
        a[2].append(min(d for d, _ in v))
    rows = {r.cluster_size: r for r in QUERIES[
        "dedup_cross_source_clusters"](spark, sf_small).collect()}
    assert set(rows) == set(sizes)
    for sz, (nc, ncs, mins) in sizes.items():
        r = rows[sz]
        assert (r.n_clusters, r.n_cross_source) == (nc, ncs)
        assert r.sample_canonical == min(mins)


def test_two_way_anova_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    ).collect()
    o = {r.o_orderkey: r.o_orderpriority for r in load(
        spark, sf_small, "orders").select("o_orderkey", "o_orderpriority").collect()}
    cells = defaultdict(list)
    for r in li:
        cells[(o[r.l_orderkey], r.l_returnflag)].append(
            int(round_half_up(r.l_extendedprice))
        )
    allv = [x for v in cells.values() for x in v]
    nn, st = len(allv), sum(allv)
    s2t = sum(x * x for x in allv)
    corr = st * st / nn

    def sq(groups):
        return sum(sum(v) ** 2 / len(v) for v in groups.values())

    a_g = defaultdict(list)
    b_g = defaultdict(list)
    for (a, b), v in cells.items():
        a_g[a].extend(v)
        b_g[b].extend(v)
    sqc, sqa, sqb = sq(cells), sq(a_g), sq(b_g)
    ka, kb = len(a_g), len(b_g)
    ss_a, ss_b = sqa - corr, sqb - corr
    ss_ab = sqc - sqa - sqb + corr
    ss_e = s2t - sqc
    mse = ss_e / (nn - ka * kb)
    r = QUERIES["stats_two_way_anova"](spark, sf_small).collect()[0]
    assert (r.k_a, r.k_b, r.n_total) == (ka, kb, nn)
    for got, want in [
        (r.ss_a, ss_a), (r.ss_b, ss_b), (r.ss_ab, ss_ab), (r.ss_error, ss_e)
    ]:
        assert abs(got - want) < max(5, abs(want) * 1e-9)
    assert abs(r.f_a - ss_a / (ka - 1) / mse) < 1e-5
    assert abs(r.f_b - ss_b / (kb - 1) / mse) < 1e-5
    assert abs(r.f_ab - ss_ab / ((ka - 1) * (kb - 1)) / mse) < 1e-5


def test_powerlaw_ks_replica(spark, sf_small):
    import math

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select("o_totalprice").collect()
    tail = sorted(
        int(round_half_up(r.o_totalprice))
        for r in o
        if round_half_up(r.o_totalprice) >= 200000
    )
    n = len(tail)
    alpha = 1 + n / sum(math.log(x / 200000) for x in tail)
    d = max(
        abs((i + 1) / n - (1 - (x / 200000) ** (1 - alpha)))
        for i, x in enumerate(tail)
    )
    r = QUERIES["stats_powerlaw_ks_fit"](spark, sf_small).collect()[0]
    assert (r.n_tail, r.xmin_dollars) == (n, 200000)
    assert abs(r.alpha_hat - alpha) < 1e-6
    assert abs(r.ks_d - d) < 1e-6


def test_id_gaps_replica(spark, sf_small):
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ids = [r.event_id for r in load(spark, sf_small, "events")
           .select("event_id").collect()]
    ds = sorted(set(ids))
    gaps = [b - a for a, b in zip(ds, ds[1:])]
    r = QUERIES["audit_monotonic_id_gaps"](spark, sf_small).collect()[0]
    assert (r.n_rows, r.n_distinct) == (len(ids), len(ds))
    assert r.n_duplicate_rows == len(ids) - len(ds)
    assert (r.id_min, r.id_max) == (ds[0], ds[-1])
    assert r.n_missing_ids == ds[-1] - ds[0] + 1 - len(ds)
    assert r.max_gap == (max(gaps) if gaps else 0)


def test_rfm_migration_replica(spark, sf_small):
    """Matrix marginals: per-1996-segment row sums equal the count of
    repeat customers in that segment; quartile sizes differ by <=1
    within each year among repeat-relevant populations."""
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    rows = QUERIES["olap_rfm_migration"](spark, sf_small).collect()
    assert rows, "no repeat customers found"
    rtot = defaultdict(int)
    for r in rows:
        assert r.seg_1996.startswith("R") and "M" in r.seg_1996
        rtot[r.seg_1996] += r.n_customers
    total = sum(rtot.values())
    assert total > 0
    # every segment label is one of the 16 possible
    segs = {f"R{i}M{j}" for i in range(1, 5) for j in range(1, 5)}
    assert {r.seg_1996 for r in rows} <= segs
    assert {r.seg_1997 for r in rows} <= segs


def test_cuped_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    pre = defaultdict(int)
    post = defaultdict(int)
    import datetime

    for r in o:
        d = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        v = int(round_half_up(r.o_totalprice))
        if datetime.date(1996, 1, 1) <= d < datetime.date(1997, 1, 1):
            pre[r.o_custkey] += v
        elif datetime.date(1997, 1, 1) <= d < datetime.date(1998, 1, 1):
            post[r.o_custkey] += v
    xs, ys = [], []
    for c, x in pre.items():
        xs.append(x)
        ys.append(post.get(c, 0))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    r = QUERIES["stats_cuped_variance_reduction"](spark, sf_small).collect()[0]
    assert r.n_customers == n
    assert abs(r.theta - cov / vx) < 1e-6
    assert abs(r.rho_squared - cov * cov / (vx * vy)) < 1e-6


def test_markov_entropy_rate_replica(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = defaultdict(int)
    for seq in per.values():
        seq.sort()
        for a, b in zip(seq, seq[1:]):
            trans[(a[2], b[2])] += 1
    nn = sum(trans.values())
    rowsum = defaultdict(int)
    for (c, _), v in trans.items():
        rowsum[c] += v
    h = -sum(
        (v / nn) * math.log(v / rowsum[c]) for (c, _), v in trans.items()
    )
    r = QUERIES["ts_markov_entropy_rate"](spark, sf_small).collect()[0]
    assert (r.n_transitions, r.n_states) == (nn, len(rowsum))
    assert abs(r.entropy_rate_nats - h) < 1e-6
    assert abs(r.perplexity - math.exp(h)) < 1e-6


def test_brand_weekly_corr_replica(spark, sf_small):
    import datetime
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    ).collect()
    pb = {r.p_partkey: r.p_brand for r in load(
        spark, sf_small, "part").select("p_partkey", "p_brand").collect()}
    start = datetime.date(1997, 1, 1)
    weekly = defaultdict(int)
    brands = set()
    for r in li:
        d = r.l_shipdate.date() if hasattr(r.l_shipdate, "date") else r.l_shipdate
        if datetime.date(1997, 1, 1) <= d < datetime.date(1998, 1, 1):
            wk = (d - start).days // 7
            b = pb[r.l_partkey]
            weekly[(b, wk)] += int(round_half_up(r.l_extendedprice))
            brands.add(b)
    series = {
        b: [weekly.get((b, w), 0) for w in range(52)] for b in brands
    }

    def corr(x, y):
        n = len(x)
        sx, sy = sum(x), sum(y)
        num = sum(a * b for a, b in zip(x, y)) - sx * sy / n
        den = math.sqrt(
            (sum(a * a for a in x) - sx * sx / n)
            * (sum(b * b for b in y) - sy * sy / n)
        )
        return num / den

    all_pairs = sorted(
        (corr(series[a], series[b]), a, b)
        for a in brands
        for b in brands
        if a < b
    )
    rows = QUERIES["olap_brand_weekly_corr_pairs"](spark, sf_small).collect()
    assert len(rows) == min(20, len(all_pairs))
    got = {(r.brand_a, r.brand_b): r.weekly_corr for r in rows}
    for cval, a, b in all_pairs[: len(rows)]:
        assert (a, b) in got
        assert abs(got[(a, b)] - cval) < 1e-6


def test_nation_assortment_jaccard_replica(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    ).collect()
    o = {r.o_orderkey: r.o_custkey for r in load(
        spark, sf_small, "orders").select("o_orderkey", "o_custkey").collect()}
    c = {r.c_custkey: r.c_nationkey for r in load(
        spark, sf_small, "customer").select("c_custkey", "c_nationkey").collect()}
    sets = defaultdict(set)
    for r in li:
        d = r.l_shipdate.date() if hasattr(r.l_shipdate, "date") else r.l_shipdate
        if datetime.date(1997, 1, 1) <= d < datetime.date(1998, 1, 1):
            sets[c[o[r.l_orderkey]]].add(r.l_partkey)
    rows = {(r.nation_a, r.nation_b): r for r in QUERIES[
        "olap_nation_assortment_jaccard"](spark, sf_small).collect()}
    ns = sorted(sets)
    for i in range(len(ns)):
        for j in range(i + 1, len(ns)):
            a, b = ns[i], ns[j]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in rows
                continue
            r = rows[(a, b)]
            assert (r.n_parts_a, r.n_parts_b, r.n_common) == (
                len(sets[a]), len(sets[b]), inter
            )
            uni = len(sets[a] | sets[b])
            assert abs(r.assortment_jaccard - inter / uni) < 1e-9


def test_shard_balance_replica(spark, sf_small):
    import hashlib
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text").collect()
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        s = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[0], 16)
        per[s][0] += 1
        per[s][1] += len(r.text)
    td = sum(v[0] for v in per.values())
    tb = sum(v[1] for v in per.values())
    k = len(per)
    mx = max(v[0] for v in per.values())
    rows = {r.shard: r for r in QUERIES[
        "curation_shard_balance_audit"](spark, sf_small).collect()}
    assert set(rows) == set(per)
    for s, (nd, nb) in per.items():
        r = rows[s]
        assert (r.n_docs, r.bytes) == (nd, nb)
        assert r.doc_balance_milli == nd * k * 1000 // td
        assert r.byte_balance_milli == nb * k * 1000 // tb
        assert r.worst_doc_balance_milli == mx * k * 1000 // td


def test_burstiness_replica(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "ts", "event_id"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id)
        )
    rows = {r.event_type: r for r in QUERIES[
        "ts_burstiness_coefficient"](spark, sf_small).collect()}
    for t, es in per.items():
        es.sort()
        gaps = [b[0] - a[0] for a, b in zip(es, es[1:])]
        n = len(gaps)
        mu = sum(gaps) / n
        sd = math.sqrt(max(sum(g * g for g in gaps) / n - mu * mu, 0))
        r = rows[t]
        assert r.n_gaps == n
        assert abs(r.mean_gap_s - mu / 1e6) < 1e-4
        assert abs(r.sd_gap_s - sd / 1e6) < 1e-3
        assert abs(r.burstiness_b - (sd - mu) / (sd + mu)) < 1e-6


def test_ratio_delta_ci_replica(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    per = defaultdict(lambda: [0, 0])
    for r in o:
        per[r.o_custkey][0] += int(round_half_up(r.o_totalprice))
        per[r.o_custkey][1] += 1
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    n = len(xs)
    ratio = sum(xs) / sum(ys)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum((x - mx) ** 2 for x in xs) / (n - 1)
    vy = sum((y - my) ** 2 for y in ys) / (n - 1)
    cxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
    se = math.sqrt((vx - 2 * ratio * cxy + ratio**2 * vy) / n) / my
    r = QUERIES["stats_ratio_metric_delta_ci"](spark, sf_small).collect()[0]
    assert r.n_customers == n
    assert abs(r.revenue_per_order - ratio) < 1e-6
    assert abs(r.delta_se - se) < 1e-6
    z = 1.959963984540054
    assert abs(r.ci_lo - (ratio - z * se)) < 1e-4
    assert abs(r.ci_hi - (ratio + z * se)) < 1e-4


def test_dedup_savings_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    cl = defaultdict(int)
    length = {}
    for r in docs:
        cl[(r.source, r.text)] += 1
        length[(r.source, r.text)] = len(r.text)
    agg = defaultdict(lambda: [0, 0, 0])
    for (s, t), n in cl.items():
        a = agg[s]
        a[0] += n
        a[1] += n - 1
        a[2] += (n - 1) * length[(s, t)]
    rows = {r.source: r for r in QUERIES[
        "curation_dedup_savings_forecast"](spark, sf_small).collect()}
    for s, (nd, rm, br) in agg.items():
        r = rows[s]
        assert (r.n_docs, r.dup_docs_removable, r.bytes_removable) == (
            nd, rm, br
        )
        assert abs(r.doc_savings_share - rm / nd) < 1e-9


def test_lr_symmetry_replica(spark, sf_small):
    """Kernel-level replay: decode the synthetic PNGs in python and
    recompute the 9x8 grid asymmetry."""
    import numpy as np

    from report_worker_spark.functions import multimodal as mm
    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("doc_id")
    media = mm.synthetic_image_media(docs, "doc_id").collect()
    rows = {r.media_id: r for r in QUERIES[
        "multimodal_image_lr_symmetry"](spark, sf_small).collect()}
    # synthetic_image_media emits PNG content for even ids only (odd
    # ids carry other media types and are quarantined by the kernel)
    media = [m for m in media if m.media_id in rows]
    assert len(rows) == len(media)
    for m in media[:50]:
        d = mm.decode_png_pixels(bytes(m.content))
        px = np.frombuffer(d["pixels"], dtype=np.uint8).astype(np.int64)
        c, w, h = d["channels"], d["width"], d["height"]
        img = px.reshape(h, w, c)
        g = img[:, :, :3].sum(axis=2) if c >= 3 else img[:, :, 0]
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(9) * w) // 9
        s = g[np.ix_(ys, xs)]
        asym = int(np.abs(s[:, :4] - s[:, 8:4:-1]).sum())
        r = rows[m.media_id]
        assert (r.width, r.height) == (w, h)
        assert r.asym_sum == asym
        assert r.grid_brightness == int(s.sum())
        assert r.asymmetry_milli == asym * 1000 // int(s.sum())


def test_weekday_hour_heatmap_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("ts", "value").collect()
    cells = defaultdict(lambda: [0, 0])
    for r in ev:
        # python weekday(): Mon=0; Spark dayofweek: Sun=1
        dow = (r.ts.weekday() + 1) % 7 + 1
        a = cells[(dow, r.ts.hour)]
        a[0] += 1
        a[1] += int(round_half_up(r.value * 100))
    rows = {(r.dow, r.hr): r for r in QUERIES[
        "olap_weekday_hour_heatmap"](spark, sf_small).collect()}
    assert set(rows) == set(cells)
    dow_tot = defaultdict(int)
    for (d, _), (n, _) in cells.items():
        dow_tot[d] += n
    for (d, h), (n, cents) in cells.items():
        r = rows[(d, h)]
        assert (r.n_events, r.cents) == (n, cents)
        assert abs(r.dow_share - n / dow_tot[d]) < 1e-9
    for d in dow_tot:
        peaks = [r for r in rows.values() if r.dow == d and r.is_peak_hour]
        assert len(peaks) == 1
        best = max(
            (cells[(d, h)][0], -h) for (dd, h) in cells if dd == d
        )
        assert (peaks[0].n_events, -peaks[0].hr) == best


def test_order_reconciliation_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    o = load(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    rec = defaultdict(int)
    for r in li:
        rec[r.l_orderkey] += int(
            round_half_up(
                r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax) * 100
            )
        )
    agg = defaultdict(lambda: [0, 0])
    for r in o:
        if r.o_orderkey not in rec:
            continue
        stated = int(round_half_up(r.o_totalprice * 100))
        diff = abs(stated - rec[r.o_orderkey])
        if diff == 0:
            b = "exact"
        elif diff * 1000 <= stated:
            b = "within_1pm"
        elif diff * 100 <= stated:
            b = "within_1pct"
        else:
            b = "gross"
        agg[b][0] += 1
        agg[b][1] = max(agg[b][1], diff)
    rows = {r.bucket: r for r in QUERIES[
        "audit_order_total_reconciliation"](spark, sf_small).collect()}
    assert set(rows) == set(agg)
    for b, (n, mx) in agg.items():
        assert (rows[b].n_orders, rows[b].max_diff_cents) == (n, mx)


def test_tfidf_signatures_replica(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    tf = defaultdict(Counter)
    for r in docs:
        tf[r.source].update(r.text.split(" "))
    df = Counter()
    for s in tf:
        df.update(set(tf[s]))
    n = len(tf)
    rows = defaultdict(dict)
    for r in QUERIES["text_tfidf_source_signatures"](spark, sf_small).collect():
        rows[r.source][r.rk] = r
    for s, cnts in tf.items():
        scored = sorted(
            (
                -(c * math.log((n + 1) / (df[w] + 1))),
                w,
            )
            for w, c in cnts.items()
        )[:5]
        assert set(rows[s]) == {1, 2, 3, 4, 5}
        for rk, (neg, w) in enumerate(scored, 1):
            r = rows[s][rk]
            assert r.term == w
            assert abs(r.tfidf - (-neg)) < 1e-6
            assert (r.tf, r.df) == (cnts[w], df[w])


def test_norm_eta_squared_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    emb = load(spark, sf_small, "embeddings").collect()
    per = defaultdict(list)
    for r in emb:
        q = [int(round_half_up(float(v) * 256)) for v in r.embedding]
        per[r.label].append(sum(x * x for x in q))
    allv = [x for v in per.values() for x in v]
    nn, st = len(allv), sum(allv)
    corr = st * st / nn
    ssq = sum(sum(v) ** 2 / len(v) for v in per.values())
    s2t = sum(x * x for x in allv)
    eta = (ssq - corr) / (s2t - corr)
    r = QUERIES["emb_norm_eta_squared"](spark, sf_small).collect()[0]
    assert (r.n_labels, r.n_vecs) == (len(per), nn)
    assert abs(r.eta_squared - eta) < 1e-6


def test_price_endings_replica(spark, sf_small):
    from collections import Counter

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    o = load(spark, sf_small, "orders").select("o_totalprice").collect()
    cnt = Counter(
        int(round_half_up(r.o_totalprice * 100)) % 100 for r in o
    )
    t, k = sum(cnt.values()), len(cnt)
    rows = {r.ending: r for r in QUERIES[
        "olap_price_endings_profile"](spark, sf_small).collect()}
    assert set(rows) == set(cnt)
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for rank, (e, n) in enumerate(order, 1):
        r = rows[e]
        assert r.n == n
        assert r.popularity_rank == rank
        assert abs(r.share - n / t) < 1e-9
        exp = t / k
        assert abs(r.chi2_term - (n - exp) ** 2 / exp) < 1e-6


def test_entry_exit_matrix_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id, r.event_type)
        )
    agg = defaultdict(lambda: [0, 0, 0])
    for seq in per.values():
        seq.sort()
        sessions = []
        for e in seq:
            if not sessions or e[0] - sessions[-1][-1][0] > 1_800_000_000:
                sessions.append([e])
            else:
                sessions[-1].append(e)
        for s in sessions:
            a = agg[(s[0][2], s[-1][2])]
            a[0] += 1
            a[1] += len(s)
            a[2] += int(len(s) == 1)
    rows = {(r.entry_type, r.exit_type): r for r in QUERIES[
        "sessionize_entry_exit_matrix"](spark, sf_small).collect()}
    assert set(rows) == set(agg)
    for k, (ns, ne, nb) in agg.items():
        r = rows[k]
        assert (r.n_sessions, r.n_events, r.n_bounces) == (ns, ne, nb)


def test_discount_response_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_discount", "l_quantity", "l_extendedprice"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in li:
        d = int(round_half_up(r.l_discount * 100))
        a = agg[d]
        a[0] += 1
        a[1] += int(r.l_quantity)
        a[2] += int(round_half_up(r.l_extendedprice))
    rows = {r.discount_pct: r for r in QUERIES[
        "olap_discount_response_curve"](spark, sf_small).collect()}
    assert set(rows) == set(agg)
    prev = None
    for d in sorted(agg):
        n, q, rev = agg[d]
        r = rows[d]
        assert (r.n_lines, r.total_qty, r.revenue_dollars) == (n, q, rev)
        mean = q / n
        assert abs(r.mean_qty - mean) < 1e-9
        if prev is None:
            assert r.monotonicity_violation is None
        else:
            assert r.monotonicity_violation == (mean < prev)
        prev = mean


def test_outlier_days_replica(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("ts", "value").collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        a = daily[r.ts.date()]
        a[0] += 1
        a[1] += int(round_half_up(r.value * 100))
    nd = len(daily)
    sn = sum(v[0] for v in daily.values())
    sn2 = sum(v[0] ** 2 for v in daily.values())
    mu = sn / nd
    var = sn2 / nd - mu * mu
    rows = {r.day: r for r in QUERIES[
        "audit_value_outlier_days"](spark, sf_small).collect()}
    for d, (n, cents) in daily.items():
        r = rows[d.strftime("%Y-%m-%d")]
        assert (r.n_events, r.cents) == (n, cents)
        assert abs(r.volume_z - (n - mu) / math.sqrt(var)) < 1e-6
        assert r.is_3sigma_outlier == (
            (n * nd - sn) ** 2 > 9 * (sn2 * nd - sn * sn)
        )


def test_multiclass_mcc_replica(spark, sf_small):
    """R_K from the confusion-matrix op's cells must equal the MCC
    op's output."""
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES

    conf = QUERIES["emb_centroid_confusion"](spark, sf_small).collect()
    s = sum(r.n_vecs for r in conf)
    c = sum(r.n_vecs for r in conf if r.label == r.pred_label)
    t = defaultdict(int)
    p = defaultdict(int)
    for r in conf:
        t[r.label] += r.n_vecs
        p[r.pred_label] += r.n_vecs
    pt = sum(t[k] * p.get(k, 0) for k in t)
    pp = sum(v * v for v in p.values())
    tt = sum(v * v for v in t.values())
    rk = (c * s - pt) / math.sqrt((s * s - pp) * (s * s - tt))
    r = QUERIES["emb_centroid_multiclass_mcc"](spark, sf_small).collect()[0]
    assert (r.n_vecs, r.n_correct) == (s, c)
    assert abs(r.accuracy - c / s) < 1e-9
    assert abs(r.multiclass_mcc - rk) < 1e-6


def test_padding_waste_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        n = len(r.text.strip().split())
        for b in (32, 64, 128):
            k = (b, r.source)
            seqs = -(-n // b)
            agg[k][0] += seqs
            agg[k][1] += n
            agg[k][2] += seqs * b - n
    rows = {(r.budget, r.source): r for r in QUERIES[
        "curation_padding_waste_curve"](spark, sf_small).collect()}
    assert set(rows) == set(agg)
    for k, (ns, rt, pt) in agg.items():
        r = rows[k]
        assert (r.n_sequences, r.real_tokens, r.pad_tokens) == (ns, rt, pt)
        assert abs(r.waste_share - pt / (rt + pt)) < 1e-9


def test_duplicate_events_replica(spark, sf_small):
    from collections import Counter, defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select(
        "event_type", "user_id", "ts", "value"
    ).collect()
    groups = Counter(
        (r.event_type, r.user_id, r.ts, int(round_half_up(r.value * 100)))
        for r in ev
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for (t, *_), m in groups.items():
        a = agg[t]
        a[0] += m
        if m > 1:
            a[1] += m
            a[2] += m - 1
        a[3] = max(a[3], m)
    rows = {r.event_type: r for r in QUERIES[
        "audit_exact_duplicate_events"](spark, sf_small).collect()}
    for t, (n, nd, nr, mx) in agg.items():
        r = rows[t]
        assert (r.n_events, r.n_in_dup_groups, r.n_redundant) == (n, nd, nr)
        assert r.max_multiplicity == mx
        assert abs(r.redundancy_share - nr / n) < 1e-9


def test_ols_slope_quarters_replica(spark, sf_small):
    import datetime
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_shipdate", "l_extendedprice"
    ).collect()
    start = datetime.date(1997, 1, 1)
    daily = defaultdict(int)
    for r in li:
        d = r.l_shipdate.date() if hasattr(r.l_shipdate, "date") else r.l_shipdate
        if datetime.date(1997, 1, 1) <= d < datetime.date(1998, 1, 1):
            daily[(d.month - 1) // 3 + 1, (d - start).days] += int(
                round_half_up(r.l_extendedprice * 100)
            )
    rows = {r.quarter: r for r in QUERIES[
        "stats_ols_slope_by_quarter"](spark, sf_small).collect()}
    for qn in {q for q, _ in daily}:
        pts = [(x, y) for (q, x), y in daily.items() if q == qn]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        r = rows[f"1997-Q{qn}"]
        assert r.n_days == n
        assert r.slope_num == n * sxy - sx * sy
        assert r.slope_den == n * sxx - sx * sx
        assert abs(r.slope_cents_per_day - r.slope_num / r.slope_den) < 1e-6


def test_user_accumulation_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    ev = load(spark, sf_small, "events").select("user_id", "ts").collect()
    first = {}
    per_day = defaultdict(int)
    for r in ev:
        d = r.ts.date()
        per_day[d] += 1
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    new_by_day = defaultdict(int)
    for d in first.values():
        new_by_day[d] += 1
    rows = {r.day: r for r in QUERIES[
        "olap_user_accumulation_curve"](spark, sf_small).collect()}
    cu = ce = 0
    seen_users = set()
    for d in sorted(per_day):
        cu += new_by_day.get(d, 0)
        ce += per_day[d]
        r = rows[d.strftime("%Y-%m-%d")]
        assert (r.n_events, r.n_new_users) == (per_day[d], new_by_day.get(d, 0))
        assert (r.cumulative_users, r.cumulative_events) == (cu, ce)
        seen_users |= {u for u, fd in first.items() if fd <= d}
        assert cu == len(seen_users)  # decomposition really is exact


def test_word_length_histogram_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    cells = defaultdict(int)
    for r in docs:
        for w in r.text.split(" "):
            cells[(r.source, min(len(w), 15))] += 1
    rows = {(r.source, r.word_len): r for r in QUERIES[
        "text_word_length_histogram"](spark, sf_small).collect()}
    assert set(rows) == set(cells)
    tot = defaultdict(int)
    for (s, _), n in cells.items():
        tot[s] += n
    for k, n in cells.items():
        r = rows[k]
        assert r.n_words == n
        assert abs(r.share - n / tot[k[0]]) < 1e-9


def test_price_index_replica(spark, sf_small):
    import datetime
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    li = load(spark, sf_small, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    ).collect()
    per = defaultdict(lambda: [0, 0])
    for r in li:
        d = r.l_shipdate.date() if hasattr(r.l_shipdate, "date") else r.l_shipdate
        if datetime.date(1996, 1, 1) <= d < datetime.date(1998, 1, 1):
            yr = 0 if d < datetime.date(1997, 1, 1) else 1
            a = per[(r.l_partkey, yr)]
            a[0] += int(round_half_up(r.l_extendedprice * 100))
            a[1] += int(r.l_quantity)
    parts = {p for (p, y) in per if y == 0} & {p for (p, y) in per if y == 1}
    parts = {
        p for p in parts if per[(p, 0)][1] > 0 and per[(p, 1)][1] > 0
    }
    s00 = sum(per[(p, 0)][0] for p in parts)
    s11 = sum(per[(p, 1)][0] for p in parts)
    s10 = sum(
        per[(p, 1)][0] * per[(p, 0)][1] / per[(p, 1)][1] for p in parts
    )
    s01 = sum(
        per[(p, 0)][0] * per[(p, 1)][1] / per[(p, 0)][1] for p in parts
    )
    r = QUERIES["olap_price_index_laspeyres_paasche"](spark, sf_small).collect()[0]
    assert r.n_parts == len(parts)
    assert (r.base_rev_cents, r.cur_rev_cents) == (s00, s11)
    assert abs(r.laspeyres_index - s10 / s00) < 1e-6
    assert abs(r.paasche_index - s11 / s01) < 1e-6
    assert abs(r.fisher_index - math.sqrt((s10 / s00) * (s11 / s01))) < 1e-6


def test_clustering_by_degree_replica(spark, sf_small):
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES, _cooccur_edges

    ed = {(r.src, r.dst) for r in _cooccur_edges(spark, sf_small).collect()}
    adj = defaultdict(set)
    for s, t in ed:
        adj[s].add(t)
        adj[t].add(s)
    buckets = defaultdict(list)
    for n, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(1 for u in nb for v in nb if u != v and v in adj[u])
        buckets[d.bit_length()].append(t / (d * (d - 1)))
    rows = {r.deg_bucket: r for r in QUERIES[
        "graph_clustering_by_degree"](spark, sf_small).collect()}
    assert set(rows) == set(buckets)
    for b, cs in buckets.items():
        r = rows[b]
        assert r.n_nodes == len(cs)
        assert r.bucket_low_degree == 2 ** (b - 1)
        assert abs(r.mean_local_clustering - sum(cs) / len(cs)) < 1e-6


def test_source_mix_entropy_replica(spark, sf_small):
    import math
    from collections import defaultdict

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans.tables import load

    docs = load(spark, sf_small, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        agg[r.source][0] += 1
        agg[r.source][1] += len(r.text)
    td = sum(v[0] for v in agg.values())
    tb = sum(v[1] for v in agg.values())
    hd = -sum((v[0] / td) * math.log(v[0] / td) for v in agg.values())
    hb = -sum((v[1] / tb) * math.log(v[1] / tb) for v in agg.values())
    r = QUERIES["curation_source_mix_entropy"](spark, sf_small).collect()[0]
    assert r.n_sources == len(agg)
    assert abs(r.doc_mix_entropy_nats - hd) < 1e-6
    assert abs(r.effective_sources_docs - math.exp(hd)) < 1e-5
    assert abs(r.byte_mix_entropy_nats - hb) < 1e-6
    assert abs(r.effective_sources_bytes - math.exp(hb)) < 1e-5


def test_dtw_distance_rejects_wrap_prone_magnitudes():
    """ADVICE r11: raw int64 differences wrap (not saturate) when
    |va|+|vb| >= 2^63; inputs are bounded to |v| < 2^62 up front so
    every computed cost is int64-exact."""
    import pytest

    from report_worker_spark.functions.timeseries import dtw_distance

    ok = dtw_distance([2**61, 0], [-(2**61), 1])
    assert ok >= 0  # saturated, never negative/wrapped
    with pytest.raises(ValueError, match="2\\*\\*62"):
        dtw_distance([2**62], [0])
    with pytest.raises(ValueError, match="2\\*\\*62"):
        dtw_distance([0], [-(2**62)])
    # ADVICE r12: np.abs(int64 min) wraps NEGATIVE, so an abs-based
    # guard let exactly -2**63 through; the min/max guard must not
    with pytest.raises(ValueError, match="2\\*\\*62"):
        dtw_distance([-(2**63)], [0])
    with pytest.raises(ValueError, match="2\\*\\*62"):
        dtw_distance([0], [-(2**63)])


def _within1(a: str, b: str) -> bool:
    """Exact edit-distance-<=1 predicate (O(n) two-pointer)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = used = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        else:
            if used:
                return False
            used = 1
            j += 1
    return True


def test_deletion_neighborhood_complete_vs_brute_force(spark, sf_oracle):
    """VERDICT r13 item 3 acceptance: brute-force equality at sf0.01 —
    the deletion-neighborhood blocking must find EVERY edit-distance-<=1
    pair (the old mod-40 key missed cross-block pairs by construction).
    Runs on the catalog query's %4 customer sample plus a synthetic set
    exercising the insertion/deletion paths TPC-H's fixed-width names
    never hit."""
    from report_worker_spark.operators import deletion_neighborhood_pairs

    c = (
        spark.read.parquet(f"{sf_oracle}/customer.parquet")
        .filter(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", "c_name")
    )
    names = c.collect()
    want = {
        (x.c_custkey, y.c_custkey)
        for x in names
        for y in names
        if x.c_custkey < y.c_custkey and _within1(x.c_name, y.c_name)
    }
    got = {
        (r.id_a, r.id_b)
        for r in deletion_neighborhood_pairs(
            c, "c_custkey", "c_name"
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # non-vacuous on the fixture

    syn = [
        (1, "kitten"), (2, "kitte"), (3, "kittens"), (4, "mitten"),
        (5, "sitting"), (6, "kit"), (7, ""), (8, "a"), (9, "b"),
        (10, "ab"), (11, "kitten"),
    ]
    sdf = spark.createDataFrame(syn, ["id", "name"])
    got_s = {
        (r.id_a, r.id_b)
        for r in deletion_neighborhood_pairs(sdf, "id", "name").collect()
    }
    want_s = {
        (i, j)
        for i, a in syn
        for j, b in syn
        if i < j and _within1(a, b)
    }
    assert got_s == want_s


def test_poisson_bootstrap_ci_zero_purchases_matches_oracle(
    spark, tmp_path
):
    """Zero-input behavior pin (ADVICE r14): with no purchase events the
    r14 conditional-aggregate form emits ONE row with n_rows=0 and NULL
    point_mean/ci_lo/ci_hi — exactly what the DuckDB oracle's scalar
    subqueries produce — where the pre-r14 rn==2/rn==63 filter form
    produced zero rows. Build a purchase-free events fixture and assert
    Spark and the oracle agree on it."""
    import shutil

    import pyarrow.parquet as pq

    from report_worker_spark.plans.catalog import QUERIES
    from report_worker_spark.plans._qshared import ORACLE
    from report_worker_spark.plans.tables import TABLES
    from tests.oracle_harness import canon, run_oracle

    src = "/root/testdata/sf0.001"
    fix = tmp_path / "sf_zero_purchase"
    fix.mkdir()
    for t in TABLES:
        if t == "events":
            tbl = pq.read_table(f"{src}/events.parquet")
            mask = [v != "purchase" for v in tbl["event_type"].to_pylist()]
            pq.write_table(tbl.filter(mask), fix / "events.parquet")
        else:
            shutil.copy(f"{src}/{t}.parquet", fix / f"{t}.parquet")

    sp = QUERIES["stats_poisson_bootstrap_ci"](spark, str(fix)).toPandas()
    oc = run_oracle(ORACLE["stats_poisson_bootstrap_ci"], str(fix))
    assert len(sp) == 1
    row = sp.iloc[0]
    assert row["n_rows"] == 0
    assert row[["point_mean", "ci_lo", "ci_hi"]].isna().all()
    assert canon(sp.astype(object).where(sp.notna(), None)) == canon(
        oc.astype(object).where(oc.notna(), None)
    )
