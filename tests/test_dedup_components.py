from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.functions.dedup import (
    connected_components,
    dedup_canonical,
    ngram_jaccard_pairs,
)


def test_components_chain_and_islands(spark):
    # graph: 1-2-3 chain, 5-6 pair, 9 isolated (no edges → absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_components_long_chain_converges(spark):
    n = 16  # diameter 16 — several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comps = connected_components(pairs, max_iterations=50).collect()
    assert {r.component for r in comps} == {0}
    assert len(comps) == n + 1


def test_dedup_canonical_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d e f g"),        # dup of 1
            (3, "a b c d e f g h"),      # near-dup of 1/2
            (10, "x y z w q r t"),
            (11, "completely different text here now ok yes"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    out = dedup_canonical(docs, pairs)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 10, 11]


def test_jaccard_length_filter_keeps_boundary_pairs(spark):
    """The AllPairs length filter (r13) prunes candidates with
    t*max(sz) > min(sz); pairs sitting EXACTLY on the bound must
    survive. A ⊂ B with |A|=4, |B|=8 distinct 1-grams has
    J = 4/8 = 0.5 and min = t*max exactly at t=0.5 — a naive float
    product (0.5*8 an ULP high) would drop it without the epsilon."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),                  # 4 distinct 1-grams
            (2, "a b c d e f g h"),          # superset, 8 distinct
            (3, "p q r s t u v w x y"),      # 10 — below the bound vs 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=1, threshold=0.5).collect()
    }
    assert (1, 2) in got and abs(got[(1, 2)] - 0.5) < 1e-12
    assert (1, 3) not in got and (2, 3) not in got


def test_jaccard_length_filter_matches_bruteforce(spark):
    """Exactness regression for the r13 length filter: the filtered
    pipeline must return the identical pair set as a brute-force
    all-pairs Jaccard over the same shingles, across thresholds."""
    rows = []
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    for i in range(12):
        # varied lengths + heavy overlap so near-boundary pairs exist
        rows.append((i, " ".join(words[: 3 + (i % 7)])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(t):
        sets = {
            i: {
                " ".join(txt.split()[j : j + 2])
                for j in range(len(txt.split()) - 1)
            }
            for i, txt in rows
        }
        out = {}
        ids = sorted(sets)
        for x in ids:
            for y in ids:
                if x < y and sets[x] and sets[y]:
                    j = len(sets[x] & sets[y]) / len(sets[x] | sets[y])
                    if j >= t:
                        out[(x, y)] = round(j, 9)
        return out

    for t in (0.5, 0.6, 0.8):
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(docs, n=2, threshold=t).collect()
        }
        assert got == brute(t), t
