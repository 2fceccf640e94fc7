"""ngram_overlap_pairs (containment / overlap-coefficient dedup) vs a
brute-force pure-Python reference — verifies the smaller-side prefix
filter admits every qualifying pair (no false negatives) and the exact
verification kills every non-qualifying candidate."""

from __future__ import annotations

import re

from report_worker_spark.functions.dedup import ngram_overlap_pairs

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    # 0: base
    BASE,
    # 1: exact copy → overlap 1.0
    BASE,
    # 2: base fully contained in a longer doc → overlap 1.0, low Jaccard
    "intro words here " + BASE + " trailing boilerplate tail words end",
    # 3: half of base → fully contained in 0 (and 2)
    "alpha beta gamma delta epsilon zeta",
    # 4: unrelated
    "one two three four five six seven eight nine ten",
    # 5: shares a bit of base → below 0.9
    "alpha beta gamma unrelated tokens continue here now",
]


def _grams(text: str, n: int = 3) -> set[str]:
    t = re.split(r"\s+", text.strip())
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _py_pairs(threshold: float = 0.9):
    out = {}
    gs = [_grams(t) for t in DOCS]
    for a in range(len(DOCS)):
        for b in range(a + 1, len(DOCS)):
            inter = len(gs[a] & gs[b])
            denom = min(len(gs[a]), len(gs[b]))
            if denom and inter / denom >= threshold:
                out[(a, b)] = (inter, inter / denom)
    return out


def test_overlap_pairs_match_bruteforce(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): (r.n_common, r.overlap)
        for r in ngram_overlap_pairs(df, n=3, threshold=0.9).collect()
    }
    want = _py_pairs()
    assert got == want
    # the containment cases Jaccard misses are present
    assert (0, 2) in got and got[(0, 2)][1] == 1.0
    assert (0, 3) in got and got[(0, 3)][1] == 1.0


def test_overlap_threshold_filters(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b)
        for r in ngram_overlap_pairs(df, n=3, threshold=0.5).collect()
    }
    want = set(_py_pairs(0.5))
    assert got == want
    # lowering the bar can only widen the result set
    assert set(_py_pairs(0.9)) <= got
