"""Exact-substring dedup (duplicate_spans / substring_dup_stats) vs a
brute-force pure-Python reference: slide k-windows, mark globally
repeated ones, union overlapping windows into maximal spans. Verifies
span maximality (adjacent/overlapping windows merge, gaps split),
within-doc repeats counting toward min_count, the sub-k invisibility
bound, and the zero-fill + disjoint-span accounting of the stats op."""

from __future__ import annotations

import re
from collections import Counter

from report_worker_spark.functions.dedup import (
    duplicate_spans,
    substring_dup_stats,
    substring_trim,
)

K = 4

SHARED = "red orange yellow green blue indigo violet"  # 7 tokens
DOCS = [
    # 0/1 share SHARED at different offsets → one maximal span each
    "start tokens here " + SHARED + " tail zero",
    SHARED + " completely different ending words",
    # 2: two separate copies of a 4-token phrase WITHIN one doc
    # (within-doc repeat alone must trigger min_count=2)
    "aa bb cc dd xx yy zz ww aa bb cc dd",
    # 3: no duplication at all
    "unique words that appear nowhere else in this corpus at all",
    # 4: shares only a 3-token run with doc 0 → invisible at k=4
    "red orange yellow but then it diverges completely afterwards",
]


def _toks(t: str) -> list[str]:
    return re.split(r"\s+", t.strip())


def _py_spans(docs: list[str], k: int, min_count: int = 2):
    wins: list[tuple[int, int, str]] = []
    for d, t in enumerate(docs):
        toks = _toks(t)
        for i in range(len(toks) - k + 1):
            wins.append((d, i, " ".join(toks[i : i + k])))
    counts = Counter(w for _, _, w in wins)
    out = []
    for d in range(len(docs)):
        marked = sorted(
            p for (dd, p, w) in wins if dd == d and counts[w] >= min_count
        )
        spans: list[list[int]] = []
        for p in marked:
            if spans and p <= spans[-1][1] - k + 1 + k:  # p <= prev_max_pos + k
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        out.extend((d, s, e, e - s + 1) for s, e in spans)
    return sorted(out)


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )


def test_spans_match_bruteforce(spark):
    got = sorted(
        tuple(r)
        for r in duplicate_spans(_df(spark, DOCS), k=K).select(
            "doc_id", "span_start", "span_end", "span_tokens"
        ).collect()
    )
    assert got == _py_spans(DOCS, K)


def test_within_doc_repeat_counts(spark):
    # doc 2 alone: its internal "aa bb cc dd" repeat must be found
    got = duplicate_spans(_df(spark, [DOCS[2]]), k=K).collect()
    spans = sorted((r.span_start, r.span_end) for r in got)
    assert spans == [(0, 3), (8, 11)]


def test_sub_k_runs_invisible(spark):
    # docs 0 and 4 share only 3 tokens — no span at k=4 between them;
    # doc 4 must produce nothing
    got = duplicate_spans(_df(spark, DOCS), k=K).filter("doc_id = 4")
    assert got.count() == 0


def test_adjacent_windows_merge_to_maximal_span(spark):
    # SHARED is 7 tokens → 4 overlapping duplicated windows at k=4;
    # they must merge into exactly ONE span of 7 tokens per doc
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(_df(spark, DOCS[:2]), k=K).collect()
    }
    assert spans[0] == (3, 9, 7)  # offset 3 in doc 0
    assert spans[1] == (0, 6, 7)
    # gap case: doc 2's two spans must NOT merge (gap of 4 > 0 between)
    got2 = duplicate_spans(_df(spark, DOCS), k=K).filter("doc_id = 2")
    assert got2.count() == 2


def test_stats_zero_fill_and_disjoint_sum(spark):
    stats = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
        for r in substring_dup_stats(_df(spark, DOCS), k=K).collect()
    }
    assert len(stats) == len(DOCS)  # every doc present
    assert stats[3][1] == 0 and stats[3][2] == 0.0  # zero-filled
    assert stats[2] == (12, 8, 8 / 12)  # two disjoint 4-token spans
    assert stats[1][1] == 7  # the SHARED run
    # ratio bounded
    assert all(0.0 <= v[2] <= 1.0 for v in stats.values())


def test_short_docs_excluded(spark):
    # docs shorter than k tokens produce no windows and no crash
    docs = ["one two three", "one two three", "one two three four"]
    got = duplicate_spans(_df(spark, docs), k=4).collect()
    assert got == []


def test_trim_keeps_first_occurrence(spark):
    got = {
        r.doc_id: (r.text, r.kept_tokens, r.removed_tokens)
        for r in substring_trim(_df(spark, DOCS), k=K).collect()
    }
    assert len(got) == len(DOCS)  # every doc survives as a row
    # doc 0 is the FIRST occurrence of SHARED → untouched
    assert got[0] == (DOCS[0], 12, 0)
    # doc 1's copy of SHARED (positions 0-6) is cut
    assert got[1] == ("completely different ending words", 4, 7)
    # doc 2: first "aa bb cc dd" kept, second (positions 8-11) cut
    assert got[2] == ("aa bb cc dd xx yy zz ww", 8, 4)
    # untouched docs pass through verbatim
    assert got[3] == (DOCS[3], 11, 0)
    assert got[4] == (DOCS[4], 9, 0)


def test_trim_fully_duplicated_doc_goes_empty(spark):
    docs = ["a b c d", "a b c d", "x y z w q"]
    got = {
        r.doc_id: (r.text, r.kept_tokens, r.removed_tokens)
        for r in substring_trim(_df(spark, docs), k=4).collect()
    }
    assert got[0] == ("a b c d", 4, 0)  # keep-first winner
    assert got[1] == ("", 0, 4)  # loser fully trimmed, row retained
    assert got[2] == ("x y z w q", 5, 0)


def test_trim_removes_no_first_occurrences_corpus_wide(spark):
    # after trimming, every duplicated span's text still occurs at
    # least once in the corpus (the keep-first guarantee)
    spans = duplicate_spans(_df(spark, DOCS), k=K).collect()
    trimmed = {
        r.doc_id: r.text
        for r in substring_trim(_df(spark, DOCS), k=K).collect()
    }
    for s in spans:
        toks = _toks(DOCS[s.doc_id])
        span_txt = " ".join(toks[s.span_start : s.span_end + 1])
        assert any(span_txt in t for t in trimmed.values()), span_txt


def test_trim_span_key_distinguishes_window_placement(spark):
    # ADVICE_r5 (high): spans whose duplicated-window HASH sequences
    # match but whose placement differs must not share a span key.
    # With k=4, doc 1's 7-token span contains the same set of
    # duplicated window hashes as doc 0's 5-token span (periodic
    # token repetition), but the texts differ — doc 1's full text is
    # unique in the corpus and must survive keep-first intact.
    docs = ["a b c b x", "a b c b c b x"]
    got = {
        r.doc_id: (r.text, r.kept_tokens, r.removed_tokens)
        for r in substring_trim(_df(spark, docs), k=4).collect()
    }
    assert got[0] == ("a b c b x", 5, 0)
    assert got[1] == ("a b c b c b x", 7, 0)
