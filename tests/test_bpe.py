"""Distributed BPE training (functions/bpe.py) vs a pure-Python
reference implementation: pair counts weighted by word frequency
(overlapping adjacent pairs counted, as in standard BPE), argmax with
the (count DESC, lhs ASC, rhs ASC) tie-break, non-overlapping
left-to-right merge application, early stop when the vocab is fully
merged, and the segment-count op."""

from __future__ import annotations

import re
from collections import Counter

from report_worker_spark.functions.bpe import (
    bpe_merges,
    bpe_segment,
    bpe_word_freqs,
)


def _py_bpe(docs: list[str], n_merges: int):
    wf = Counter(
        w for d in docs for w in re.split(r"\s+", d.strip()) if w
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in wf.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        # re-derive vocab by applying all merges so far to each word
        vocab = {}
        for w, f in wf.items():
            syms = tuple(w)
            for _, ma, mb, _, _ in merges:
                syms = _merge_word(syms, ma, mb)
            vocab[syms] = vocab.get(syms, 0) + f
    return merges


def _merge_word(syms: tuple[str, ...], a: str, b: str):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


DOCS = [
    "low lower lowest low low",
    "new newer newest new",
    "aaaa banana ha ha ha",
    "wide wider widest wide",
]


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )


def test_merges_match_python_reference(spark):
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_merges(_df(spark, DOCS), n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _py_bpe(DOCS, 8)


def test_overlapping_pair_counts_and_nonoverlapping_merge(spark):
    # "aaaa" has 3 overlapping (a,a) pair sites but merging yields
    # exactly "aa","aa" — counts overlap, application doesn't
    docs = ["aaaa aaaa aaaa"]
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_merges(_df(spark, docs), n_merges=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got[0] == (1, "a", "a", "aa", 9)  # 3 sites × word freq 3
    # after merge 1 each word is (aa, aa): 1 site × word freq 3
    assert got[1] == (2, "aa", "aa", "aaaa", 3)
    assert got == _py_bpe(docs, 2)


def test_early_stop_when_vocab_fully_merged(spark):
    docs = ["ab ab ab"]
    got = bpe_merges(_df(spark, docs), n_merges=5).collect()
    assert len(got) == 1  # one merge exhausts all pairs
    assert (got[0].lhs, got[0].rhs, got[0].pair_count) == ("a", "b", 3)


def test_word_freqs_one_corpus_pass(spark):
    wf = {
        r.w: r.freq
        for r in bpe_word_freqs(_df(spark, DOCS)).collect()
    }
    assert wf["low"] == 3 and wf["ha"] == 3 and wf["new"] == 2


def test_segment_counts_match_python(spark):
    merges = bpe_merges(_df(spark, DOCS), n_merges=8)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_segment(_df(spark, DOCS), merges).collect()
    }
    py = _py_bpe(DOCS, 8)
    for d, text in enumerate(DOCS):
        words = re.split(r"\s+", text.strip())
        n_bpe = 0
        for w in words:
            syms = tuple(w)
            for _, a, b, _, _ in py:
                syms = _merge_word(syms, a, b)
            n_bpe += len(syms)
        assert got[d] == (len(words), n_bpe), (d, text)


def test_no_mergeable_pairs_returns_empty_merges(spark):
    """ADVICE_r5 (low): single-symbol words (and empty corpora) yield
    zero adjacent pairs on the FIRST iteration — bpe_merges must
    return an empty merges frame, not raise from a seedless reduce."""
    single = spark.createDataFrame([("a a b",)], ["text"])
    got = bpe_merges(single, n_merges=3)
    assert got.count() == 0
    assert got.columns == [
        "merge_rank", "lhs", "rhs", "merged", "pair_count"
    ]
    empty = spark.createDataFrame([], "text STRING")
    assert bpe_merges(empty, n_merges=3).count() == 0
