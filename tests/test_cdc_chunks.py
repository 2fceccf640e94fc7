"""Content-defined chunking: the property that justifies CDC over
fixed-size chunking is boundary re-synchronization after an edit."""

from __future__ import annotations

from pyspark.sql import functions as F

from report_worker_spark.functions.text import cdc_chunks


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, k=3, modulus=4)
    return {
        r.doc_id: sorted(
            (r2.chunk_idx, r2.chunk_start, r2.n_tokens, r2.chunk_hash)
            for r2 in out.filter(F.col("doc_id") == r.doc_id).collect()
        )
        for r in df.select("doc_id").distinct().collect()
    }


def test_cdc_chunks_cover_document(spark):
    text = " ".join(f"w{i % 17}" for i in range(200))
    got = _chunks(spark, [(1, text)])[1]
    # chunks partition the token range exactly
    assert sum(c[2] for c in got) == 200
    starts = [c[1] for c in got]
    sizes = dict((c[1], c[2]) for c in got)
    assert min(starts) == 0
    for s in starts:
        nxt = s + sizes[s]
        assert nxt == 200 or nxt in sizes


def test_cdc_boundaries_resynchronize_after_edit(spark):
    """Prepending tokens must leave the SUFFIX chunking identical once
    boundaries re-sync — the content-defined property. A fixed-size
    chunker would shift every boundary and share nothing."""
    base = " ".join(f"t{(i * 7) % 23}" for i in range(300))
    edited = "xx yy " + base
    res = _chunks(spark, [(1, base), (2, edited)])
    h1 = {c[3] for c in res[1]}
    h2 = {c[3] for c in res[2]}
    shared = h1 & h2
    # the vast majority of chunks survive the edit byte-identically
    assert len(shared) >= len(h1) * 0.6, (len(shared), len(h1))


def test_cdc_identical_docs_identical_chunks(spark):
    text = " ".join(f"a{i % 13}" for i in range(150))
    res = _chunks(spark, [(1, text), (2, text)])
    assert [c[1:] for c in res[1]] == [c[1:] for c in res[2]]
