"""curation_dsir_weights sanity: with target = the 'en' slice, documents
drawn from the target vocabulary must score a strictly higher mean
importance log-ratio than documents from a disjoint vocabulary, and the
weights must be deterministic across runs (md5 bucketing, no RNG)."""

from __future__ import annotations

from report_worker_spark.plans.catalog import QUERIES

EN = [
    (i, "the quick brown fox jumps over the lazy dog again and again", "en")
    for i in range(8)
]
ZZ = [
    (100 + i, "zork blag frumple xyzzy quux wibble snark gronk plugh", "zz")
    for i in range(8)
]


def _write(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(EN + ZZ, ["doc_id", "text", "lang"]).write.parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_dsir_separates_target_from_offtarget(spark, tmp_path):
    sf = _write(spark, tmp_path)
    rows = QUERIES["curation_dsir_weights"](spark, sf).collect()
    w = {r.doc_id: r.dsir_logratio for r in rows}
    assert len(w) == 16
    en_scores = [w[i] for i, _, _ in EN]
    zz_scores = [w[i] for i, _, _ in ZZ]
    assert min(en_scores) > max(zz_scores)
    # target-vocab docs look target-like (positive log ratio), the
    # disjoint vocabulary does not
    assert all(s > 0 for s in en_scores)
    assert all(s < 0 for s in zz_scores)


def test_dsir_deterministic(spark, tmp_path):
    sf = _write(spark, tmp_path)
    a = sorted(map(tuple, QUERIES["curation_dsir_weights"](spark, sf).collect()))
    b = sorted(map(tuple, QUERIES["curation_dsir_weights"](spark, sf).collect()))
    assert a == b
