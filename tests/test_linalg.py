"""Distributed PCA vs numpy on the collected data — same math, the
distributed path just accumulates (n, Σv, Σvvᵀ) per partition."""

from __future__ import annotations

import numpy as np

from report_worker_spark.functions.linalg import pca_components, pca_project
from report_worker_spark.plans.tables import load

SF = "/root/testdata/sf0.001"


def _local(spark):
    df = load(spark, SF, "embeddings")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return df, ids, m


def test_components_match_numpy(spark):
    df, _, m = _local(spark)
    mu, comps, var = pca_components(df, dim=64, q=4)
    assert np.allclose(mu, m.mean(axis=0), atol=1e-9)
    c = np.cov(m, rowvar=False)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:4]
    want = vecs[:, order].T
    for i in range(4):
        w = want[i]
        j = int(np.argmax(np.abs(w)))
        if w[j] < 0:
            w = -w
        assert np.allclose(comps[i], w, atol=1e-6), i
    assert np.allclose(var, vals[order], atol=1e-9)


def test_projection_matches_numpy_and_is_deterministic(spark):
    df, ids, m = _local(spark)
    mu, comps, _ = pca_components(df, dim=64, q=4)
    got = {r.vec_id: np.asarray(r.proj) for r in pca_project(df, dim=64, q=4).collect()}
    want = (m - m.mean(axis=0)) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-6)
    again = {r.vec_id: np.asarray(r.proj) for r in pca_project(df, dim=64, q=4).collect()}
    for vid in got:
        assert np.array_equal(got[vid], again[vid])


def test_variance_concentrates(spark):
    df, _, m = _local(spark)
    _, _, var = pca_components(df, dim=64, q=64)
    assert np.all(var[:-1] >= var[1:] - 1e-12)  # sorted descending
    assert var[0] > 0