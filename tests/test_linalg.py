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

def _py_lloyds(m, k, iters):
    cent = m[:k].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cells = d2.argmin(axis=1)
        nxt = cent.copy()
        for c in range(k):
            sel = m[cells == c]
            if len(sel):
                nxt[c] = sel.mean(axis=0)
        cent = nxt
    return cent


def test_kmeans_matches_numpy_lloyds(spark):
    from report_worker_spark.functions.linalg import kmeans_assign, kmeans_fit

    df, ids, m = _local(spark)
    # id-ordered init on both sides: sort the local matrix by vec_id
    order = np.argsort(ids)
    m_sorted = m[order]
    got = kmeans_fit(df.orderBy("vec_id"), dim=64, k=8, iterations=3)
    want = _py_lloyds(m_sorted, k=8, iters=3)
    assert np.allclose(got, want, atol=1e-9)

    assign = {
        r.vec_id: r.cell for r in kmeans_assign(df, got).collect()
    }
    d2 = ((m_sorted[:, None, :] - want[None, :, :]) ** 2).sum(axis=2)
    want_cells = d2.argmin(axis=1)
    ids_sorted = ids[order]
    mismatches = sum(
        1 for i, vid in enumerate(ids_sorted) if assign[vid] != want_cells[i]
    )
    assert mismatches == 0


def test_kmeans_objective_nonincreasing(spark):
    from report_worker_spark.functions.linalg import kmeans_assign, kmeans_fit

    df, _, m = _local(spark)
    prev = None
    for iters in (1, 3, 5):
        cent = kmeans_fit(df, dim=64, k=8, iterations=iters)
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        obj = d2.min(axis=1).sum()
        if prev is not None:
            assert obj <= prev + 1e-9
        prev = obj


def test_whitening_and_mahalanobis_match_numpy(spark):
    """Laws of the ZCA/Mahalanobis pair: (1) W matches the numpy
    eigen-reconstruction; (2) the whitened sample covariance is ~I
    (up to the eps regularizer); (3) the distributed maha² equals the
    direct (v−μ)ᵀ(Σ+εI)⁻¹(v−μ) computed with numpy.linalg.inv; (4)
    repeated runs are deterministic."""
    from report_worker_spark.functions.linalg import (
        mahalanobis_distances,
        whiten_project,
        whitening_matrix,
    )

    df, ids, m = _local(spark)
    eps = 1e-6
    mu, w = whitening_matrix(df, dim=64, eps=eps)
    cov = np.cov(m, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    want_w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0) + eps)) @ vecs.T
    assert np.allclose(w, want_w, atol=1e-8)
    assert np.allclose(w, w.T, atol=1e-12)  # ZCA is symmetric

    white = {r.vec_id: np.asarray(r.white) for r in
             whiten_project(df, dim=64, eps=eps).collect()}
    wm = np.stack([white[v] for v in ids])
    wc = np.cov(wm, rowvar=False)
    # identity up to eps-shrinkage of the true eigenvalues
    assert np.allclose(wc, np.eye(64), atol=1e-3)

    inv = np.linalg.inv(cov + eps * np.eye(64))
    cen = m - m.mean(axis=0)
    want_d = np.einsum("ij,jk,ik->i", cen, inv, cen)
    got1 = {r.vec_id: r.maha2 for r in
            mahalanobis_distances(df, dim=64, eps=eps).collect()}
    got2 = {r.vec_id: r.maha2 for r in
            mahalanobis_distances(df, dim=64, eps=eps).collect()}
    assert got1 == got2  # deterministic
    got = np.array([got1[v] for v in ids])
    assert np.allclose(got, want_d, rtol=1e-6, atol=1e-6)


def test_projectors_honor_custom_id_col(spark):
    """ADVICE r11: pca_project / whiten_project / mahalanobis_distances
    must name the id output column after id_col, not hardcoded vec_id."""
    from report_worker_spark.functions import linalg

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(12)],
        "doc_id long, embedding array<double>",
    )
    p = linalg.pca_project(df, id_col="doc_id", vec_col="embedding", dim=3, q=2)
    assert p.columns == ["doc_id", "proj"]
    w = linalg.whiten_project(df, id_col="doc_id", vec_col="embedding", dim=3)
    assert w.columns == ["doc_id", "white"]
    m = linalg.mahalanobis_distances(df, id_col="doc_id", vec_col="embedding", dim=3)
    assert m.columns == ["doc_id", "maha2"]
    assert m.count() == 12
