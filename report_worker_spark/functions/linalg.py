"""Distributed linear algebra over embedding columns: mean/Gram
accumulation and PCA projection.

Scale shape: statistics that are LINEAR in the data (count, Σv, Σvvᵀ)
accumulate per partition in one Arrow pass — each task emits ONE
(d + d² + 1)-float row, so the driver combines #partitions tiny
partials regardless of row count (d=64 ⇒ ~33 KB per partial). The
eigendecomposition is d×d on the driver (microseconds), and the
projection back over the data is a broadcast matmul in a second Arrow
pass — no shuffle anywhere, both passes are embarrassingly parallel.
This is the treeAggregate pattern expressed in DataFrame terms; for
d ≫ 10³ switch the combine to a two-level aggregation before the
driver.

Determinism: partial sums combine on the driver in partition-index
order (sorted), and eigenvector sign is fixed by the
largest-magnitude-component-positive convention, so results are
reproducible across runs at a fixed partitioning. (Float addition is
not associative; a different partition COUNT changes low-order bits —
callers that need bit-stability across layouts should fix the input
partitioning, as the tests do.)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import spread


def _moment_partials(df: DataFrame, vec_col: str, dim: int) -> list:
    """One (part_id, n, Σv, flat Σvvᵀ) row per non-empty partition."""

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        pid = -1
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            n += len(m)
            s += m.sum(axis=0)
            g += m.T @ m
            pid = int(pb["_pid"].iloc[0])
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    rows = (
        spread(df)
        .select(F.col(vec_col), F.spark_partition_id().alias("_pid"))
        .mapInPandas(
            acc, schema="pid int, n long, s array<double>, g array<double>"
        )
        .collect()
    )
    return sorted(rows, key=lambda r: r.pid)


def pca_components(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, q: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-q principal components of the embedding column.

    Returns (mean, components[q, dim], explained_variance[q]).
    """
    parts = _moment_partials(df, vec_col, dim)
    if not parts:
        raise ValueError("empty input")
    n = sum(r.n for r in parts)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in parts:  # deterministic partition-index order
        s += np.asarray(r.s)
        g += np.asarray(r.g).reshape(dim, dim)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:q]
    comps = vecs[:, order].T  # (q, dim)
    # sign convention: largest-|component| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, vals[order]


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    q: int = 8,
) -> DataFrame:
    """(id, projection[q]) — centered projection onto the top-q
    components, broadcast matmul in one Arrow pass."""
    mu, comps, _ = pca_components(df, vec_col, dim=dim, q=q)
    bc = df.sparkSession.sparkContext.broadcast((mu, comps.T))  # (dim, q)
    id_type = df.schema[id_col].dataType.simpleString()

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_mu, m_w = bc.value
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            p = (m - m_mu) @ m_w
            yield pd.DataFrame(
                {id_col: pb[id_col].to_numpy(), "proj": list(p)}
            )

    return (
        spread(df)
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(project, schema=f"{id_col} {id_type}, proj array<double>")
    )


def whitening_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, eps: float = 1e-6
) -> tuple[np.ndarray, np.ndarray]:
    """ZCA whitening transform from the same one-pass moment partials
    as PCA: W = V diag((lam + eps)^-1/2) V^T (symmetric, so whitened
    vectors stay maximally close to the originals — the variant
    retrieval/semantic-dedup preprocessing wants). eps regularizes
    near-null directions; the d x d eigh runs on the driver like
    pca_components. Returns (mean, W[dim, dim])."""
    parts = _moment_partials(df, vec_col, dim)
    if not parts:
        raise ValueError("empty input")
    n = sum(r.n for r in parts)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in parts:  # deterministic partition-index order
        s += np.asarray(r.s)
        g += np.asarray(r.g).reshape(dim, dim)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0.0) + eps)) @ vecs.T
    return mu, w


def whiten_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    eps: float = 1e-6,
) -> DataFrame:
    """(id, whitened[dim]) — centered ZCA projection, broadcast matmul
    in one Arrow pass (same shape as pca_project)."""
    mu, w = whitening_matrix(df, vec_col, dim=dim, eps=eps)
    bc = df.sparkSession.sparkContext.broadcast((mu, w))
    id_type = df.schema[id_col].dataType.simpleString()

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_mu, m_w = bc.value
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            white = (m - m_mu) @ m_w  # symmetric W: W.T == W
            yield pd.DataFrame(
                {id_col: pb[id_col].to_numpy(), "white": list(white)}
            )

    return (
        spread(df)
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(project, schema=f"{id_col} {id_type}, white array<double>")
    )


def mahalanobis_distances(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    eps: float = 1e-6,
) -> DataFrame:
    """(id, [extra...], maha2) — squared Mahalanobis distance to the
    corpus mean under the eps-regularized covariance, computed as
    ||W(v - mu)||^2 with the ZCA matrix (numerically identical to
    (v-mu)^T (cov + eps I)^-1 (v-mu) restricted to the eigenbasis).
    The multivariate outlier score the per-dim z-score census cannot
    see (it misses correlated-but-individually-normal vectors).
    One Arrow pass, broadcast d x d, no shuffle."""
    mu, w = whitening_matrix(df, vec_col, dim=dim, eps=eps)
    bc = df.sparkSession.sparkContext.broadcast((mu, w))
    id_type = df.schema[id_col].dataType.simpleString()

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_mu, m_w = bc.value
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            white = (m - m_mu) @ m_w
            yield pd.DataFrame(
                {
                    id_col: pb[id_col].to_numpy(),
                    "maha2": (white * white).sum(axis=1),
                }
            )

    return (
        spread(df)
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(score, schema=f"{id_col} {id_type}, maha2 double")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 16,
    iterations: int = 5,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL dataset — the upgrade
    path from ivf_topk's bounded-sample training when the corpus no
    longer looks like any 4096-row sample.

    Per iteration: one Arrow pass assigns every vector to its nearest
    centroid and emits per-partition per-cell partials (cell, n, Σv) —
    ≤ partitions·k tiny rows collected and combined on the driver in
    sorted (pid, cell) order, then the k×d centroid matrix broadcasts
    back. No shuffle in the whole loop; wall time is iterations ×
    one-data-pass. Deterministic for a fixed partitioning.

    Init: first k vectors in id-order — deterministic (k-means++ on a
    driver sample is a drop-in upgrade; determinism matters more here).
    """
    first = (
        df.select(vec_col)
        .orderBy(F.monotonically_increasing_id())
        .limit(k)
        .collect()
    )
    cent = np.stack([np.asarray(r[0], dtype=np.float64) for r in first])
    if cent.shape[0] < k:
        raise ValueError(f"need >= {k} rows, got {cent.shape[0]}")
    spark = df.sparkSession

    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(cent)

        def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            n = np.zeros(len(c), dtype=np.int64)
            s = np.zeros_like(c)
            pid = -1
            for pb in batches:
                if not len(pb):
                    continue
                m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
                d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                cells = d2.argmin(axis=1)
                np.add.at(n, cells, 1)
                np.add.at(s, cells, m)
                pid = int(pb["_pid"].iloc[0])
            for cell in np.nonzero(n)[0]:
                yield pd.DataFrame(
                    {
                        "pid": [pid],
                        "cell": [int(cell)],
                        "n": [int(n[cell])],
                        "s": [s[cell].tolist()],
                    }
                )

        parts = (
            spread(df)
            .select(F.col(vec_col), F.spark_partition_id().alias("_pid"))
            .mapInPandas(acc, schema="pid int, cell int, n long, s array<double>")
            .collect()
        )
        tot_n = np.zeros(k, dtype=np.int64)
        tot_s = np.zeros_like(cent)
        for r in sorted(parts, key=lambda r: (r.pid, r.cell)):
            tot_n[r.cell] += r.n
            tot_s[r.cell] += np.asarray(r.s)
        nz = tot_n > 0
        cent = cent.copy()
        cent[nz] = tot_s[nz] / tot_n[nz, None]  # empty cells keep position
    return cent


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, dist2) — nearest-centroid assignment, one Arrow pass
    against the broadcast centroid matrix."""
    bc = df.sparkSession.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            cells = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pb[id_col].to_numpy(),
                    "cell": cells.astype("int32"),
                    "dist2": d2[np.arange(len(m)), cells],
                }
            )

    return (
        spread(df)
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(assign, schema="vec_id long, cell int, dist2 double")
    )


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
