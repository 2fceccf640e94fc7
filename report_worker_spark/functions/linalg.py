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

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_mu, m_w = bc.value
        for pb in batches:
            if not len(pb):
                continue
            m = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            p = (m - m_mu) @ m_w
            yield pd.DataFrame(
                {"vec_id": pb[id_col].to_numpy(), "proj": list(p)}
            )

    return (
        spread(df)
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(project, schema="vec_id long, proj array<double>")
    )


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
