"""Distributed PCA pins: the partial-Gram assembly must reproduce
numpy's full-matrix PCA exactly (same covariance, same eigenvectors
after sign canonicalization), components are orthonormal, explained
variance is monotone, and reconstruction error shrinks with k."""

from __future__ import annotations

import numpy as np

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.similarity import (
    PCA_K,
    pca_components,
    pca_project,
)

plans.load_all()


def _collect_X(spark, sf_dir):
    emb = plans.table(spark, sf_dir, "embeddings")
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    return np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows]), [
        r.vec_id for r in rows
    ]


def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def test_matches_numpy_full_matrix(spark, sf_dir):
    X, _ = _collect_X(spark, sf_dir)
    emb = plans.table(spark, sf_dir, "embeddings")
    mean, comps, var = pca_components(emb, PCA_K)
    nmean, ncomps, nvar = _numpy_pca(X, PCA_K)
    assert np.allclose(mean, nmean, atol=1e-9)
    assert np.allclose(var, nvar, rtol=1e-9)
    assert np.allclose(np.abs(comps), np.abs(ncomps), atol=1e-8)
    # orthonormality
    assert np.allclose(comps @ comps.T, np.eye(PCA_K), atol=1e-10)
    # monotone explained variance
    assert all(var[i] >= var[i + 1] for i in range(len(var) - 1))


def test_projection_and_reconstruction(spark, sf_dir):
    X, ids = _collect_X(spark, sf_dir)
    emb = plans.table(spark, sf_dir, "embeddings")
    mean, comps, _ = pca_components(emb, PCA_K)
    proj = {r.vec_id: np.asarray(r.proj) for r in pca_project(emb, mean, comps).collect()}
    want = (X - mean) @ comps.T
    got = np.asarray([proj[i] for i in ids])
    assert np.allclose(got, want, atol=1e-9)
    # reconstruction error shrinks as k grows — the top-2 components
    # are exactly the first 2 rows of the k=8 result (same cov, same
    # eigh), so one distributed pass covers both
    def recon_err(c):
        P = (X - mean) @ c.T
        return float(((X - mean - P @ c) ** 2).sum())

    e2, e8 = recon_err(comps[:2]), recon_err(comps)
    total = float(((X - mean) ** 2).sum())
    assert e8 < e2 < total


def test_projection_surface_stable(spark, sf_dir):
    """The per-vector library surface (r12: split out of the registry
    row, which became the oracle-backed quality report)."""
    from pg_bifrost_spark.operators.similarity import pca_projection_milli
    from pg_bifrost_spark.plans import table

    emb = table(spark, sf_dir, "embeddings")
    rows = pca_projection_milli(emb).collect()
    assert len(rows) > 0 and all(len(r.proj_milli) == PCA_K for r in rows)
    # deterministic across rebuilds
    rows2 = pca_projection_milli(emb).collect()
    assert [tuple(r.proj_milli) for r in rows] == [tuple(r.proj_milli) for r in rows2]


def test_registered_query_quality_report(spark, sf_dir):
    """The r12 gate row: one row, all booleans TRUE on healthy PCA —
    the exact shape the DuckDB oracle pins."""
    rows = plans.QUERIES["embedding_pca_project"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_vecs > 0 and r.k == PCA_K
    assert r.ortho_ok and r.var_monotone_ok and r.proj_var_ok and r.recon_nonneg_ok
