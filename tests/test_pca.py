"""Property tests for operators/pca.py: the distributed two-moment fit
must reproduce numpy PCA, and projection must be a shuffle-free plan."""

from __future__ import annotations

import numpy as np

from vectorsearch_applications_spark.operators.pca import pca_fit, pca_project


def _data(seed=3, n=500, d=6):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: two dominant directions
    basis = rng.normal(size=(d, d))
    scales = np.array([10.0, 5.0] + [0.5] * (d - 2))
    return rng.normal(size=(n, d)) * scales @ basis.T


def test_pca_fit_matches_numpy_eigh(spark):
    X = _data()
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "id long, embedding array<double>",
    ).repartition(7)  # partial moments must be partition-invariant
    comps, mean, ev = pca_fit(df, k=2)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    want = evecs[:, np.argsort(evals)[::-1][:2]].T
    for got_c, want_c in zip(comps, want):
        # eigenvectors match up to sign
        assert abs(abs(np.dot(got_c, want_c)) - 1.0) < 1e-8
    assert np.allclose(sorted(ev, reverse=True), sorted(evals)[::-1][:2], rtol=1e-9)


def test_pca_projection_reconstructs_variance_order(spark):
    X = _data(seed=9)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "id long, embedding array<double>",
    )
    comps, mean, _ = pca_fit(df, k=3)
    proj = pca_project(df, comps, mean).select("pca").collect()
    P = np.asarray([r["pca"] for r in proj])
    v = P.var(axis=0)
    assert v[0] >= v[1] >= v[2]  # components ordered by explained variance
    # matches numpy projection up to sign
    want = (X - X.mean(axis=0)) @ np.asarray(comps).T
    assert np.allclose(np.abs(P), np.abs(want), atol=1e-8)


def test_pca_projection_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "id long, embedding array<double>"
    )
    out = pca_project(df, [[1.0, 0.0, 0.0]], [0.0, 0.0, 0.0])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
