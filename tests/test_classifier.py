"""Property tests for operators/classifier.py: the distributed full-batch
GD must track an identical NumPy model, and the fitted scorer must beat
the majority class on separable data."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from vectorsearch_applications_spark.operators.classifier import (
    fit_summary,
    logistic_fit,
    logistic_score,
)


def _numpy_fit(X, y, iterations, lr):
    w = np.zeros(X.shape[1] + 1)
    Xb = np.hstack([X, np.ones((X.shape[0], 1))])
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        grad = Xb.T @ (p - y) / len(y)
        w = w - lr * grad
    return w


def _data(seed=7, n=400):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    y = (X[:, 0] + 0.5 * X[:, 1] - 0.25 * X[:, 2] + 0.1 > 0).astype(float)
    return X, y


def test_logistic_fit_matches_numpy_model(spark):
    X, y = _data()
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")
    got = logistic_fit(df, ["f1", "f2", "f3"], "y", iterations=15, lr=0.8)
    want = _numpy_fit(X, y, iterations=15, lr=0.8)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-9), (got, want)


def test_fitted_scorer_beats_majority_class(spark):
    X, y = _data(seed=11)
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")
    out = fit_summary(df, ["f1", "f2", "f3"], "y", iterations=40, lr=1.0)
    acc = out.collect()[0]["train_accuracy"]
    majority = max(y.mean(), 1 - y.mean())
    assert acc > majority + 0.05, (acc, majority)


def test_logistic_score_is_projection(spark):
    df = spark.createDataFrame([(1.0, 0.0)], "f1 double, y double")
    plan = (
        df.select(logistic_score(df, ["f1"], [2.0, -1.0]).alias("p"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # corpus scoring runs at scan speed
