"""Trainable quality classifier — distributed logistic regression.

The learned counterpart of the rule-based quality scorers (fastText-style
linear scorer in quality_linear_score, Gopher-style repetition gates):
curation pipelines train a small classifier on labeled good/bad documents
and score the whole corpus with it (public recipe: GPT-3/LLaMA quality
filtering trains logistic regression over text features).

Training is full-batch gradient descent where each iteration is ONE
map-side-combined aggregation producing d+1 gradient sums — the corpus is
never collected, weights (a d+1 Python list) are the only driver state.
At 100 TB each epoch is a single scan; cache/checkpoint the (features,
label) projection once and iterations stop re-reading parquet.

Scoring (``logistic_score``) is a pure projection with literal weights —
zero shuffle, runs inside whole-stage codegen at scan speed.

Float gradient sums are partition-order dependent (unlike the engine's
oracle-graded integer ops), so the fit is verified by a property test
against an identical NumPy model (tolerance), not a SQL oracle — the same
weaker-check tier as the PCA fit; the deploy half (frozen-weight scoring)
is hash-graded by classifier_score_frozen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(feature_cols: list[str], weights: list[float]) -> Column:
    """w·x + b with literal weights (bias is weights[-1])."""
    m: Column = F.lit(float(weights[-1]))
    for c, w in zip(feature_cols, weights[:-1]):
        m = m + F.col(c).cast("double") * F.lit(float(w))
    return m


def logistic_score(
    df: DataFrame, feature_cols: list[str], weights: list[float]
) -> Column:
    """P(label=1 | x) as a codegen expression — the corpus-scoring path."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(feature_cols, weights)))


def logistic_margin(feature_cols: list[str], weights: list[float]) -> Column:
    """The raw margin w·x + b — sigmoid is monotone, so any probability
    threshold is a margin threshold (P ≥ 0.5 ⟺ margin ≥ 0). Production
    scoring ships the margin: with dyadic frozen weights over integer
    features every product and left-to-right sum is IEEE-exact, making the
    corpus-scoring pass bitwise reproducible across engines (the
    hash-graded path; exp() is libm-dependent and stays in the GD loop)."""
    return _margin(feature_cols, weights)


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 30,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch GD; returns [w_1..w_d, bias]. One aggregation per
    iteration; gradient = mean((sigmoid(w·x) - y) * x_j)."""
    d = len(feature_cols)
    weights = [0.0] * (d + 1)
    data = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        err = (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-_margin(feature_cols, weights)))
            - F.col("_y")
        )
        sums = data.agg(
            *[F.avg(err * F.col(c)).alias(f"g{j}") for j, c in enumerate(feature_cols)],
            F.avg(err).alias("gb"),
        ).collect()[0]
        if sums["gb"] is None:
            # empty training frame (avg over zero rows): zero weights are
            # the only defensible fit; don't NoneType-crash mid-iteration
            return weights
        grads = [sums[f"g{j}"] for j in range(d)] + [sums["gb"]]
        weights = [w - lr * g for w, g in zip(weights, grads)]
    return weights


def fit_summary(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 30,
    lr: float = 1.0,
) -> DataFrame:
    """(feature, weight, train_accuracy) — one row per feature + bias;
    accuracy from one scoring pass at threshold 0.5."""
    weights = logistic_fit(df, feature_cols, label_col, iterations, lr)
    pred = (
        logistic_score(df, feature_cols, weights) >= 0.5
    ).cast("int")
    acc = (
        df.select(
            F.avg(
                (pred == F.col(label_col).cast("int")).cast("double")
            ).alias("acc")
        ).collect()[0]["acc"]
    )
    if acc is None:
        acc = 0.0  # avg over an empty training frame
    spark = df.sparkSession
    rows = [
        (name, float(w), float(acc))
        for name, w in zip([*feature_cols, "_bias"], weights)
    ]
    from ..sources.io import one_slice_df

    return one_slice_df(
        spark, rows, "feature string, weight double, train_accuracy double"
    )
