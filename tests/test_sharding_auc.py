"""Rendezvous shard routing (operators/sharding.py) and integer-exact
AUC (operators/evaluation.py auc_from_scores). Driver parity via the
shard_assignment_rendezvous / classifier_eval_auc oracles; these tests
pin the THEOREMS the oracles can't express: minimal disruption on
resize, and agreement with a brute-force pairwise AUC."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearch_applications_spark.operators.evaluation import (
    auc_from_scores,
)
from vectorsearch_applications_spark.operators.sharding import (
    rebalance_moves,
    rendezvous_assign,
)


def test_rendezvous_grow_moves_only_to_the_new_shard(spark):
    ids = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = rebalance_moves(ids, "doc_id", 5, 6).collect()
    moved = [r for r in out if r["moved"] == 1]
    # every moved key lands on the NEW shard (5) — the rendezvous
    # property: existing shards' scores are unchanged by the resize
    assert moved and all(r["shard_after"] == 5 for r in moved)
    # ~1/6 of keys move (binomial, generous bounds)
    assert 0.08 < len(moved) / len(out) < 0.26, len(moved) / len(out)


def test_rendezvous_balance_is_roughly_uniform(spark):
    ids = spark.range(3000).withColumnRenamed("id", "doc_id")
    counts = (
        rendezvous_assign(ids, "doc_id", 5)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert len(counts) == 5
    for r in counts:
        assert 0.6 * 600 < r["count"] < 1.4 * 600, r


def test_auc_matches_bruteforce_pair_count(spark):
    rows = [
        (0.1, 0), (0.2, 0), (0.2, 1), (0.5, 1), (0.5, 0),
        (0.5, 1), (0.9, 1), (0.9, 0), (1.0, 1), (0.05, 0),
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    got = auc_from_scores(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    assert got["auc_num2"] == num2
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_auc_extremes(spark):
    perfect = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (0.1, 0), (0.2, 0)], "s double, y int"
    )
    r = auc_from_scores(perfect, "s", "y").collect()[0]
    assert r["auc_num2"] == 2 * r["n_pos"] * r["n_neg"]  # AUC = 1
    inverted = spark.createDataFrame(
        [(0.1, 1), (0.2, 1), (1.0, 0), (2.0, 0)], "s double, y int"
    )
    r = auc_from_scores(inverted, "s", "y").collect()[0]
    assert r["auc_num2"] == 0  # AUC = 0
