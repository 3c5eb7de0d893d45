"""Funnel operator edge cases (operators/funnel.py)."""

from __future__ import annotations

from vectorsearch_applications_spark.operators.funnel import funnel_counts


def _run(spark, rows, window_seconds=100):
    e = spark.createDataFrame(rows, "user_id long, event_type string, es long")
    out = funnel_counts(e, ["view", "click", "purchase"], window_seconds)
    return {r["step_name"]: r["n_users"] for r in out.collect()}


def test_ordered_chain_converts(spark):
    rows = [(1, "view", 10), (1, "click", 20), (1, "purchase", 30)]
    assert _run(spark, rows) == {"view": 1, "click": 1, "purchase": 1}


def test_wrong_order_does_not_convert(spark):
    rows = [(1, "purchase", 10), (1, "click", 20), (1, "view", 30)]
    assert _run(spark, rows) == {"view": 1, "click": 0, "purchase": 0}


def test_same_second_is_not_ordered(spark):
    # strict ordering on integer seconds: a click in the view's second
    # does not follow it (RANGE frame excludes ties)
    rows = [(1, "view", 10), (1, "click", 10), (1, "purchase", 30)]
    assert _run(spark, rows) == {"view": 1, "click": 0, "purchase": 0}


def test_window_anchored_at_view(spark):
    # chain fits step-to-step but view→purchase exceeds the window
    rows = [(1, "view", 0), (1, "click", 60), (1, "purchase", 160)]
    assert _run(spark, rows, window_seconds=100) == {
        "view": 1,
        "click": 1,
        "purchase": 0,
    }


def test_latest_view_rescues_window(spark):
    # an early view would blow the window, but a later view re-anchors it —
    # the max-start greedy must pick the later one
    rows = [
        (1, "view", 0),
        (1, "view", 90),
        (1, "click", 120),
        (1, "purchase", 180),
    ]
    assert _run(spark, rows, window_seconds=100) == {
        "view": 1,
        "click": 1,
        "purchase": 1,
    }


def test_users_aggregate_independently(spark):
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "view", 10), (2, "click", 20),
        (3, "click", 10), (3, "purchase", 20),
    ]
    assert _run(spark, rows) == {"view": 2, "click": 2, "purchase": 1}
