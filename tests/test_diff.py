"""Unit tests for operators/diff.py snapshot diff (driver parity covered
by test_oracle_parity on snapshot_diff_docs)."""

from __future__ import annotations

from vectorsearch_applications_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _t(spark, rows):
    return spark.createDataFrame(rows, "id long, a string, b string")


def test_snapshot_diff_classifies_all_four_statuses(spark):
    old = _t(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y")])
    new = _t(spark, [(1, "x", "y"), (2, "X", "y"), (4, "n", "n")])
    got = {
        r["key"]: r["status"]
        for r in snapshot_diff(old, new, "id", ["a", "b"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summary = {
        r["status"]: r["n"]
        for r in snapshot_diff_summary(old, new, "id", ["a", "b"]).collect()
    }
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_fingerprint_boundary_and_null_safety(spark):
    # ('ab','c') vs ('a','bc') must differ; NULL vs '' must differ
    old = _t(spark, [(1, "ab", "c"), (2, None, "z")])
    new = _t(spark, [(1, "a", "bc"), (2, "", "z")])
    got = {
        r["key"]: r["status"]
        for r in snapshot_diff(old, new, "id", ["a", "b"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}
