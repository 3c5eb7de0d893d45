"""Unit tests for operators/bpe.py (driver parity is covered by
test_oracle_parity on bpe_learn_merges)."""

from __future__ import annotations

from vectorsearch_applications_spark.operators.bpe import (
    apply_merge,
    learn_bpe_merges,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def _words(spark, rows):
    return spark.createDataFrame(rows, "syms string, cnt long")


def test_bpe_merge_greedy_on_runs(spark):
    # greedy left-to-right: a a a a -> aa aa; a a a -> aa a
    w = _words(spark, [("a a a a", 1), ("a a a", 1), ("b a a", 1)])
    got = {r["syms"] for r in apply_merge(w, "a", "a").collect()}
    assert got == {"aa aa", "aa a", "b aa"}


def test_bpe_merged_symbol_does_not_remerge_same_iteration(spark):
    # after (a,b) merges, the new 'ab' tail must not consume a following b
    w = _words(spark, [("a b b", 1)])
    assert apply_merge(w, "a", "b").collect()[0]["syms"] == "ab b"


def test_bpe_full_token_check_no_suffix_false_positive(spark):
    # tail symbol 'xa' must not fire the (a, b) merge
    w = _words(spark, [("xa b", 1)])
    assert apply_merge(w, "a", "b").collect()[0]["syms"] == "xa b"


def test_bpe_learns_expected_sequence(spark):
    # 'abab' x3: pairs (a,b)x2*3=6 overlapping, (b,a)x3 -> first merge (a,b)
    # then 'ab ab' pairs (ab,ab)x3 -> second merge (ab,ab)
    docs = _docs(spark, ["abab abab abab"])
    merges = {
        r["merge_rank"]: (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in learn_bpe_merges(spark, docs, n_merges=2).collect()
    }
    assert merges[1] == ("a", "b", 6)
    assert merges[2] == ("ab", "ab", 3)


def test_bpe_tie_breaks_lexicographically(spark):
    docs = _docs(spark, ["zy ba"])  # (z,y) and (b,a) each count 1
    (m,) = learn_bpe_merges(spark, docs, n_merges=1).collect()
    assert (m["left_sym"], m["right_sym"]) == ("b", "a")
