"""ngram_jaccard_prefix_pairs must equal the naive exact join on any
input — including sparse / non-zero-based ids and exact-duplicate texts —
because prefix filtering is a lossless candidate pruning, not an
approximation (driver parity on real data: dedup_jaccard_prefix_filter)."""

from __future__ import annotations

import pytest

from vectorsearch_applications_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
)

DOCS = [
    # sparse, non-dense ids on purpose (the ADVICE r4 failure mode)
    (1007, "the quick brown fox jumps over the lazy dog today"),
    (2019, "the quick brown fox jumps over the lazy dog today"),  # exact dup
    (3031, "the quick brown fox leaps over the lazy dog today"),  # near dup
    (5000, "completely unrelated text about spark shuffle partitions"),
    (9999, "another document about spark shuffle partitions and joins"),
    (12345, "short text"),  # fewer than n tokens -> no shingles
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("num,den", [(3, 10), (1, 2), (9, 10)])
def test_prefix_filter_equals_exact_join(spark, num, den):
    docs = _docs(spark)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=num / den).collect()
    }
    pruned = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_prefix_pairs(
            docs, threshold_num=num, threshold_den=den
        ).collect()
    }
    assert pruned == exact
    if num / den <= 0.5:
        assert (1007, 2019) in pruned  # the exact dup always qualifies


def test_prefix_filter_exact_duplicates_at_threshold_one(spark):
    # t = 1 -> prefix length 1: only the single rarest shingle is joined,
    # yet exact duplicates (jaccard == 1.0) must still be found
    pairs = ngram_jaccard_prefix_pairs(
        _docs(spark), threshold_num=1, threshold_den=1
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1007, 2019)}
    assert all(r["jaccard"] == 1.0 for r in pairs)
