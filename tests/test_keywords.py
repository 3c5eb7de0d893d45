"""Unit tests for operators/keywords.py: tf-idf keyword extraction,
PMI collocations, vocabulary/OOV coverage (driver-facing parity is covered
by test_oracle_parity on the registered queries)."""

from __future__ import annotations

from vectorsearch_applications_spark.operators.keywords import (
    bigram_collocations,
    tfidf_top_terms,
    vocab_oov_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_downranks_ubiquitous_terms(spark):
    # "common" appears in every doc; "rare" only in doc 0 with the same tf.
    d = _docs(
        spark,
        [
            (0, "common rare common rare"),
            (1, "common common filler"),
            (2, "common other words"),
        ],
    )
    out = tfidf_top_terms(d, k=1).collect()
    top0 = next(r for r in out if r["id"] == 0)
    # tf(common)=2 df=3 -> 666...; tf(rare)=2 df=1 -> 2e9: rare wins
    assert top0["term"] == "rare"
    assert top0["score_ppb"] == 2_000_000_000


def test_tfidf_rank_ties_break_on_term(spark):
    d = _docs(spark, [(0, "alpha beta"), (1, "alpha beta")])
    out = tfidf_top_terms(d, k=2).collect()
    r0 = sorted((r for r in out if r["id"] == 0), key=lambda r: r["rank"])
    assert [r["term"] for r in r0] == ["alpha", "beta"]


def test_collocations_rank_bound_pair_over_independent(spark):
    # "new york" always adjacent; "the" co-occurs with everything.
    rows = [(i, "new york is big and the city the state") for i in range(5)]
    d = _docs(spark, rows)
    out = bigram_collocations(d, min_count=5, top_n=5).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    ny = by_pair[("new", "york")]
    assert ny["c_xy"] == 5 and ny["c_x"] == 5 and ny["c_y"] == 5
    # bound pair must outrank any pair involving the frequent "the"
    the_pairs = [r for (a, b), r in by_pair.items() if "the" in (a, b)]
    assert all(ny["pmi_ppk"] >= r["pmi_ppk"] for r in the_pairs)


def test_collocations_min_count_filters(spark):
    d = _docs(spark, [(0, "one off pair"), (1, "unrelated words here")])
    assert bigram_collocations(d, min_count=5, top_n=10).count() == 0


def test_vocab_oov_cutoff_and_empty_doc(spark):
    # "kept" appears 3 times (>= cutoff 3), "dropped" once (< cutoff).
    d = _docs(
        spark,
        [(0, "kept kept dropped"), (1, "kept"), (2, "")],
    )
    rows = {r["id"]: r for r in vocab_oov_stats(d, min_count=3).collect()}
    assert rows[0]["n_tokens"] == 3 and rows[0]["n_oov"] == 1
    assert rows[0]["oov_ppm"] == 333_333
    assert rows[1]["n_oov"] == 0
    assert rows[2]["n_tokens"] == 0 and rows[2]["oov_ppm"] == 0
