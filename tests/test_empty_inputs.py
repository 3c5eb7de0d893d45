"""Empty-input robustness: every registered query must run (plan +
execute, possibly to zero rows) against zero-row copies of all ten
tables. At 100 TB empty partitions, empty sources, and filters that
eliminate a shard are routine — a query that NoneType-crashes on an
empty frame would take down a pipeline stage. (The full 172-query sweep
runs out-of-band; this test pins the operators with driver-side state,
which were the only historical offenders, plus one representative of
each heavy family.)"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

# Retired-from-registry fit harnesses (r10): still screened here — the
# driver no longer grades them, but their driver-side loops were the
# historical empty-input offenders and the operators remain exported.
RETIRED = [
    "quality_classifier_fit",   # driver-side GD loop (historical crash)
    "embedding_pca_project",    # driver-side eigh (historical crash)
]

PICKED = [
    "bpe_learn_merges",         # driver-side argmax loop
    "bm25_search",
    "knn_search",
    "dedup_minhash_lsh",
    "dedup_semantic",
    "graph_pagerank",
    "events_sessionize",
    "heavy_hitters_cms",
    "distinct_count_fm_sketch",
    "span_corruption_plan",
    "stream_attribution_batch_twin",
    # r6 additions: centroid build + 1-row cut broadcast on empty inputs
    "ann_ivf_recall_exact",
    "scd2_incremental_equivalence",
    "classifier_score_frozen",
    "bloom_filter_dim_prune",     # probe against an EMPTY bloom word map
    "join_size_cms_estimate",     # min/count over empty sketch tables
    "table_profile_stats",        # agg row over zero rows, stack unpivot
    "classifier_eval_auc",        # empty distinct-score table
    # late-r6 additions: empty change set / empty zone audit rows
    "merge_upsert_orders",
    "zonemap_prune_estimate",
    # this session: div-by-zero guard on empty total / empty lag join
    "mixture_token_allocation",
    "embedding_truncation_recall",
    "events_autocorrelation",
    "classifier_calibration_bins",
    "temporal_split_embargo",
    "eval_rank_agreement",
    "incremental_agg_equivalence",
    # r7: empty merge list / empty benchmark-gram array / frozen rotation
    "bpe_encode_corpus",
    "tokenizer_fertility_by_source",
    "eval_decontamination",
    "eval_decontamination_fuzzy",
    "embedding_project_frozen",
    "classifier_pr_curve",
    "benchmark_contamination_report",
    "dedup_token_savings",
    # r8: empty standing index bands / zero-chunk corpus / zero-shingle docs
    "dedup_index_append",
    "ingest_index_pipeline",
    "dedup_minhash_bands",
    "knn_prf_search",  # empty feedback round → empty centroid join
    "late_interaction_search",  # empty token vocab / empty query side
    # r9: empty BM25 prune → empty candidate set → empty re-rank
    "late_interaction_two_stage",
    "dedup_simhash_append",  # empty standing + batch band tables
    # routes are literal frames, so routing still runs; both arms drain
    # to zero rows over empty corpus/orders/customer
    "routed_query_pipeline",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
    return dst


# fit-summary / global-aggregate queries legitimately emit their
# fixed-shape rows even over empty inputs (one agg row, or one row per
# profiled column) — the oracle side aggregates to the same shape
EXPECTED_ROWS = {
    "quality_classifier_fit": 4,   # f1, f2, f3, _bias
    "classifier_eval_auc": 1,      # (auc_num2, n_pos, n_neg) agg row
    "join_size_cms_estimate": 1,   # estimate × exact audit row
    "table_profile_stats": 6,      # one stats row per profiled column
    "zonemap_prune_estimate": 2,   # one audit row per layout
    "classifier_pr_curve": 7,      # one zero-filled row per ladder step
}


@pytest.mark.parametrize("name", PICKED)
def test_query_survives_empty_tables(spark, empty_sf, name):
    n = entry.queries()[name](spark, empty_sf).count()
    assert n == EXPECTED_ROWS.get(name, 0)


@pytest.mark.parametrize("name", RETIRED)
def test_retired_fit_survives_empty_tables(spark, empty_sf, name):
    from vectorsearch_applications_spark import queries as q

    n = getattr(q, f"q_{name}")(spark, empty_sf).count()
    assert n == EXPECTED_ROWS.get(name, 0)
