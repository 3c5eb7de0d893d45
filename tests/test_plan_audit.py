"""Fleet-wide physical-plan audit over EVERY registered query.

Two invariants a 100 TB deployment cannot survive losing:

1. No CartesianProduct anywhere — an unbounded cross join of two big
   relations is never the right plan; every intentional cross join in
   this engine broadcasts a bounded side (1-row corpus stats, the canned
   query set, a codebook collapsed to one array row) and therefore
   compiles to BroadcastNestedLoopJoin instead.

2. BroadcastNestedLoopJoin appears ONLY in the queries designed around a
   bounded-broadcast cross join (allowlisted below). A new query showing
   up here means someone cross-joined without bounding a side — the
   audit fails with the diff instead of the cluster failing with an OOM.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

from .conftest import SF_SMOKE

# Queries whose DESIGNED plan contains a bounded-broadcast cross join:
# 1-row aggregates (corpus stats, token budgets), the canned query set,
# codebook/centroid arrays, or a threshold scalar.
BOUNDED_BNLJ = {
    "ann_ivf_append",  # same ≤8-row centroid-array broadcast as ann_ivf_exhaustive
    "ann_ivf_exhaustive",
    "ann_ivf_kmeans_exhaustive",
    "ann_ivfpq_search",
    "ann_pq_adc",
    "ann_pq_index_append",  # same bounded codebook-array broadcast as ann_pq_adc

    "ann_quantized_search",
    "bm25_multifield",
    "bm25_incremental_append",  # same 1-row corpus-stats broadcast (merged)
    "bm25_prf_search",  # same 1-row corpus-stats broadcast as bm25_search, twice
    "bm25_search",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "eval_multi_method",
    "ann_ivfpq_refined",  # 5-row query-vector broadcast in the refine pass
    "ann_ivf_recall_exact",  # ≤8-row centroid-array + 5-query broadcasts
    "scd2_incremental_equivalence",  # 1-row midpoint-cut broadcast
    "bloom_filter_dim_prune",  # 1-row broadcast bloom word-map
    "join_size_cms_estimate",  # 1-row estimate × 1-row exact audit
    "temporal_split_embargo",  # 1-row midpoint-cut broadcast
    "eval_rank_agreement",  # 3-query + 3-row k-ladder broadcasts
    "incremental_agg_equivalence",  # 1-row midpoint-cut broadcast
    "embedding_truncation_recall",  # two ≤8-row query-vector broadcasts
    "eval_decontamination",  # 1-row benchmark-gram-array broadcast
    "eval_retrieval_metrics",
    "events_decayed_trending",  # 1-row corpus-max-timestamp broadcast
    "token_budget_allocation",  # 1-row grand-total broadcast
    "sample_weighted_orders",  # 1-row max-weight broadcast
    "histogram_quantiles_binned",  # 1-row total + 4-row quantile ladder
    "join_key_skew_profile",  # 1-row total-rows broadcast
    "filtered_hybrid_search",
    "generation_eval_polling",
    "heaps_vocab_growth",  # 6-row threshold-ladder broadcast
    "hybrid_rrf_search",
    "hybrid_search",
    "knn_prf_search",  # 5-row q' broadcast in the re-rank crossjoin
    "late_interaction_search",  # ~20-row query-token-embedding broadcast
    "late_interaction_two_stage",  # BM25 prune's 1-row corpus-stats broadcast
    "routed_query_pipeline",  # hybrid arm: BM25 stats + ≤|batch|-row query broadcasts
    "client_routed_query",  # same plan through the client facade
    "client_late_interaction",  # same bounded broadcasts as late_interaction_two_stage
    "client_hybrid_search",  # hybrid_search's 1-row BM25 corpus-stats broadcast
    "ngram_collocations",  # 1-row corpus token count broadcast
    "prompt_assembly",
    "quality_length_filter",
    "rag_pipeline_eval",
    "rerank_overlap",
    "route_classify",
    "router_fit",
    "search_snippets",
    "search_with_properties",
    "temperature_resample_sources",
    "token_budget_prune",
    "topic_cluster_terms",
    "tpch_q11_important_parts",
    "tpch_q22_balance_opportunity",
}


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_no_unbounded_join_strategies(spark, name):
    df = entry.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in BOUNDED_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join — bound the broadcast "
            "side or add a join key (allowlist only designed plans)"
        )


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_registry_output_schema_is_scalar(spark, name):
    """The driver's pandas canonicalizer sorts rows by value before
    hashing; array/map/struct cells are unhashable and crash the grading
    harness (r5: embedding_pca_project). Every registered query must
    emit only scalar columns — flatten via posexplode / concat_ws."""
    df = entry.queries()[name](spark, SF_SMOKE)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, (
        f"{name}: non-scalar output columns {complex_cols} break the "
        "driver canonicalizer — flatten before registering"
    )
