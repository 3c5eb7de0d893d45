from .bm25 import bm25_build_stats, bm25_search
from .knn import knn_search, knn_search_crossjoin
from .hybrid import hybrid_search, minmax_normalize
from .rerank import rerank_overlap
from .windows import expanded_content
from .topk import topk_per_group, token_budget_truncate
from .evaluation import retrieval_metrics
from .rangejoin import interval_join
from .sampling import stratified_sample
from .quantize import quantize_embeddings, quantized_dot
from .textstats import langid_ngram, text_profile

__all__ = [
    "bm25_build_stats",
    "bm25_search",
    "knn_search",
    "knn_search_crossjoin",
    "hybrid_search",
    "minmax_normalize",
    "rerank_overlap",
    "expanded_content",
    "topk_per_group",
    "token_budget_truncate",
    "retrieval_metrics",
    "interval_join",
    "stratified_sample",
    "quantize_embeddings",
    "quantized_dot",
    "langid_ngram",
    "text_profile",
]
from .graph import connected_components, keep_canonical
from .ann import ivf_build, ivf_refine, ivf_search, ivf_append, kmeans_objective
from .textstats import boilerplate_ngrams, boilerplate_ratio
from .sampling import temperature_resample
from .textstats import bigram_lm_scores
from .funnel import funnel_counts
from .rangejoin import interval_overlap_join
from .topk import pack_sequences
from .bm25 import bm25_save_index, bm25_load_index, bm25_search_indexed
from .mmr import mmr_diversify
from .lsh import lsh_planes, lsh_bucket, lsh_search
from .timeseries import (
    peak_concurrency,
    resample_ffill,
    scd2_apply_increment,
    scd2_intervals,
)
