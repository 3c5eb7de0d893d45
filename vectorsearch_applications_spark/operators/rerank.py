"""Reranking (SURVEY.md Q4 + P9 + T1).

The reference reranks with a cross-encoder model (``src/reranker.py:6-88``:
score (query, content) pairs, optional sigmoid, add ``cross_score``, sort
desc, keep hits ≥ threshold falling back to plain top-k when none pass).

The *orchestration* — batch pair scoring, threshold-with-fallback, top-k —
is the engine's job and is reproduced here. The scorer is pluggable:

- ``rerank_overlap`` (default, deterministic, oracle-checkable): Jaccard
  token overlap between query and document — a pure Catalyst expression.
- a model-backed scorer drops in as a Pandas UDF with a per-executor model
  singleton (same shape as the embedding UDF in functions/embed.py); the
  surrounding plan is unchanged.

Threshold semantics (``reranker.py:82-87``): keep rows with score ≥
threshold; if a query has none, fall back to its top_k by score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def rerank_overlap(
    hits: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    top_k: int = 5,
    threshold: float | None = None,
) -> DataFrame:
    """Rerank hit lists with the deterministic Jaccard cross-scorer.

    hits: (query_id, doc_id, ...) candidate lists (e.g. hybrid output).
    Output: (query_id, doc_id, rank, cross_score).
    """
    pairs = (
        hits.select("query_id", "doc_id")
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("query_id"),
                    tokenize(query_col).alias("_qt"),
                )
            ),
            "query_id",
        )
        .join(
            docs.select(
                F.col(id_col).alias("doc_id"), tokenize(text_col).alias("_dt")
            ),
            "doc_id",
        )
        .withColumn("cross_score", _jaccard(F.col("_qt"), F.col("_dt")))
        .select("query_id", "doc_id", "cross_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cross_score"), F.asc("doc_id")
    )
    ranked = pairs.withColumn("rank", F.row_number().over(w))
    if threshold is None:
        out = ranked.filter(F.col("rank") <= top_k)
    else:
        # threshold-with-fallback: any query with zero passing rows keeps its
        # top_k (reference reranker.py:82-87) — set-based, no driver loop.
        n_pass = F.sum(
            F.when(F.col("cross_score") >= threshold, 1).otherwise(0)
        ).over(Window.partitionBy("query_id"))
        out = ranked.withColumn("_np", n_pass).filter(
            (
                (F.col("_np") > 0) & (F.col("cross_score") >= threshold)
            )
            | ((F.col("_np") == 0) & (F.col("rank") <= top_k))
        )
    return out.select("query_id", "doc_id", "rank", "cross_score")
