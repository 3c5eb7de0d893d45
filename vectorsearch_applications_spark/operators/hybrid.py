"""Hybrid (BM25 + vector) fusion (SURVEY.md Q3, O2, W4).

Reproduces the reference's hand-rolled fusion exactly
(``notebooks/4-Reranking_Week2.ipynb`` cells 19-33):

1. retrieve top-N per method (BM25 score; vector similarity = 1 − distance,
   cell 19);
2. min-max normalize scores *within each method's retrieved list*
   (MinMaxScaler, cell 23 — a constant list maps to 0.0 like sklearn);
3. weight keyword by (1 − α) and vector by α (cell 25; α=0 pure BM25,
   α=1 pure vector — docstring ``weaviate_interface_v4.py:330-335``);
4. sum scores of docs appearing in both lists (``add_doc_scores``, cell 33)
   — a full-outer join on (query_id, doc_id) with coalesce(…, 0);
5. sort desc, top-k.

Scale: the inputs are already top-N-per-query (small); the fusion join keys
on (query_id, doc_id) and AQE will broadcast whichever side is smaller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def minmax_normalize(
    df: DataFrame, value_col: str, group_cols: list[str], out_col: str = "norm"
) -> DataFrame:
    """(s − min)/(max − min) within group; degenerate group → 0.0 (sklearn
    MinMaxScaler behavior on a constant column)."""
    w = Window.partitionBy(*group_cols)
    rng = F.max(value_col).over(w) - F.min(value_col).over(w)
    return df.withColumn(
        out_col,
        F.when(rng == 0, F.lit(0.0)).otherwise(
            (F.col(value_col) - F.min(value_col).over(w)) / rng
        ),
    )


def hybrid_search(
    kw_hits: DataFrame,
    vec_hits: DataFrame,
    alpha: float = 0.5,
    limit: int = 10,
) -> DataFrame:
    """Fuse per-method hit lists.

    kw_hits:  (query_id, doc_id, score)      — BM25, higher is better
    vec_hits: (query_id, doc_id, distance)   — cosine distance, lower better
    Output:   (query_id, doc_id, rank, score) — fused, rank 1-based.
    """
    kw_n = minmax_normalize(
        kw_hits.select("query_id", "doc_id", "score"),
        "score",
        ["query_id"],
    ).select(
        "query_id",
        "doc_id",
        (F.col("norm") * F.lit(1.0 - alpha)).alias("kw_score"),
    )
    vec_n = minmax_normalize(
        vec_hits.select(
            "query_id", "doc_id", (F.lit(1.0) - F.col("distance")).alias("sim")
        ),
        "sim",
        ["query_id"],
    ).select(
        "query_id",
        "doc_id",
        (F.col("norm") * F.lit(alpha)).alias("vec_score"),
    )

    fused = (
        kw_n.join(vec_n, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "score",
            F.coalesce("kw_score", F.lit(0.0)) + F.coalesce("vec_score", F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("query_id", "doc_id", "rank", "score")
    )


def rrf_fuse(
    hit_lists: list[DataFrame],
    k: int = 60,
    limit: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR '09 —
    public): ``score(d) = Σ_m 1 / (k + rank_m(d))``. The other standard
    fusion next to weighted min-max — score-scale-free, so it needs no
    normalization pass and composes any number of retrieval arms.

    Each input: (query_id, doc_id, rank). Output: (query_id, doc_id, rank,
    score, n_lists) — fused rank 1-based, n_lists = how many arms returned
    the doc.

    Scale: inputs are top-N-per-query (bounded); one union + one
    aggregation on (query_id, doc_id), partial-aggregated map-side. With
    two arms the score sum is a single commutative IEEE add, so fused
    scores are bitwise deterministic regardless of aggregation order.
    """
    from functools import reduce

    contribs = [
        h.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("c"),
        )
        for h in hit_lists
    ]
    allc = reduce(DataFrame.unionByName, contribs)
    fused = allc.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score"), F.count(F.lit(1)).alias("n_lists")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("query_id", "doc_id", "rank", "score", "n_lists")
    )
