"""Semantic route classification (SURVEY.md Q5, §3.3 step 1).

The reference routes queries to 'sql' vs 'regular' RAG with the
semantic-router library (``notebooks/8-Text2SQL_Week3.ipynb`` cells 27-47):
embed labeled utterances per route, classify a query by similarity.

Engine re-expression: routes are a tiny labeled utterance table → per-route
centroid of (deterministic hash-)embeddings → broadcast-join each query to
every centroid, cosine, argmax. Driver-side control flow then dispatches to
``run_guarded_sql`` or the search pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.embed import hash_embed_col
from ..functions.vectors import cosine_similarity


def route_queries(
    queries: DataFrame,
    routes: DataFrame,
    query_id_col: str = "query_id",
    query_col: str = "query",
    route_col: str = "route",
    utterance_col: str = "utterance",
    dim: int = 16,
) -> DataFrame:
    """(query_id, route, score): best route per query by cosine-to-centroid.

    routes: (route, utterance) labeled examples.
    """
    cent = (
        routes.select(
            F.col(route_col).alias("route"),
            hash_embed_col(F.col(utterance_col), dim).alias("_e"),
        )
        .select(
            "route", F.posexplode("_e").alias("d", "v")
        )
        .groupBy("route", "d")
        .agg(F.avg("v").alias("v"))
        .groupBy("route")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "v"))), lambda s: s.v
            ).alias("centroid")
        )
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        hash_embed_col(F.col(query_col), dim).alias("_q"),
    )
    scored = q.crossJoin(F.broadcast(cent)).withColumn(
        "score",
        cosine_similarity(F.col("_q"), F.col("centroid"), assume_normalized=False),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("route"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", "route", F.round("score", 4).alias("score"))
    )
