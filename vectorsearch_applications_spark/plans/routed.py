"""Routed query pipeline — the reference's ``Text2SQL.__call__`` traced
end-to-end (SURVEY §3.3; ``notebooks/8-Text2SQL_Week3.ipynb`` cell 51):
route a mixed query batch with the semantic classifier, send
search-routed queries through the hybrid (BM25 + vector) arm and
sql-routed queries through NL→SQL generation + the SELECT-only guard,
and union both arms' answers under one schema.

Arm shapes at scale: the SEARCH arm is fully set-based — the routed
subset stays a DataFrame, so an arbitrarily large query batch fans
through the BM25/kNN/fusion plans with no driver round-trip. The SQL
arm is inherently driver-dispatched (each generated statement becomes
its own ``spark.sql`` plan — the reference shape exactly), so it
collects ONE row per sql-routed query: bounded by the interactive batch
size, never by data size. The generated statements themselves execute
as ordinary Catalyst plans over the registered views.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import isin_ints
from ..operators.bm25 import bm25_search
from ..operators.hybrid import hybrid_search
from ..operators.knn import knn_search
from .router import route_queries
from .text2sql import run_guarded_sql

RESULT_SCHEMA = (
    "query_id bigint, route string, result_key string, "
    "result_rank bigint, result_value double"
)


def routed_query_pipeline(
    spark: SparkSession,
    queries: DataFrame,
    routes: DataFrame,
    docs: DataFrame,
    embeddings: DataFrame,
    nl2sql: Callable[[str], str],
    alpha: float = 0.25,
    n_retrieve: int = 50,
    k: int = 10,
    dim: int = 16,
    cache_key: str | None = None,
    always_search: bool = False,
    query_vecs: DataFrame | None = None,
) -> DataFrame:
    """Route → per-arm execution → unioned answers.

    queries:  (query_id, query) — the mixed batch.
    routes:   (route, utterance) labeled examples with routes named
              'search' and 'sql' (the reference's 'regular'/'sql').
    query_vecs: optional (query_id, query_vec) frame for the dense half
              of the search arm. Default None looks the query vectors up
              in ``embeddings`` by vec_id == query_id (the fixture shape
              where query vectors were indexed alongside the corpus);
              pass an embedded-query frame when they weren't (the client
              facade's ``query_vectors='hash'`` path).
    nl2sql:   query text → SQL string (the F3 egress slot; deterministic
              stub in tests, LLM-backed in deployment). Called only for
              sql-routed queries; output ALWAYS passes the SELECT-only
              guard. Each statement must yield (result_key, result_value)
              rows — the humanize step's input shape.

    Output rows (RESULT_SCHEMA): search-routed queries emit their hybrid
    top-``k`` hits (result_key = doc_id, result_value = fused score,
    result_rank = fusion rank); sql-routed queries emit their statement's
    rows ranked by result_value DESC then result_key ASC. The ``route``
    column labels the ARM a row came from; with the default
    ``always_search=False`` the arms are disjoint, so it also equals the
    query's route decision.

    ``always_search=True`` is the reference-exact §3.3 shape (nb8
    cell 51 runs ``reg_call`` hybrid search for EVERY query, then adds
    the SQL answer when routed 'sql'): the search arm covers the whole
    batch as retrieved fallback context, and sql-routed queries emit
    BOTH their 'search' context rows and their 'sql' answer rows. The
    graded plan keeps the default so each row's provenance is the route
    decision.
    """
    # ONE route job decides the dispatch — the collect is one row per
    # query in the batch, bounded driver state by construction (routing
    # is the interactive front door, not a data-scale operator). The
    # decisions then re-enter both arms as LITERAL id filters rather
    # than joins against the routing plan: the search arm's lineage
    # stays free of the centroid/argmax subtree (which would otherwise
    # re-execute inside BOTH the BM25 query join and the kNN
    # query-side collect), and the embeddings lookup becomes an IN
    # predicate that pushes down to the parquet scan. Measured 5.15 →
    # 3.28 s median at sf0.1 (same-JVM interleaved A/B, SCALE.md r9).
    # join the query text along so ONE job yields both the decision and
    # the sql arm's dispatch input (a second collect of the batch would
    # pay a full extra Spark job per interactive call)
    decisions = (
        route_queries(queries, routes, dim=dim)
        .join(
            queries.select("query_id", F.col("query").alias("_qtext")),
            "query_id",
        )
        .collect()
    )
    route_of = {r["query_id"]: r["route"] for r in decisions}
    unknown = sorted({rt for rt in route_of.values()} - {"search", "sql"})
    if unknown:
        # e.g. the reference's own label 'regular' — dropping such
        # queries silently would be data loss, not dispatch
        raise ValueError(
            f"routes classified queries to unhandled arm(s) {unknown}; "
            "this pipeline dispatches 'search' and 'sql' (rename the "
            "reference's 'regular' route to 'search')"
        )
    search_ids = sorted(
        route_of
        if always_search
        else (q for q, rt in route_of.items() if rt == "search")
    )

    # SEARCH arm — set-based on the routed subset
    sq = queries.filter(isin_ints("query_id", search_ids)).select(
        "query_id", "query"
    )
    kw = bm25_search(docs, sq, limit=n_retrieve, cache_key=cache_key)
    if query_vecs is None:
        qv = embeddings.filter(isin_ints("vec_id", search_ids)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    else:
        qv = query_vecs.filter(
            isin_ints("query_id", search_ids)
        ).select("query_id", "query_vec")
    vec = knn_search(embeddings, qv, k=n_retrieve).withColumnRenamed(
        "vec_id", "doc_id"
    )
    fused = hybrid_search(kw, vec, alpha=alpha, limit=k)
    search_arm = fused.select(
        F.col("query_id").cast("bigint"),
        F.lit("search").alias("route"),
        F.col("doc_id").cast("string").alias("result_key"),
        F.col("rank").cast("bigint").alias("result_rank"),
        F.round("score", 4).alias("result_value"),
    )

    # SQL arm — driver-dispatched per sql-routed query (reference shape);
    # the texts rode along with the (single) decision collect above
    sql_rows = [r for r in decisions if r["route"] == "sql"]
    arm = search_arm
    w = Window.orderBy(F.desc("result_value"), F.asc("result_key"))
    for r in sorted(sql_rows, key=lambda r: r["query_id"]):
        res = run_guarded_sql(spark, nl2sql(r["_qtext"]))
        arm = arm.unionByName(
            res.select(
                F.lit(r["query_id"]).cast("bigint").alias("query_id"),
                F.lit("sql").alias("route"),
                F.col("result_key").cast("string").alias("result_key"),
                F.row_number().over(w).cast("bigint").alias("result_rank"),
                F.col("result_value").cast("double").alias("result_value"),
            )
        )
    return arm
