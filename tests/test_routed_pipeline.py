"""Routed §3.3 pipeline (plans/routed.py, r9 verdict task 5): route
dispatch, per-arm semantics, and the SELECT-only guard on the NL→SQL
egress."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_applications_spark.plans.routed import (
    routed_query_pipeline,
)
from vectorsearch_applications_spark.plans.router import route_queries
from vectorsearch_applications_spark.plans.text2sql import SqlGuardError
from vectorsearch_applications_spark.sources.io import load_table

from .conftest import SF_SMOKE

ROUTES = [
    ("sql", "how many episodes are there"),
    ("sql", "count the rows in the table"),
    ("search", "what did they say about sleep"),
    ("search", "tell me about morning light exposure"),
]
QUERIES = [
    (0, "how many views does the top episode have"),
    (1, "what was discussed about dopamine"),
    (2, "count guests with more than one episode"),
]
NL2SQL = {
    "how many views does the top episode have": (
        "SELECT o_orderpriority AS result_key, count(*) AS result_value "
        "FROM orders GROUP BY o_orderpriority"
    ),
    "what was discussed about dopamine": (
        "SELECT 'n_docs' AS result_key, count(*) AS result_value FROM documents"
    ),
    "count guests with more than one episode": (
        "SELECT c_mktsegment AS result_key, count(*) AS result_value "
        "FROM customer GROUP BY c_mktsegment HAVING count(*) > 1"
    ),
}


@pytest.fixture()
def fixtures(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    docs.createOrReplaceTempView("documents")
    load_table(spark, SF_SMOKE, "orders").createOrReplaceTempView("orders")
    load_table(spark, SF_SMOKE, "customer").createOrReplaceTempView("customer")
    routes = spark.createDataFrame(ROUTES, "route string, utterance string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    return docs, emb, routes, queries


def test_arms_match_route_decisions(spark, fixtures):
    docs, emb, routes, queries = fixtures
    out = routed_query_pipeline(
        spark, queries, routes, docs, emb, nl2sql=NL2SQL.__getitem__, k=5
    ).collect()
    routed = {
        r["query_id"]: r["route"]
        for r in route_queries(queries, routes).collect()
    }
    assert set(routed.values()) == {"sql", "search"}, "need a mixed batch"
    # every output row carries exactly its query's routed arm
    assert out
    for r in out:
        assert r["route"] == routed[r["query_id"]]
    # search-routed rows are ranked hit lists; sql-routed rows are the
    # generated statement's rows ranked by value
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        ranks = sorted(x["result_rank"] for x in rows)
        assert ranks == list(range(1, len(rows) + 1))
        if routed[qid] == "search":
            assert len(rows) <= 5


def test_sql_arm_rows_equal_direct_execution(spark, fixtures):
    docs, emb, routes, queries = fixtures
    out = routed_query_pipeline(
        spark, queries, routes, docs, emb, nl2sql=NL2SQL.__getitem__, k=5
    )
    routed = {
        r["query_id"]: r["route"]
        for r in route_queries(queries, routes).collect()
    }
    qtext = dict(QUERIES)
    for qid, route in routed.items():
        if route != "sql":
            continue
        direct = {
            (r["result_key"], float(r["result_value"]))
            for r in spark.sql(NL2SQL[qtext[qid]]).collect()
        }
        got = {
            (r["result_key"], r["result_value"])
            for r in out.filter(F.col("query_id") == qid).collect()
        }
        assert got == direct


def test_nl2sql_output_passes_the_guard(spark, fixtures):
    docs, emb, routes, queries = fixtures
    with pytest.raises(SqlGuardError):
        routed_query_pipeline(
            spark,
            queries,
            routes,
            docs,
            emb,
            nl2sql=lambda q: "DROP TABLE orders",
        ).collect()


def test_unknown_route_label_raises(spark, fixtures):
    # the reference names its search route 'regular' — a routes frame
    # ported verbatim must fail loudly, not silently drop those queries
    docs, emb, _, queries = fixtures
    routes = spark.createDataFrame(
        [
            ("sql", "how many episodes are there"),
            ("regular", "what did they say about sleep"),
        ],
        "route string, utterance string",
    )
    with pytest.raises(ValueError, match="regular"):
        routed_query_pipeline(
            spark, queries, routes, docs, emb, nl2sql=NL2SQL.__getitem__
        )


def test_always_search_adds_context_for_sql_queries(spark, fixtures):
    # reference-exact §3.3: reg_call hybrid search runs for EVERY query;
    # sql-routed queries get BOTH context rows and their sql answer
    docs, emb, routes, queries = fixtures
    out = routed_query_pipeline(
        spark,
        queries,
        routes,
        docs,
        emb,
        nl2sql=NL2SQL.__getitem__,
        k=5,
        always_search=True,
    ).collect()
    routed = {
        r["query_id"]: r["route"]
        for r in route_queries(queries, routes).collect()
    }
    arms = {}
    for r in out:
        arms.setdefault(r["query_id"], set()).add(r["route"])
    for qid, route in routed.items():
        if route == "sql":
            assert arms[qid] == {"search", "sql"}
        else:
            assert arms[qid] == {"search"}
