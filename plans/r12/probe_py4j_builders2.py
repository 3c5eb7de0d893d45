#!/usr/bin/env python
"""Round-trip counts for the SHARED mid-tier builders (hybrid fusion,
retrieval metrics, kNN, rerank, router, langid, zorder, pr_curve,
ngram-jaccard) — drill-down for the batch-3 conversion decisions.
Ad-hoc, delete-safe."""

from __future__ import annotations

import sys

HERE = "/root/repo"
sys.path.insert(0, HERE)

import py4j.clientserver as cs  # noqa: E402

COUNTER = {"n": 0}
_orig = cs.ClientServerConnection.send_command


def _patched(self, *a, **k):
    COUNTER["n"] += 1
    return _orig(self, *a, **k)


cs.ClientServerConnection.send_command = _patched

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_applications_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="py4j_builders2_r12")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
qdf = docs.limit(3).select(
    F.col("doc_id").alias("query_id"), F.col("text").alias("query")
)
qv = emb.limit(3).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
)
hits = docs.limit(10).select(
    F.lit(0).cast("long").alias("query_id"),
    "doc_id",
    F.lit(1).cast("long").alias("rank"),
    F.lit(0.5).alias("score"),
)


def count(label, fn):
    fn()
    COUNTER["n"] = 0
    fn()
    print(f"{COUNTER['n']:7d}  {label}")


from vectorsearch_applications_spark.operators import hybrid as hy  # noqa: E402
from vectorsearch_applications_spark.operators import knn as knn_m  # noqa: E402
from vectorsearch_applications_spark.operators import evaluation as ev  # noqa: E402
from vectorsearch_applications_spark.operators import rerank as rr  # noqa: E402
from vectorsearch_applications_spark.operators import textstats as ts  # noqa: E402
from vectorsearch_applications_spark.operators import dedup as dd  # noqa: E402

count("knn_search", lambda: knn_m.knn_search(emb, qv, k=10))
count("hybrid_search(fusion only)", lambda: hy.hybrid_search(hits, hits.withColumnRenamed("score", "distance"), alpha=0.25, limit=10))
count("rrf_fuse", lambda: hy.rrf_fuse([hits, hits], k=60, limit=10))
count("retrieval_metrics", lambda: ev.retrieval_metrics(
    hits.withColumn("method", F.lit("kw")),
    qdf.select("query_id", F.col("query_id").alias("relevant_doc_id")),
    method_col="method", methods=["kw"]))
count("rerank_overlap", lambda: rr.rerank_overlap(
    hits, qdf, docs.select("doc_id", "text")))
count("langid_ngram", lambda: ts.langid_ngram(docs))
count("ngram_jaccard_prefix_pairs", lambda: dd.ngram_jaccard_prefix_pairs(docs.limit(50)))

from vectorsearch_applications_spark.plans import router as rt  # noqa: E402

routes = spark.createDataFrame(
    [("search", "find documents about spark"), ("sql", "total revenue by region")],
    "route string, utterance string",
)
count("route_queries", lambda: rt.route_queries(qdf, routes, dim=16))

from vectorsearch_applications_spark.operators import classifier as cl  # noqa: E402

print("classifier fns:", [n for n in dir(cl) if not n.startswith("_")])
