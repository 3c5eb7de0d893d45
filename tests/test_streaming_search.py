"""Streaming search: queries arrive on a stream, each micro-batch runs
BM25 against the static corpus index via foreachBatch — the §3.1 retrieval
pipeline as a continuous service."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.bm25 import bm25_search
from vectorsearch_applications_spark.sources.io import load_table

from .conftest import SF_SMOKE


def test_streaming_query_search(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "queries_in")
    out = str(tmp_path / "hits_out")

    q1 = spark.createDataFrame(
        [(0, "spark join order"), (1, "window agg stream")],
        "query_id long, query string",
    )
    q2 = spark.createDataFrame(
        [(2, "fast filter merge sort")], "query_id long, query string"
    )
    q1.write.mode("append").parquet(src)
    q2.write.mode("append").parquet(src)

    def search_batch(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        hits = bm25_search(docs, batch_df, limit=5, cache_key=SF_SMOKE)
        hits.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(q1.schema)
        .parquet(src)
        .writeStream.foreachBatch(search_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = spark.read.parquet(out)
    # every streamed query produced a ranked hit list identical to the
    # batch run of the same query
    batch = bm25_search(
        docs, q1.unionByName(q2), limit=5, cache_key=SF_SMOKE
    )
    g = {(r["query_id"], r["rank"]): r["doc_id"] for r in got.collect()}
    b = {(r["query_id"], r["rank"]): r["doc_id"] for r in batch.collect()}
    assert g == b
    assert {qid for qid, _ in g} == {0, 1, 2}
