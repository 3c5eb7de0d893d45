"""Streaming RAG micro-batch path (r10, r9 verdict task 8 stretch): the
§3.1 pipeline's streaming analog — query stream → persisted BM25 index
→ two-stage Σ-maxsim re-rank → rank-ordered prompt assembly — must
equal the batch composition over the same queries (the stream==batch
discipline), survive empty micro-batches, and resume idempotently from
its checkpoint under availableNow re-runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.bm25 import bm25_save_index
from vectorsearch_applications_spark.streaming.rag import (
    rag_answer_batch,
    stream_rag_pipeline,
)
from vectorsearch_applications_spark.sources.io import load_table

from .conftest import SF_SMOKE

Q1 = [(0, "spark join order"), (1, "window agg stream")]
Q2 = [(2, "fast filter merge sort")]
SCHEMA = "query_id long, query string"


def _setup(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    root = str(tmp_path)
    bm25_save_index(docs, root, "corpus")
    return docs, root


def test_stream_rag_equals_batch(spark, tmp_path):
    docs, root = _setup(spark, tmp_path)
    src = str(tmp_path / "queries_in")
    out = str(tmp_path / "prompts_out")

    spark.createDataFrame(Q1, SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame(Q2, SCHEMA).write.mode("append").parquet(src)

    q = stream_rag_pipeline(
        spark, root, "corpus", docs, src, out, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(300)

    got = {
        r["query_id"]: (r["n_context"], r["prompt"])
        for r in spark.read.parquet(out).collect()
    }
    both = spark.createDataFrame(Q1 + Q2, SCHEMA)
    want = {
        r["query_id"]: (r["n_context"], r["prompt"])
        for r in rag_answer_batch(
            spark, root, "corpus", docs, both
        ).collect()
    }
    # identical prompts per query: candidate pruning, re-rank order, and
    # rank-ordered context concatenation all agree with the batch twin
    assert got == want
    assert set(got) == {0, 1, 2}
    assert all(n > 0 and len(p) > 0 for n, p in got.values())


def test_stream_rag_checkpoint_resume_is_idempotent(spark, tmp_path):
    """A second availableNow run over the SAME source directory must add
    nothing (the checkpoint remembers consumed files); new files after
    the restart are processed exactly once."""
    docs, root = _setup(spark, tmp_path)
    src = str(tmp_path / "queries_in")
    out = str(tmp_path / "prompts_out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(Q1, SCHEMA).write.mode("append").parquet(src)
    q = stream_rag_pipeline(spark, root, "corpus", docs, src, out, ckpt)
    assert q.awaitTermination(300)
    n_first = spark.read.parquet(out).count()

    # replay with nothing new: no duplicate prompts
    q = stream_rag_pipeline(spark, root, "corpus", docs, src, out, ckpt)
    assert q.awaitTermination(300)
    assert spark.read.parquet(out).count() == n_first

    # late-arriving file processed exactly once on the next drain
    spark.createDataFrame(Q2, SCHEMA).write.mode("append").parquet(src)
    q = stream_rag_pipeline(spark, root, "corpus", docs, src, out, ckpt)
    assert q.awaitTermination(300)
    rows = spark.read.parquet(out).collect()
    ids = sorted(r["query_id"] for r in rows)
    assert ids == [0, 1, 2]


def test_stream_rag_replay_overwrites_not_duplicates(spark, tmp_path):
    """foreachBatch is at-least-once: a batch replayed after losing the
    checkpoint (the crash-between-sink-and-offset-commit window) must
    OVERWRITE its own batch_id partition, not append a second copy of
    every prompt."""
    import shutil

    docs, root = _setup(spark, tmp_path)
    src = str(tmp_path / "queries_in")
    out = str(tmp_path / "prompts_out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(Q1 + Q2, SCHEMA).write.mode("append").parquet(src)
    q = stream_rag_pipeline(spark, root, "corpus", docs, src, out, ckpt)
    assert q.awaitTermination(300)
    first = sorted(
        (r["query_id"], r["n_context"], r["prompt"])
        for r in spark.read.parquet(out).collect()
    )
    assert len(first) == 3

    # replay: checkpoint gone, same source, same epoch ids re-issued
    shutil.rmtree(ckpt)
    q = stream_rag_pipeline(spark, root, "corpus", docs, src, out, ckpt)
    assert q.awaitTermination(300)
    replayed = sorted(
        (r["query_id"], r["n_context"], r["prompt"])
        for r in spark.read.parquet(out).collect()
    )
    assert replayed == first  # not doubled, not reordered


def test_stream_rag_empty_batch_is_noop(spark, tmp_path):
    """An empty source drain writes nothing and does not crash (the
    isEmpty guard) — empty micro-batches are routine under availableNow
    restarts."""
    import os

    docs, root = _setup(spark, tmp_path)
    src = str(tmp_path / "queries_in")
    out = str(tmp_path / "prompts_out")
    # schema-only source dir: one empty file
    spark.createDataFrame([], SCHEMA).write.mode("append").parquet(src)
    q = stream_rag_pipeline(
        spark, root, "corpus", docs, src, out, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(300)
    assert not os.path.isdir(out) or spark.read.parquet(out).count() == 0


def test_rag_answer_batch_non_default_id_col(spark, tmp_path):
    """r10 review finding: the per-batch unit must work for collections
    whose id column is not literally 'doc_id' (the index search and the
    rerank both normalize to 'doc_id' internally)."""
    docs, root = _setup(spark, tmp_path)
    q = spark.createDataFrame(Q1, SCHEMA)
    base = {
        r["query_id"]: (r["n_context"], r["prompt"])
        for r in rag_answer_batch(spark, root, "corpus", docs, q).collect()
    }
    renamed = docs.withColumnRenamed("doc_id", "chunk_id")
    got = {
        r["query_id"]: (r["n_context"], r["prompt"])
        for r in rag_answer_batch(
            spark, root, "corpus", renamed, q, id_col="chunk_id"
        ).collect()
    }
    assert got == base
