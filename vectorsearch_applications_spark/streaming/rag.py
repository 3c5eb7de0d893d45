"""Streaming RAG — the reference's §3.1 app loop (``src/app.py``:
retrieve → assemble context prompt → generate; driven through rag_ui.py
as an interactive service) as a Structured Streaming micro-batch
pipeline over PERSISTED indexes.

Queries arrive on a stream; each micro-batch (a) prunes candidates per
query against the on-disk BM25 index (no corpus scan, no stats rebuild
— ``bm25_search_indexed`` reads the saved postings/stats tables), (b)
re-ranks the bounded candidate set with Σ-maxsim late interaction (the
two-stage deployment, operators/late_interaction.py), and (c) assembles
rank-ordered context prompts (operators/prompts.py) ready for the F3
completion egress. foreachBatch + a file sink keep the pipeline
restartable from the checkpoint; the batch twin of every micro-batch is
the identical composition over the same query set, equivalence-pinned
in tests/test_stream_rag.py (the stream==batch discipline every
streaming module here keeps).

Scale shape: per micro-batch the standing corpus contributes only (i)
the postings slice matching the batch's query terms (broadcast
semi-join inside the scoring core) and (ii) the candidate docs' text
(IN-pushdown scan via the rerank's literal re-entry) — both bounded by
|batch|·n_candidates, never corpus size. State lives on disk in the
index tables; the stream itself is stateless, so a 100 TB corpus serves
an unbounded query stream at per-batch cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.bm25 import bm25_search_indexed
from ..operators.late_interaction import late_interaction_rerank
from ..operators.prompts import assemble_prompts


def rag_answer_batch(
    spark,
    root: str,
    name: str,
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 25,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One RAG retrieval+assembly pass over a bounded query batch —
    the unit the stream runs per micro-batch AND the batch twin the
    equivalence test compares against. Output: (query_id, n_context,
    prompt); the streaming sink adds a ``batch_id`` partition column."""
    from pyspark.sql import functions as F

    # the index search and the rerank both NORMALIZE to 'doc_id'; hand
    # each consumer the id under the name it expects (the
    # late_interaction_two_stage rename pattern) so a non-default
    # id_col works end-to-end
    cands = bm25_search_indexed(
        spark, root, name, queries, limit=n_candidates
    ).select("query_id", F.col("doc_id").alias(id_col))
    hits = late_interaction_rerank(
        docs,
        queries,
        cands,
        k=k,
        dim=dim,
        id_col=id_col,
        text_col=text_col,
    ).withColumnRenamed("doc_id", id_col)
    return assemble_prompts(
        hits, docs, queries, id_col=id_col, text_col=text_col
    )


def stream_rag_pipeline(
    spark,
    root: str,
    name: str,
    docs: DataFrame,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    n_candidates: int = 25,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire the query stream end-to-end: parquet source → per-batch
    :func:`rag_answer_batch` against the persisted ``name`` BM25 index →
    parquet sink. Returns the started StreamingQuery (availableNow
    trigger — drains what exists, then stops; swap the trigger for a
    continuous service). The memory sink cannot recover from a
    checkpoint, hence the file sink (repo streaming convention).

    Effectively-once sink: foreachBatch replays batches at-least-once
    (streaming/fenced.py exists for exactly this), and a bare append
    would duplicate every prompt of a batch replayed after a crash
    between the sink write and the checkpoint offset commit. Each batch
    therefore OVERWRITES its own ``batch_id=<epoch>`` partition
    directory — a replay rewrites the same rows instead of appending a
    second copy, and readers see the standard partition-discovery
    layout (``spark.read.parquet(out_dir)`` with a batch_id column)."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = rag_answer_batch(
            spark,
            root,
            name,
            docs,
            batch_df,
            k=k,
            n_candidates=n_candidates,
            dim=dim,
            id_col=id_col,
            text_col=text_col,
        )
        import os

        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={int(epoch_id)}")
        )

    return (
        spark.readStream.schema("query_id long, query string")
        .parquet(source_dir)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
