"""Streaming CDC apply — a change-data-capture stream merged into a
parquet collection via foreachBatch.

The streaming twin of sources/collections.py merge_collection: each
micro-batch of (row columns, op, seq) changes is applied with the same
last-writer-wins MERGE semantics, so the collection continuously tracks
an upstream source without a table format dependency (the Delta/Iceberg
MERGE INTO shape on plain parquet).

Exactly-once behavior comes from two properties:
  1. merge_collection's change-set reduction is idempotent — replaying a
     batch whose keys already carry the final values rewrites the same
     rows (seq ties break toward delete, so replayed deletes cannot
     resurrect);
  2. foreachBatch + checkpointing replays at-least-once; idempotent
     apply upgrades that to effectively-once table state.

At 100 TB the merge's anti-join is keyed on the merge key only (see
merge_collection); a production deployment pairs this with periodic
compact_collection since each micro-batch rewrite produces a fresh
generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_merge_collection(
    spark: SparkSession,
    changes_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Start a foreachBatch query applying each CDC micro-batch with
    merge_collection. Returns the StreamingQuery (caller awaits)."""
    from ..sources.collections import merge_collection

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_collection(
            spark, root, name, batch_df, key_col, op_col, seq_col
        )

    return (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
