"""Streaming SCD2 dimension maintenance — an in-order event stream folded
into a persisted type-2 dimension via the fenced foreachBatch harness
(streaming/fenced.py).

The streaming form of operators/timeseries.py scd2_apply_increment (the
batch operator behind the graded scd2_user_state): each micro-batch of
(key, state, order, tie) change events extends/closes the affected keys'
open runs and appends new ones. The increment is NOT idempotent
(replaying a batch would double n_events on merged runs), so replays are
fenced — see fenced.py for the in-generation batch-id fence that makes
at-least-once foreachBatch delivery effectively-once.

At 100 TB each micro-batch costs the batch's own windows plus one
key-equi-join against OPEN rows only — dimension history is never
rewritten logically (the parquet rewrite is physical; pair with
partitioned storage or a table format for surgical file rewrites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .fenced import fenced_fold_stream


def stream_scd2_collection(
    spark: SparkSession,
    events_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    state_col: str = "state",
    order_col: str = "us",
    tie_col: str = "event_id",
):
    """Start a foreachBatch query folding each event micro-batch into the
    SCD2 dimension collection at ``root/name``. Returns the
    StreamingQuery (caller awaits)."""
    from ..operators.timeseries import scd2_apply_increment, scd2_intervals

    def fold(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        dim = (
            current
            if current is not None
            else scd2_intervals(
                batch.limit(0), key_col, state_col, order_col, tie_col
            )
        )
        return scd2_apply_increment(
            dim, batch, key_col, state_col, order_col, tie_col
        )

    return fenced_fold_stream(
        spark, events_stream, root, name, checkpoint_dir, fold
    )
