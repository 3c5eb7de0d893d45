"""Time-series regularization: resample events onto a fixed bucket grid
and forward-fill gaps.

The missing piece between raw event streams and per-entity model features:
downstream consumers (feature stores, trend models, monitoring) want one
row per (entity, bucket) even when no event fell in the bucket. The
reference has no batch analog (its data is request/response shaped); this
extends the §2.11 events surface per the training-pipeline mandate.

Plan shape (the 100 TB story):
- one shuffle on (key, bucket) producing BOTH the per-bucket event count
  and the last observation — the "last" is ``max(struct(es, event_id,
  value))`` inside the same aggregation, so no second window pass over raw
  events;
- the grid is generated per key with ``sequence(min_bucket, max_bucket)``
  — its size is bounded by the key's TIME SPAN, not its event count, so a
  hot key with 10^9 events still explodes to only span/bucket rows;
- forward fill is one window (``last(..., ignorenulls=True)``) over the
  grid, partitioned by key — grid rows per key are span-bounded, so the
  window never sees unbounded partitions.

Determinism: the carried value is a raw input double (bit-identical in
any engine); bucket ids and counts are BIGINT; "last" ties are impossible
(es, event_id) is unique per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Regularize to one row per (key, bucket) from each key's first to
    last observed bucket; gaps carry the previous observed value forward.

    Returns (key, bucket, n_events, filled_value, is_gap) where
    ``filled_value`` is the last event value at or before the bucket and
    ``is_gap`` (BIGINT 0/1) marks buckets with no events.
    """
    from ..functions.time import epoch_seconds

    base = events.select(
        F.col(key_col).alias("key"),
        epoch_seconds(events, ts_col).alias("es"),
        F.col(id_col).alias("eid"),
        F.col(value_col).alias("v"),
    ).withColumn("bucket", F.expr(f"es DIV {bucket_seconds}"))
    # one aggregation: count + last observation (max of the unique
    # (es, eid) order, value carried in the struct)
    obs = base.groupBy("key", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(F.struct("es", "eid", "v"))["v"].alias("obs_value"),
    )
    rng = obs.groupBy("key").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = rng.select(
        "key", F.explode(F.sequence("mn", "mx")).alias("bucket")
    )
    j = grid.join(obs, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "key",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("obs_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("obs_value").isNull().cast("bigint").alias("is_gap"),
    )
