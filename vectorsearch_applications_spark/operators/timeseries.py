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


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "state",
    order_col: str = "us",
    tie_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals (Kimball SCD2) from an
    ordered change log: consecutive runs of the same state per key
    collapse to one row with [valid_from, valid_to) stamps — valid_to is
    the NEXT run's start, NULL while current.

    Gaps-and-islands: run boundaries via lag(state), run ids via a
    running sum of boundary flags, then one aggregation per run. Ties at
    the same ``order_col`` instant break on ``tie_col`` so the run
    structure is deterministic. Both windows partition by the key — the
    natural distribution key — so nothing here is a global window.

    Returns (key, run_seq, state, valid_from, valid_to, n_events) with
    valid_from/valid_to in the units of ``order_col``.
    """
    wo = Window.partitionBy(key_col).orderBy(order_col, tie_col)
    r = (
        df.withColumn("_prev", F.lag(state_col).over(wo))
        .withColumn(
            "run_seq",
            F.sum(
                F.when(
                    F.col("_prev").isNull()
                    | (F.col("_prev") != F.col(state_col)),
                    1,
                ).otherwise(0)
            )
            .over(wo.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
    )
    runs = r.groupBy(
        key_col, "run_seq", F.col(state_col).alias("state")
    ).agg(
        F.min(order_col).cast("bigint").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wn = Window.partitionBy(key_col).orderBy("run_seq")
    return runs.select(
        key_col,
        "run_seq",
        "state",
        "valid_from",
        F.lead("valid_from").over(wn).alias("valid_to"),
        "n_events",
    )


def peak_concurrency(
    intervals: DataFrame,
    key_col: str = "event_type",
    start_col: str = "t0",
    end_col: str = "t1",
    n_chunks: int | None = None,
) -> DataFrame:
    """Sweep-line maximum interval overlap per key with EXACT
    end-exclusive [start, end) semantics: +1/−1 deltas are
    pre-aggregated per (key, instant) BEFORE the running sum, so a
    touching pair (one ends exactly where another starts) nets to zero
    at that instant and never double-counts — and the window input has
    unique ordered keys, making the running sum deterministic without a
    tie-break column.

    Returns (key, peak_concurrent, peak_at) — the max simultaneous
    intervals and the first instant it is reached.

    ``n_chunks=None`` (default) runs the per-key running sum as one
    window — right whenever distinct instants per key fit a task.
    ``n_chunks=N`` is the GIANT-KEY fallback (SCALE.md): each key's
    time range splits into N value-range chunks, the running sum is
    computed per (key, chunk) — task input is the chunk, not the key —
    and chunk prefix totals (N rows per key) are joined back as
    offsets. Identical results by construction (a prefix sum split at
    chunk boundaries plus the sum of earlier chunks); proven equal in
    test_timeseries.py, including a single pathological key.
    """
    pts = intervals.select(
        key_col, F.col(start_col).alias("t"), F.lit(1).alias("d")
    ).unionAll(
        intervals.select(
            key_col, F.col(end_col).alias("t"), F.lit(-1).alias("d")
        )
    )
    g = pts.groupBy(key_col, "t").agg(F.sum("d").alias("d"))
    if n_chunks is None:
        r = g.withColumn(
            "conc",
            F.sum("d").over(
                Window.partitionBy(key_col)
                .orderBy("t")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    else:
        # value-range chunking: deterministic (no quantile estimate), one
        # bounds agg per key joined back on the key. floor arithmetic maps
        # t ∈ [mn, mx] to chunk ∈ [0, n_chunks-1].
        bounds = g.groupBy(key_col).agg(
            F.min("t").alias("_mn"), F.max("t").alias("_mx")
        )
        c = (
            g.join(bounds, key_col)
            .withColumn(
                "_chunk",
                F.floor(
                    (F.col("t") - F.col("_mn"))
                    * F.lit(n_chunks)
                    / (F.col("_mx") - F.col("_mn") + 1)
                ).cast("bigint"),
            )
            .drop("_mn", "_mx")
        )
        local = c.withColumn(
            "_local",
            F.sum("d").over(
                Window.partitionBy(key_col, "_chunk")
                .orderBy("t")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        # chunk totals: ≤ n_chunks rows per key, so the prefix window over
        # them is trivially bounded; offset = sum of STRICTLY EARLIER
        # chunks' totals.
        offsets = (
            c.groupBy(key_col, "_chunk")
            .agg(F.sum("d").alias("_tot"))
            .withColumn(
                "_off",
                F.coalesce(
                    F.sum("_tot").over(
                        Window.partitionBy(key_col)
                        .orderBy("_chunk")
                        .rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .select(key_col, "_chunk", "_off")
        )
        r = (
            local.join(offsets, [key_col, "_chunk"])
            .withColumn("conc", F.col("_local") + F.col("_off"))
            .drop("_chunk", "_local", "_off")
        )
    p = r.groupBy(key_col).agg(F.max("conc").alias("peak"))
    return (
        r.join(p, key_col)
        .filter(F.col("conc") == F.col("peak"))
        .groupBy(key_col, "peak")
        .agg(F.min("t").cast("bigint").alias("peak_at"))
        .select(
            key_col,
            F.col("peak").cast("bigint").alias("peak_concurrent"),
            "peak_at",
        )
    )


def scd2_apply_increment(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str = "user_id",
    state_col: str = "state",
    order_col: str = "us",
    tie_col: str = "event_id",
) -> DataFrame:
    """Apply a NEW batch of in-order events to an existing SCD2 dimension
    without rebuilding it — the incremental-maintenance form of
    :func:`scd2_intervals` (the CDC-to-dimension path: close open runs
    whose state changed, extend open runs whose state continued, append
    the rest).

    Contract: append-only, in-order delivery — every batch event's
    ``order_col`` is ≥ all previously applied events for its key (the
    same contract as the stream==batch twins). Under it, only each key's
    OPEN run (valid_to IS NULL) can change; closed history is immutable.

    Plan shape: the batch is collapsed to runs by scd2_intervals (windows
    over the BATCH only), then one key-equi-join against the dimension's
    open rows decides merge-vs-close; untouched keys pass through via an
    anti-join. Cost scales with the batch and the affected keys' open
    rows, never with dimension history — the property that makes nightly
    10 TB dimension maintenance a merge, not a rebuild.

    Incremental == full-rebuild equality is proven in
    test_timeseries.py::test_scd2_increment_equals_full_rebuild.
    """
    b_runs = scd2_intervals(batch, key_col, state_col, order_col, tie_col)
    b1 = b_runs.filter(F.col("run_seq") == 1).select(
        key_col,
        F.col("state").alias("b1_state"),
        F.col("valid_from").alias("b1_from"),
        F.col("valid_to").alias("b1_to"),
        F.col("n_events").alias("b1_n"),
    )
    open_ = dim.filter(F.col("valid_to").isNull()).select(
        key_col,
        F.col("run_seq").alias("open_seq"),
        F.col("state").alias("open_state"),
        F.col("valid_from").alias("open_from"),
        F.col("n_events").alias("open_n"),
    )
    info = (
        b1.join(open_, key_col, "left")
        .withColumn(
            "merged",
            F.coalesce(
                F.col("open_state") == F.col("b1_state"), F.lit(False)
            ),
        )
        .withColumn("base_seq", F.coalesce(F.col("open_seq"), F.lit(0)))
    )
    # keys with an open run: extend it (same state) or close it
    upd_open = info.filter(F.col("open_seq").isNotNull()).select(
        key_col,
        F.col("open_seq").alias("run_seq"),
        F.col("open_state").alias("state"),
        F.col("open_from").alias("valid_from"),
        F.when(F.col("merged"), F.col("b1_to"))
        .otherwise(F.col("b1_from"))
        .alias("valid_to"),
        F.when(F.col("merged"), F.col("open_n") + F.col("b1_n"))
        .otherwise(F.col("open_n"))
        .alias("n_events"),
    )
    # batch runs appended as new dimension rows (run 1 is absorbed into
    # the open row when it merged)
    new_runs = (
        b_runs.join(info.select(key_col, "merged", "base_seq"), key_col)
        .filter(~(F.col("merged") & (F.col("run_seq") == 1)))
        .select(
            key_col,
            (
                F.col("base_seq")
                + F.col("run_seq")
                - F.when(F.col("merged"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("run_seq"),
            "state",
            "valid_from",
            "valid_to",
            "n_events",
        )
    )
    touched = batch.select(key_col).distinct()
    untouched = dim.join(touched, key_col, "left_anti")
    closed_affected = dim.filter(F.col("valid_to").isNotNull()).join(
        touched, key_col, "semi"
    )
    cols = [key_col, "run_seq", "state", "valid_from", "valid_to", "n_events"]
    return (
        untouched.select(cols)
        .unionByName(closed_affected.select(cols))
        .unionByName(upd_open)
        .unionByName(new_runs)
    )
