"""Streaming operators over the `events` table (SURVEY.md §2.11).

The reference has no data-stream processing (its only streaming is LLM
token streaming to the UI, ``src/app_functions.py:90-111``); these are the
streaming-native analogs the north star asks for, built on stock Structured
Streaming: windowed aggregates with watermarks, and a stream-static join of
incoming queries against a static chunk index.

Every streaming aggregate has a batch twin with identical semantics
(``*_batch``) — that twin is what the DuckDB oracle checks, and the pytest
streaming tests assert stream-result == batch-result on the same input
(availableNow trigger drains the parquet source synchronously).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.time import epoch_seconds


def tumbling_counts_batch(
    events: DataFrame, window_seconds: int = 600
) -> DataFrame:
    """Per (tumbling window, event_type): count + value aggregates.

    Bucket id = epoch_seconds DIV window — exact integer arithmetic,
    engine-portable (no timezone/struct columns in the output; BIGINT
    hash-matches everywhere).
    """
    # es < 2^53 so double division is exact enough for the truncation cast
    bucket = (epoch_seconds(events, "ts") / window_seconds).cast("bigint")
    # No avg column on purpose: the event values are 2-decimal numbers, so
    # sum/count lands exactly on rounding half-way points where engines
    # legitimately disagree (Spark HALF_UP vs DuckDB half-even). count +
    # sum carry the same information exactly; consumers derive the mean.
    return (
        events.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sliding_counts_batch(
    events: DataFrame, window_seconds: int = 600, slide_seconds: int = 300
) -> DataFrame:
    """Batch twin of the sliding window: each event lands in
    window/slide overlapping windows, materialized by exploding the window
    indexes it belongs to (k ∈ [es DIV slide − overlap + 1, es DIV slide]).

    Exact integer arithmetic (window start = k·slide as BIGINT epoch
    seconds) so it is oracle-checkable; the earliest events legitimately
    produce a pre-range window start (k may index a window starting before
    the first slide boundary), matching F.window's semantics.
    """
    assert window_seconds % slide_seconds == 0, "window must be a multiple of slide"
    n_over = window_seconds // slide_seconds
    es = epoch_seconds(events, "ts")
    # es < 2^31 so the double division below is exact; es ≥ 0 so the
    # truncating cast equals floor. sequence() is ascending (n_over ≥ 1).
    k_max = F.floor(es / F.lit(slide_seconds)).cast("bigint")
    return (
        events.select(
            F.col("event_type"),
            F.col("value"),
            F.explode(
                F.sequence(k_max - F.lit(n_over - 1), k_max)
            ).alias("k"),
        )
        .groupBy(
            (F.col("k") * slide_seconds).alias("win_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    events_path: str,
    schema,
    window_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """The streaming twin: readStream → watermark → window agg.

    Returns the streaming DataFrame; caller attaches writeStream (tests use
    format('memory') + trigger(availableNow=True)).
    """
    stream = (
        spark.readStream.schema(schema).parquet(events_path)
        .withWatermark("ts", watermark)
    )
    win = F.window(F.col("ts"), f"{window_seconds} seconds")
    return (
        stream.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.floor(F.col("w.start").cast("double") / window_seconds)
            .cast("bigint")
            .alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    window_seconds: int = 600,
    slide_seconds: int = 300,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts with late-data handling — each event
    lands in window/slide overlapping windows; the watermark bounds state."""
    stream = (
        spark.readStream.schema(schema).parquet(events_path)
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(
            F.window(F.col("ts"), f"{window_seconds} seconds", f"{slide_seconds} seconds").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("double").cast("bigint").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def user_running_totals_stateful(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value total maintained in explicit state across
    micro-batches (the §2.11 'custom stateful operator' slot).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    stream = spark.readStream.schema(schema).parquet(events_path)
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def stream_static_search_join(
    query_stream: DataFrame, static_hits: DataFrame
) -> DataFrame:
    """Micro-batch search: stream of (query_id, …) joined against a static
    precomputed hit/index table — the streaming analog of §3.1 retrieval.
    Plain stream-static inner join; Spark broadcasts the static side per
    micro-batch when small."""
    return query_stream.join(static_hits, "query_id")


def dedup_event_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once repair for at-least-once event ingestion: drop
    duplicate events by key within a watermark horizon.

    At-least-once producers (retrying collectors, replayed Kafka offsets,
    task re-execution upstream) emit the same event id more than once;
    every downstream count/sum silently inflates. Unbounded
    ``dropDuplicates`` would grow its dedup state forever on an infinite
    stream — ``dropDuplicatesWithinWatermark`` bounds state to the
    watermark window, which is the only version that survives at 100 TB/
    day: state is O(events per horizon), evicted as the watermark
    advances, and duplicates arriving later than the horizon are by
    definition outside the producer's retry window.

    The input must carry a real timestamp column; BIGINT-ns sources go
    through functions.time.to_timestamp_col first.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream join: attribute each purchase to every click by the
    same user within the preceding ``horizon`` (last-touch attribution's
    candidate set, the canonical two-stream correlation).

    Both sides carry watermarks and the join condition carries an explicit
    event-time range (click ≤ purchase ≤ click + horizon) — exactly what
    Structured Streaming needs to bound the buffered state on BOTH sides:
    each side's rows are held only until the other side's watermark passes
    the range, so state is O(events per horizon) regardless of stream
    length. Without the time bound the join would be rejected (unbounded
    state). Output columns: (user_id, click_ts, purchase_ts, plus the
    purchase's ``value`` if present).
    """
    c = clicks.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("click_ts")
    ).withWatermark("click_ts", horizon)
    p_cols = [
        F.col(user_col).alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
    ]
    if "value" in purchases.columns:
        p_cols.append(F.col("value"))
    p = purchases.select(*p_cols).withWatermark("purchase_ts", horizon)
    return p.join(
        c,
        F.expr(
            "user_id = p_user AND click_ts <= purchase_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
    ).drop("p_user")
