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
    return (
        events.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
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


def stream_static_search_join(
    query_stream: DataFrame, static_hits: DataFrame
) -> DataFrame:
    """Micro-batch search: stream of (query_id, …) joined against a static
    precomputed hit/index table — the streaming analog of §3.1 retrieval.
    Plain stream-static inner join; Spark broadcasts the static side per
    micro-batch when small."""
    return query_stream.join(static_hits, "query_id")
