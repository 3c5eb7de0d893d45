"""Streaming ops (SURVEY §2.11): the streaming twin must agree with the
batch operator on the same input; watermark/session plumbing must run."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.sources.io import load_table
from vectorsearch_applications_spark.streaming.events import (
    stream_static_search_join,
    streaming_tumbling_counts,
    tumbling_counts_batch,
)

from .conftest import SF_SMOKE


def _events_ts(spark):
    """Events with a proper TimestampType column (streaming needs real
    timestamps for watermarks; the parquet stores ns-as-long)."""
    from vectorsearch_applications_spark.functions.time import to_timestamp_col

    ev = load_table(spark, SF_SMOKE, "events")
    return ev.withColumn("ts", to_timestamp_col(ev, "ts"))


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events_ts")
    _events_ts(spark).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    schema = static.schema

    stream_df = streaming_tumbling_counts(spark, src, schema, window_seconds=600)
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts_batch(static, 600)
        .select("bucket", "event_type", "n_events", "sum_value")
        .collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_static_join(spark, tmp_path):
    queries = spark.createDataFrame(
        [(0, "q zero"), (1, "q one")], "query_id long, query string"
    )
    src = str(tmp_path / "qstream")
    queries.write.mode("overwrite").parquet(src)
    static_hits = spark.createDataFrame(
        [(0, 101, 1), (0, 102, 2), (1, 103, 1)],
        "query_id long, doc_id long, rank long",
    )
    stream = spark.readStream.schema(queries.schema).parquet(src)
    joined = stream_static_search_join(stream, static_hits)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("join_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM join_out").collect()
    assert len(rows) == 3
    assert {(r["query_id"], r["doc_id"]) for r in rows} == {
        (0, 101),
        (0, 102),
        (1, 103),
    }


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: gap 1799 (same session), then EXACTLY 1800 (still the
        # same session — session_window merges on end >= next start, so
        # only a STRICTLY larger gap splits), then 1801 (new session)
        (1, 0, 1_000_000_000_000_000_000, 1.0),
        (1, 1, 1_000_000_000_000_000_000 + 1799 * 10**9, 1.0),
        (1, 2, 1_000_000_000_000_000_000 + (1799 + 1800) * 10**9, 1.0),
        (1, 3, 1_000_000_000_000_000_000 + (1799 + 1800 + 1801) * 10**9, 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, value double"
    )
    from vectorsearch_applications_spark.operators.windows import sessionize

    out = {r["event_id"]: r["session_id"] for r in sessionize(ev).collect()}
    assert out[0] == 0 and out[1] == 0 and out[2] == 0 and out[3] == 1


def test_sessionize_matches_session_window(spark):
    """The batch operator must agree with Spark's own session_window on
    session count AND session sizes — including exactly-gap events."""
    from vectorsearch_applications_spark.operators.windows import sessionize

    base = 1_700_000_000
    rows = []
    eid = 0
    for user, gaps in [
        (1, [0, 100, 1800, 5, 1799, 1800]),
        (2, [0, 1801, 1799, 1800, 60]),
        (3, [0]),
    ]:
        t = base
        for g in gaps:
            t += g
            rows.append((user, eid, t * 10**9, 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, value double"
    )

    batch = (
        sessionize(ev, gap_seconds=1800)
        .groupBy("user_id", "session_id")
        .count()
    )
    batch_sizes = {
        (r["user_id"], r["count"]) for r in batch.collect()
    }
    sw = (
        ev.withColumn("t", F.timestamp_seconds(F.expr("ts div 1000000000")))
        .groupBy("user_id", F.session_window("t", "1800 seconds"))
        .count()
    )
    sw_sizes = {(r["user_id"], r["count"]) for r in sw.collect()}
    assert batch_sizes == sw_sizes
    assert batch.count() == sw.count()


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """interval_join is streaming-composable as-is: the bucketed rewrite is
    a stream-static equi join + narrow filter (both append-safe), so the
    same operator drives batch backfill and the live stream."""
    from vectorsearch_applications_spark.operators.rangejoin import interval_join

    src = str(tmp_path / "facts")
    spark.createDataFrame(
        [(i, 1704412800 + i * 7200) for i in range(60)], "fact_id long, es long"
    ).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    intervals = spark.createDataFrame(
        [(1, 1704412800, 1704672000), (2, 1704499200, 1704585600)],
        "window_id long, w_start long, w_end long",
    )

    stream = spark.readStream.schema(static.schema).parquet(src)
    joined = interval_join(stream, intervals, "es", "w_start", "w_end", 86400)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("rj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["fact_id"], r["window_id"])
        for r in spark.sql("SELECT * FROM rj_out").collect()
    }
    want = {
        (r["fact_id"], r["window_id"])
        for r in interval_join(
            static, intervals, "es", "w_start", "w_end", 86400
        ).collect()
    }
    assert got == want and len(want) > 0


def test_dedup_event_stream_drops_retried_events(spark, tmp_path):
    """At-least-once input (each event retried 1-3x) → exactly one output
    row per event_id, equal to the batch distinct-by-key result."""
    from vectorsearch_applications_spark.streaming.events import (
        dedup_event_stream,
    )

    rows = []
    base = 1_700_000_000
    for i in range(40):
        for dup in range(1 + (i % 3)):  # 1-3 deliveries per event
            rows.append((i, i % 5, float(i), base + i * 60))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, es long"
    ).withColumn("ts", F.timestamp_seconds(F.col("es"))).drop("es")
    src = str(tmp_path / "dup_events")
    df.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)

    stream = spark.readStream.schema(static.schema).parquet(src)
    deduped = dedup_event_stream(stream, ["event_id"], "ts", "1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id, value FROM dedup_out").collect()
    assert len(got) == 40  # one per event, retries dropped
    assert {(r["event_id"], r["value"]) for r in got} == {
        (i, float(i)) for i in range(40)
    }


def test_stream_stream_attribution_equals_batch(spark, tmp_path):
    from vectorsearch_applications_spark.streaming.events import (
        stream_stream_attribution,
    )

    base = 1_700_000_000
    clicks_rows = [(u, base + u * 3600 + k * 300) for u in range(4) for k in range(3)]
    buys_rows = [(u, base + u * 3600 + 700, 9.99) for u in range(4)]
    clicks = spark.createDataFrame(clicks_rows, "user_id long, es long").withColumn(
        "ts", F.timestamp_seconds(F.col("es"))
    ).drop("es")
    buys = spark.createDataFrame(
        buys_rows, "user_id long, es long, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("es"))).drop("es")
    csrc, bsrc = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks.write.mode("overwrite").parquet(csrc)
    buys.write.mode("overwrite").parquet(bsrc)
    cstat, bstat = spark.read.parquet(csrc), spark.read.parquet(bsrc)

    out = stream_stream_attribution(
        spark.readStream.schema(cstat.schema).parquet(csrc),
        spark.readStream.schema(bstat.schema).parquet(bsrc),
        horizon="30 minutes",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["click_ts"], r["purchase_ts"])
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    want = {
        (r["user_id"], r["click_ts"], r["purchase_ts"])
        for r in stream_stream_attribution(cstat, buys, horizon="30 minutes").collect()
    }
    # purchase at +700s: clicks at +0/+300/+600 all within 30 min -> 3 each
    assert got == want and len(want) == 12


def test_streaming_curation_equals_batch(spark, tmp_path):
    """The curation projections (PII scrub + linear quality score +
    language-ID) are stateless, so they stream unchanged: running the
    documents table through readStream must give byte-identical rows to
    the batch plan — the shape of a continuously-ingesting 100 TB
    curation pipeline (foreachBatch appends per micro-batch)."""
    from vectorsearch_applications_spark.functions.scrub import scrub_text

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)

    def curate(df):
        toks = F.split(F.lower(F.col("text")), " ")
        score = (
            F.lit(0.5)
            + F.size(toks) / 64.0
            - F.length("text") / 512.0
        )
        return df.select(
            "doc_id",
            scrub_text(F.col("text")).alias("scrubbed"),
            score.alias("quality"),
            F.size(toks).alias("n_tokens"),
        )

    stream_in = spark.readStream.schema(static.schema).parquet(src)
    q = (
        curate(stream_in)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("curation_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["scrubbed"], r["quality"], r["n_tokens"])
        for r in spark.sql("SELECT * FROM curation_out").collect()
    }
    want = {
        r["doc_id"]: (r["scrubbed"], r["quality"], r["n_tokens"])
        for r in curate(static).collect()
    }
    assert got == want
    assert len(want) == static.count()
