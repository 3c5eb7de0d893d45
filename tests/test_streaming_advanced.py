"""Sliding windows + custom stateful operator (applyInPandasWithState)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.functions.time import to_timestamp_col
from vectorsearch_applications_spark.sources.io import load_table
from vectorsearch_applications_spark.streaming.events import (
    sliding_counts_batch,
    sliding_counts_stream,
    user_running_totals_stateful,
)

from .conftest import SF_SMOKE


def _events_src(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_ts")
    ev.withColumn("ts", to_timestamp_col(ev, "ts")).write.mode(
        "overwrite"
    ).parquet(src)
    return src, spark.read.parquet(src)


def test_sliding_counts_match_batch(spark, tmp_path):
    src, static = _events_src(spark, tmp_path)
    stream_df = sliding_counts_stream(
        spark, src, static.schema, window_seconds=600, slide_seconds=300
    )
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sliding_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    # batch twin — the oracle-backed op behind the events_sliding_agg query
    want_df = sliding_counts_batch(static, window_seconds=600, slide_seconds=300)
    want = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in want_df.collect()
    }
    assert got == want
    # sanity: sum over sliding windows counts every event exactly twice
    assert sum(got.values()) == 2 * static.count()


def test_stateful_running_totals(spark, tmp_path):
    src, static = _events_src(spark, tmp_path)
    out = user_running_totals_stateful(spark, src, static.schema)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # last emitted row per user must equal the batch totals
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in static.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(want)
    for u in want:
        assert final[u][0] == want[u][0]
        assert abs(final[u][1] - want[u][1]) < 1e-6
