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


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel state machine == batch window-algebra funnel on the
    real events table, including multi-micro-batch state carry-over (events
    split time-ordered across 3 files, one per trigger)."""
    import glob

    from vectorsearch_applications_spark.functions.time import epoch_seconds
    from vectorsearch_applications_spark.operators.funnel import funnel_counts
    from vectorsearch_applications_spark.streaming.funnel import stream_funnel

    ev = load_table(spark, SF_SMOKE, "events")
    e = ev.select(
        "user_id", "event_type", epoch_seconds(ev, "ts").alias("es")
    )
    # time-ordered file per micro-batch: split on es terciles
    lo, hi = e.selectExpr(
        "percentile(es, 0.33) p1", "percentile(es, 0.66) p2"
    ).collect()[0]
    src = str(tmp_path / "funnel_src")
    import os

    os.makedirs(src, exist_ok=True)
    parts = [
        e.filter(F.col("es") <= lo),
        e.filter((F.col("es") > lo) & (F.col("es") <= hi)),
        e.filter(F.col("es") > hi),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"_stage{i}"))
        f = glob.glob(str(tmp_path / f"_stage{i}" / "part-*.parquet"))[0]
        os.rename(f, os.path.join(src, f"{i:03d}.parquet"))

    static = spark.read.parquet(src)
    out = stream_funnel(
        spark, src, static.schema, ("view", "click", "purchase"), 86400
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: keep each user's LAST emitted row (final state)
    import pandas as pd

    rows = spark.sql("SELECT * FROM funnel_out").toPandas()
    final = rows.groupby("user_id").last()
    got = {
        "view": int(final["done_1"].sum()),
        "click": int(final["done_2"].sum()),
        "purchase": int(final["done_3"].sum()),
    }
    want = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(e, ["view", "click", "purchase"], 86400).collect()
    }
    assert got == want
