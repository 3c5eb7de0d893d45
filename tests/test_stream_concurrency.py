"""stream==batch equivalence for the running-concurrency twin
(streaming/concurrency.py vs operators/timeseries.py peak_concurrency,
the plan behind the graded events_peak_concurrency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.timeseries import (
    peak_concurrency,
)
from vectorsearch_applications_spark.streaming.concurrency import (
    stream_running_concurrency,
)

DUR = 60

ROWS = [
    # key "a": 3 overlapping, then a touching pair across the batch split
    (1, "a", 1000), (2, "a", 1030), (3, "a", 1059),
    (4, "a", 1119),  # [1059,1119) ends exactly here -> all three aged out
    (5, "a", 1179),  # [1119,1179) ends exactly here too
    # key "b": same-instant starts must stack
    (6, "b", 500), (7, "b", 500),
]


def test_stream_concurrency_equals_batch_sweep_line(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "event_id long, event_type string, es long")
    src = str(tmp_path / "ev")
    # time-ordered files -> micro-batches; key a's active set crosses the
    # split, so the state must carry end instants across batches
    df.filter(F.col("es") < 1100).coalesce(1).write.parquet(src + "/b1")
    df.filter(F.col("es") >= 1100).coalesce(1).write.parquet(src + "/b2")

    sink = str(tmp_path / "out")
    q = (
        stream_running_concurrency(
            spark, src, "event_id long, event_type string, es long",
            duration_seconds=DUR,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = spark.read.parquet(sink)
    # stream-side peak: max emitted concurrency, first es it appears
    stream_peaks = {
        r["event_type"]: (r["peak"], r["at"])
        for r in got.groupBy("event_type")
        .agg(F.max("concurrent").alias("peak"))
        .join(got, "event_type")
        .filter(F.col("concurrent") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("es").alias("at"))
        .collect()
    }
    iv = df.select(
        "event_type",
        F.col("es").alias("t0"),
        (F.col("es") + DUR).alias("t1"),
    )
    batch_peaks = {
        r["event_type"]: (r["peak_concurrent"], r["peak_at"])
        for r in peak_concurrency(iv, key_col="event_type").collect()
    }
    assert stream_peaks == batch_peaks
    # pin the semantics: expiry at the boundary is end-exclusive
    assert batch_peaks["a"] == (3, 1059)
    assert batch_peaks["b"] == (2, 500)
    per_event = {
        (r["event_type"], r["es"]): r["concurrent"] for r in got.collect()
    }
    # [1059,1119) ends EXACTLY at 1119 -> end-exclusive, not counted
    assert per_event[("a", 1119)] == 1
    # [1119,1179) ends exactly at 1179 -> likewise only the new interval
    assert per_event[("a", 1179)] == 1
