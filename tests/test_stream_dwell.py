"""stream==batch equivalence for the dwell-time twin (streaming/dwell.py
vs the events_dwell_time lag window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.streaming.dwell import stream_dwell_times


def test_stream_dwell_equals_batch_lag(spark, tmp_path):
    rows = [
        # user 7: gaps 10, 50, tie-second pair (gap 0)
        (1, 7, 1000), (2, 7, 1010), (3, 7, 1060), (4, 7, 1060),
        # user 8: single event -> no gap rows
        (5, 8, 2000),
        # user 9: spans the file split
        (6, 9, 100), (7, 9, 400),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, es long")
    src = str(tmp_path / "ev")
    # two time-ordered files -> two micro-batches; user 9's gap crosses
    # them (coalesce(1): each batch must be ONE file — the in-order
    # delivery contract is per-file)
    df.filter(F.col("es") < 1050).coalesce(1).write.parquet(src + "/b1")
    df.filter(F.col("es") >= 1050).coalesce(1).write.parquet(src + "/b2")

    sink = str(tmp_path / "out")
    q = (
        stream_dwell_times(spark, src, "event_id long, user_id long, es long")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        (r["user_id"], r["event_id"]): r["gap_seconds"]
        for r in spark.read.parquet(sink).collect()
    }
    # batch lag() model
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("es"), F.asc("event_id"))
    want = {
        (r["user_id"], r["event_id"]): r["gap"]
        for r in df.withColumn("gap", F.col("es") - F.lag("es").over(w))
        .filter(F.col("gap").isNotNull())
        .collect()
    }
    assert got == want
    assert (7, 4) in got and got[(7, 4)] == 0  # tie-second pair
    assert (9, 7) in got and got[(9, 7)] == 300  # cross-batch gap
