"""stream==batch equivalence for the burst-count twin (streaming/burst.py
transformWithStateInPandas vs the trailing RANGE-frame window that
events_burst_users builds on)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vectorsearch_applications_spark.streaming.burst import stream_burst_counts


def test_stream_burst_equals_batch_range_frame(spark, tmp_path):
    rows = [
        # user 7: burst of 3 within 60 s, then a lull, then 2 more
        (1, 7, 1000), (2, 7, 1030), (3, 7, 1059), (4, 7, 1200), (5, 7, 1259),
        # user 8: single event
        (6, 8, 2000),
        # user 9: window boundary exactness (1000 vs 1059 in, 1060 out)
        (7, 9, 1000), (8, 9, 1059), (9, 9, 1060),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, es long")
    src = str(tmp_path / "ev")
    # two time-ordered files -> two micro-batches; user 7's second burst
    # and user 9's boundary event cross the batch split, so the ListState
    # must carry the trailing window across batches
    df.filter(F.col("es") < 1100).coalesce(1).write.parquet(src + "/b1")
    df.filter(F.col("es") >= 1100).coalesce(1).write.parquet(src + "/b2")

    sink = str(tmp_path / "out")
    q = (
        stream_burst_counts(
            spark, src, "event_id long, user_id long, es long",
            window_seconds=60,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        (r["user_id"], r["es"]): r["burst_count"]
        for r in spark.read.parquet(sink).collect()
    }
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("es"))
        .rangeBetween(-59, 0)
    )
    want = {
        (r["user_id"], r["es"]): r["n"]
        for r in df.withColumn("n", F.count(F.lit(1)).over(w)).collect()
    }
    assert got == want
    # spot-check the semantics themselves
    assert want[(7, 1059)] == 3 and want[(7, 1259)] == 2
    assert want[(9, 1059)] == 2 and want[(9, 1060)] == 2  # 1000 aged out
