"""Watermark late-data semantics: an event arriving after its window's
watermark has passed is dropped in append mode — the §2.11 late-data
handling, proven across two checkpointed availableNow runs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _df(spark, seconds):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(seconds=s), 1.0) for s in seconds]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def _run(spark, src, ckpt, out_dir):
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .parquet(src)
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "60 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    base = dt.datetime(2024, 1, 1)
    return {
        int((r["start"] - base).total_seconds()): r["n"]
        for r in spark.read.parquet(out_dir).collect()
    }


def test_late_event_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # batch 1: events at t=30s,35s (window [0,60)) and t=3600s — the last
    # advances the watermark to 3600-300 ≫ 60, finalizing window [0,60)
    _df(spark, [30, 35, 3600]).write.mode("append").parquet(src)
    out1 = _run(spark, src, ckpt, out_dir)
    assert out1.get(0) == 2  # [0,60) emitted with both on-time events

    # batch 2: a LATE event at t=40s — its window is already finalized and
    # past the watermark, so it must be dropped; plus an on-time event
    _df(spark, [40, 3720]).write.mode("append").parquet(src)
    # batch 3: a big watermark-advancing event finalizes 3600/3720 windows
    _df(spark, [90000]).write.mode("append").parquet(src)
    out3 = _run(spark, src, ckpt, out_dir)
    # window [0,60) still counts 2 — the late t=40 row did NOT update it —
    # and the finalized 3600/3720 windows hold one on-time row each
    assert out3[0] == 2
    assert out3[3600] == 1 and out3[3720] == 1
    assert sum(v for k, v in out3.items() if k != 0) == 2


def test_model_embed_without_library_raises(spark):
    from vectorsearch_applications_spark.functions.embed import (
        model_embed_factory,
    )

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    out = docs.mapInPandas(
        model_embed_factory(),  # no encode_fn, no sentence-transformers
        schema="doc_id long, text string, embedding array<float>",
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or "sentence-transformers" in str(
        ei.value
    )
