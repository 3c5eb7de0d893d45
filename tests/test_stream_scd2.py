"""Streaming SCD2 maintenance: stream==batch over micro-batch splits, and
batch-id fencing makes replays no-ops (streaming/scd2.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.timeseries import scd2_intervals
from vectorsearch_applications_spark.streaming.scd2 import (
    stream_scd2_collection,
)

ROWS = [
    # user 1: run continues across the batch boundary (merge path)
    (1, 1, "a", 100), (2, 1, "a", 300), (3, 1, "b", 400),
    # user 2: state flips at the boundary (close path)
    (4, 2, "x", 100), (5, 2, "y", 260),
    # user 3: batch 1 only; user 4: batch 2 only
    (6, 3, "z", 50), (7, 4, "q", 400),
]
SCHEMA = "event_id long, user_id long, state string, us long"


def _run(spark, src, tmp_path, ck_name):
    q = stream_scd2_collection(
        spark,
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        str(tmp_path),
        "dim",
        str(tmp_path / ck_name),
    )
    assert q.awaitTermination(180)


def test_stream_scd2_equals_batch_rebuild_and_fences_replays(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    src = str(tmp_path / "ev")
    df.filter(F.col("us") < 250).coalesce(1).write.parquet(src + "/b1")
    df.filter(F.col("us") >= 250).coalesce(1).write.parquet(src + "/b2")

    _run(spark, src, tmp_path, "ck1")

    key = lambda r: (r["user_id"], r["run_seq"])  # noqa: E731
    got = sorted(
        spark.read.parquet(str(tmp_path / "dim")).collect(), key=key
    )
    want = sorted(scd2_intervals(df, "user_id").collect(), key=key)
    assert got == want

    # at-least-once replay: a FRESH checkpoint re-delivers every batch
    # with already-applied batch ids — the in-generation fence must make
    # both replays no-ops (scd2_apply_increment itself is not idempotent,
    # so without the fence n_events would double)
    _run(spark, src, tmp_path, "ck2")
    again = sorted(
        spark.read.parquet(str(tmp_path / "dim")).collect(), key=key
    )
    assert again == want
