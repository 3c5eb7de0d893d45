"""Streaming CDC apply (streaming/cdc.py): foreachBatch merge must track
the change stream across restarts and equal the batch merge of the same
change set."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.sources.collections import (
    create_collection,
)
from vectorsearch_applications_spark.streaming.cdc import (
    stream_merge_collection,
)

CHANGES_SCHEMA = "doc_id long, text string, op string, seq long"


def _run(spark, src, root, ckpt):
    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_merge_collection(spark, stream, root, "c", ckpt)
    q.awaitTermination(180)


def test_stream_cdc_merge_tracks_change_files_across_restarts(spark, tmp_path):
    root, src, ckpt = str(tmp_path), str(tmp_path / "chg"), str(tmp_path / "ck")
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )
    create_collection(spark, root, "c", base)

    b1 = spark.createDataFrame(
        [(2, "TWO", "upsert", 1), (3, None, "delete", 1), (4, "four", "upsert", 1)],
        CHANGES_SCHEMA,
    )
    b1.write.parquet(src + "/b1")
    _run(spark, src, root, ckpt)
    got1 = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(f"{root}/c").collect()
    }
    assert got1 == {1: "one", 2: "TWO", 4: "four"}

    # restart with a new change file: only the delta is applied (the
    # checkpoint skips b1), and later seq wins over the applied state
    b2 = spark.createDataFrame(
        [(4, None, "delete", 2), (5, "five", "upsert", 1)], CHANGES_SCHEMA
    )
    b2.write.parquet(src + "/b2")
    _run(spark, src, root, ckpt)
    got2 = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(f"{root}/c").collect()
    }
    assert got2 == {1: "one", 2: "TWO", 5: "five"}
