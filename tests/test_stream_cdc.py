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
    assert q.awaitTermination(180)


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


def _orders_change_set(o):
    """The graded merge_upsert_orders change set (queries.py): update,
    insert, delete, and a same-key seq-2 upsert/delete race."""
    m97 = F.col("o_orderkey") % 97
    upd = (
        o.filter(m97 == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("op", F.lit("upsert"))
        .withColumn("seq", F.lit(1))
    )
    ins = (
        o.filter(m97 == 2)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
        .withColumn("op", F.lit("upsert"))
        .withColumn("seq", F.lit(1))
    )
    dels = o.filter(m97 == 3).withColumn("op", F.lit("delete")).withColumn(
        "seq", F.lit(2)
    )
    race = (
        o.filter(m97 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") * 3)
        .withColumn("op", F.lit("upsert"))
        .withColumn("seq", F.lit(2))
    )
    return upd.unionByName(ins).unionByName(dels).unionByName(race)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_merge_equals_batch_merge_frame_on_graded_fixture(
    spark, tmp_path
):
    """stream==batch for MERGE on the shared merge_frame/merge_winners
    core (r6 verdict task #7): stream_merge_collection applied to the
    graded merge_upsert_orders change set must leave the collection
    bitwise equal to the pure-DataFrame merge_frame plan the driver
    grades — whether the change set arrives as one micro-batch or split
    across two."""
    from vectorsearch_applications_spark.sources.collections import (
        merge_frame,
    )
    from vectorsearch_applications_spark.sources.io import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    changes = _orders_change_set(o)
    want = _rows(merge_frame(o, changes, key_col="o_orderkey"))

    # one micro-batch
    root1 = str(tmp_path / "one")
    create_collection(spark, root1, "o", o)
    changes.write.parquet(str(tmp_path / "chg1" / "b1"))
    stream = (
        spark.readStream.schema(changes.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "chg1"))
    )
    assert stream_merge_collection(
        spark, stream, root1, "o", str(tmp_path / "ck1"), key_col="o_orderkey"
    ).awaitTermination(180)
    assert _rows(spark.read.parquet(f"{root1}/o")) == want

    # the same change set split across two micro-batches (seq-1 arms
    # first, then the seq-2 delete/race arms over the applied state)
    root2 = str(tmp_path / "two")
    create_collection(spark, root2, "o", o)
    changes.filter(F.col("seq") == 1).write.parquet(
        str(tmp_path / "chg2" / "b1")
    )
    stream2 = (
        spark.readStream.schema(changes.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "chg2"))
    )
    assert stream_merge_collection(
        spark, stream2, root2, "o", str(tmp_path / "ck2"),
        key_col="o_orderkey",
    ).awaitTermination(180)
    changes.filter(F.col("seq") == 2).write.parquet(
        str(tmp_path / "chg2" / "b2")
    )
    stream3 = (
        spark.readStream.schema(changes.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "chg2"))
    )
    assert stream_merge_collection(
        spark, stream3, root2, "o", str(tmp_path / "ck2"),
        key_col="o_orderkey",
    ).awaitTermination(180)
    assert _rows(spark.read.parquet(f"{root2}/o")) == want
