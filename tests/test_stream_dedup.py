"""Ingest-time near-dup screening (streaming/dedup.py): the per-row band
projection must equal the batch band build, and the streamed screen must
equal the batch screen's new-vs-standing half over the same corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.dedup import (
    minhash_bands,
    minhash_bands_projection,
    minhash_screen_batch,
)
from vectorsearch_applications_spark.sources.io import load_table
from vectorsearch_applications_spark.streaming.dedup import (
    stream_minhash_screen,
)

from .conftest import SF_SMOKE

DOCS_SCHEMA = "doc_id long, text string"


def test_band_projection_equals_batch_build(spark):
    # value-identity of the two physical shapes over the real corpus,
    # including docs below the shingle bar (both must drop them)
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 300
    )
    batch = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in minhash_bands(docs).collect()
    }
    proj = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in minhash_bands_projection(docs).collect()
    }
    assert proj == batch and batch


def test_stream_screen_equals_batch_new_vs_standing(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 300
    )
    standing = docs.filter(F.col("doc_id") % 2 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    standing_bands = minhash_bands(standing).localCheckpoint(eager=False)

    # batch truth: the screen's pairs that have one standing (odd) side
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_screen_batch(
            standing_bands, minhash_bands(batch)
        ).collect()
        if r["doc_a"] % 2 != r["doc_b"] % 2
    }

    src = str(tmp_path / "docs")
    # the batch arrives as two files → two micro-batches
    batch.filter(F.col("doc_id") < 150).select("doc_id", "text").write.parquet(
        src + "/b1"
    )
    batch.filter(F.col("doc_id") >= 150).select(
        "doc_id", "text"
    ).write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = stream_minhash_screen(stream, standing_bands)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_screen_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got_rows = spark.sql("SELECT * FROM dedup_screen_stream").collect()
    got = {
        (min(r["new_doc_id"], r["standing_doc_id"]),
         max(r["new_doc_id"], r["standing_doc_id"]))
        for r in got_rows
    }
    assert got == want
    # evidence rows are per-band: multiplicity ≥ the distinct pair count
    assert len(got_rows) >= len(got)
