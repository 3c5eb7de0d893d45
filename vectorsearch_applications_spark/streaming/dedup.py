"""Ingest-time near-dup screening — the streaming twin of the
incremental MinHash index (operators/dedup.py minhash_index_append).

A document's LSH band rows depend only on its own shingles, so minting
them is a STATELESS projection that composes directly onto a readStream
source; screening is then one stream-static inner join against the
persisted standing band table (minhash_load_index). No watermark, no
state store, append-mode output — the same cheapest-shape contract as
streaming/hygiene.py.

The operator emits collision EVIDENCE rows (new_doc_id, standing_doc_id,
band), deliberately without stream-side dropDuplicates: a pair that
collides in two bands arrives twice, and keeping the operator stateless
means an unbounded ingest stream needs zero state store. Verdicts are
idempotent — feed them to a MERGE / set-union consumer, or bound a
dropDuplicatesWithinWatermark behind an ingest-time watermark if exact
once-per-pair emission matters. stream==batch (as SETS, vs the batch
screen's new-vs-standing half) is pinned by tests/test_stream_dedup.py.

At 100 TB/day the standing band table is the static side of the join
(bucket-pruned parquet, minhash_save_index layout); each micro-batch
pays one scan of its own rows plus the band-key join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_minhash_screen(
    docs_stream: DataFrame,
    standing_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Screen a document stream against a STATIC standing band table.

    Returns a streaming DataFrame of (new_doc_id, standing_doc_id, band)
    collision evidence — every LSH bucket the arriving doc shares with a
    standing doc. New-vs-new pairs within the live stream are NOT
    emitted (that would need stream-stream state); they surface when the
    batch is folded into the standing index (minhash_index_append), the
    same division of labor as the batch screen's two halves.
    """
    from ..operators.dedup import minhash_bands_projection

    # the per-row band projection (value-identical to the batch shape's
    # explode+distinct+agg build, which would be STATEFUL on a stream)
    new_bands = minhash_bands_projection(
        docs_stream, id_col, text_col, num_hashes, band_size, shingle_n
    )
    s = standing_bands.select(
        F.col("doc_id").alias("standing_doc_id"), "band", "band_key"
    )
    return (
        new_bands.select(
            F.col("doc_id").alias("new_doc_id"), "band", "band_key"
        )
        .join(s, ["band", "band_key"])
        # at-least-once redelivery (or re-ingesting an already-indexed
        # doc) must not pair a doc with itself in every shared band —
        # the batch screen (minhash_screen_batch) carries the same
        # predicate via its doc_a < doc_b condition
        .filter(F.col("new_doc_id") != F.col("standing_doc_id"))
        .select("new_doc_id", "standing_doc_id", "band")
    )


def stream_simhash_screen(
    docs_stream: DataFrame,
    standing_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash twin of :func:`stream_minhash_screen` — screen a document
    stream against a STATIC standing (doc_id, simhash, band, bval) table
    (simhash_save_index layout).

    Per-row fingerprints come from the zero-shuffle projection
    (operators/dedup.py simhash_fingerprints_projection — the batch
    shape's explode + term-vocab distinct + groupBy are stateful on a
    stream), candidates join on the pigeonhole band, and the EXACT
    hamming check runs as a stateless scalar on each candidate row, so
    the output is verified pairs, not just bucket evidence:
    (new_doc_id, standing_doc_id, band, hamming). Pairs colliding in
    several intact bands arrive once per band (no stream-side distinct,
    same zero-state contract as the MinHash screen); new-vs-new pairs
    surface when the batch folds into the standing index
    (simhash_index_append). stream==batch is pinned by
    tests/test_stream_dedup.py.
    """
    from ..operators.dedup import simhash_bands_projection

    new_bands = simhash_bands_projection(
        docs_stream, id_col, text_col, bits, max_hamming
    )
    s = standing_bands.select(
        F.col("doc_id").alias("standing_doc_id"),
        F.col("simhash").alias("standing_simhash"),
        "band",
        "bval",
    )
    return (
        new_bands.select(
            F.col("doc_id").alias("new_doc_id"),
            F.col("simhash").alias("new_simhash"),
            "band",
            "bval",
        )
        .join(s, ["band", "bval"])
        .filter(F.col("new_doc_id") != F.col("standing_doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("new_simhash").bitwiseXOR(F.col("standing_simhash"))
            ).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("new_doc_id", "standing_doc_id", "band", "hamming")
    )
