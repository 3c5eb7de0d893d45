"""Streaming sketch maintenance — mergeable sketches folded over a
stream via the fenced foreachBatch harness (streaming/fenced.py).

Mergeability IS the streaming story: a Count-Min table merges by summing
matching cells and an FM sketch by taking per-bucket maxima, so the
streaming accumulator is literally ``merge(state, sketch(batch))`` — the
same reduction the batch build runs across partitions, applied across
TIME instead. stream==batch equality (test_stream_sketches.py) is the
mergeability property itself, exercised over micro-batches.

Replays are fenced (summed cells double-count on replay; maxima would
survive it, but both go through the same harness for uniformity — one
correctness argument instead of two).

State size is the sketch's own bound — d·w cells for CMS, n_buckets
integers per group for FM — regardless of how many events the stream has
carried: the bounded-state answer to "top terms / distinct users so far"
on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fenced import fenced_fold_stream


def stream_cms_collection(
    spark: SparkSession,
    terms_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    term_col: str = "term",
    d: int = 4,
    w: int = 1024,
):
    """Fold a term stream into a persisted Count-Min table at
    ``root/name``: cells (j, bucket, count) merge by +. Returns the
    StreamingQuery (caller awaits)."""
    from ..operators.sketches import cms_counts

    def fold(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        fresh = cms_counts(batch, term_col, d=d, w=w)
        if current is None:
            return fresh
        return (
            current.unionByName(fresh)
            .groupBy("j", "bucket")
            .agg(F.sum("count").cast("bigint").alias("count"))
        )

    return fenced_fold_stream(
        spark, terms_stream, root, name, checkpoint_dir, fold
    )


def stream_fm_collection(
    spark: SparkSession,
    rows_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    n_buckets: int = 16,
):
    """Fold a value stream into persisted per-group FM bucket maxima at
    ``root/name``: state rows (group, bucket, r_bucket) merge by max().
    The exact-distinct evaluation column of the batch sketch is
    deliberately NOT carried — exactness is what unbounded streams can't
    afford; the estimate is what the state bound buys. Returns the
    StreamingQuery (caller awaits)."""
    from ..operators.sketches import _h32, _rho

    def bucket_maxima(batch: DataFrame) -> DataFrame:
        h = _h32(F.col(value_col).cast("string"))
        return (
            batch.select(
                F.col(group_col).alias("grp"),
                (h % n_buckets).cast("int").alias("bucket"),
                _rho(F.floor(h / F.lit(n_buckets)).cast("bigint")).alias(
                    "rho"
                ),
            )
            .groupBy("grp", "bucket")
            .agg(F.max("rho").cast("bigint").alias("r_bucket"))
        )

    def fold(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        fresh = bucket_maxima(batch)
        if current is None:
            return fresh
        return (
            current.unionByName(fresh)
            .groupBy("grp", "bucket")
            .agg(F.max("r_bucket").cast("bigint").alias("r_bucket"))
        )

    return fenced_fold_stream(
        spark, rows_stream, root, name, checkpoint_dir, fold
    )


def stream_histogram_collection(
    spark: SparkSession,
    rows_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    value_col: str,
    bin_width: int,
):
    """Fold a numeric stream into a persisted equi-width histogram at
    ``root/name``: bins (bin, c) merge by + — the same additive partial
    state that makes histogram_quantiles_binned one map-side-combined
    aggregation in batch, accumulated across time instead. Quantile
    reads off the streamed table use the identical cumulative-count rule,
    so stream==batch histograms imply stream==batch quantiles
    (test_stream_sketches.py). Returns the StreamingQuery."""

    def fold(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        fresh = (
            batch.select(
                F.floor(F.col(value_col) / bin_width)
                .cast("bigint")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        if current is None:
            return fresh
        return (
            current.unionByName(fresh)
            .groupBy("bin")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )

    return fenced_fold_stream(
        spark, rows_stream, root, name, checkpoint_dir, fold
    )


def stream_hll_collection(
    spark: SparkSession,
    rows_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    b: int = 4,
):
    """Fold a value stream into persisted per-group HyperLogLog registers
    at ``root/name``: state rows (group, register_id, rho_max) merge by
    max() — HLL's defining mergeability, applied across micro-batches
    instead of partitions. Register maxima are replay-idempotent, but the
    fold rides the same fenced harness as the additive sketches (one
    correctness argument). Read the estimate off the persisted table with
    operators/sketches.hll_estimate. Returns the StreamingQuery."""
    from ..operators.sketches import hll_registers

    def fold(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        fresh = hll_registers(batch, group_col, value_col, b=b)
        if current is None:
            return fresh
        return (
            current.unionByName(fresh)
            .groupBy(group_col, "register_id")
            .agg(F.max("rho_max").cast("bigint").alias("rho_max"))
        )

    return fenced_fold_stream(
        spark, rows_stream, root, name, checkpoint_dir, fold
    )


def stream_bloom_collection(
    spark: SparkSession,
    keys_stream: DataFrame,
    root: str,
    name: str,
    checkpoint_dir: str,
    key_col: str,
    n_bits: int = 1024,
    k: int = 3,
):
    """Fold a key stream into a persisted Bloom filter at ``root/name``:
    words (word_id, bits) merge by bit_or — the runtime-filter build
    maintained incrementally, so the dimension-side filter a nightly
    join probes is always current without rescanning the dimension.
    Set-bit merges are replay-idempotent (like HLL's maxima) but ride
    the same fenced harness. Probe the persisted table with
    operators/bloom.bloom_probe. Returns the StreamingQuery."""
    from ..operators.bloom import bloom_build

    def fold(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        fresh = bloom_build(batch, key_col, n_bits=n_bits, k=k)
        if current is None:
            return fresh
        return (
            current.unionByName(fresh)
            .groupBy("word_id")
            .agg(F.bit_or("bits").alias("bits"))
        )

    return fenced_fold_stream(
        spark, keys_stream, root, name, checkpoint_dir, fold
    )
