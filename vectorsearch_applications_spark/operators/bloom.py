"""Bloom-filter semi-join pruning — ship a few KB instead of shuffling a
100 TB fact table.

The classic distributed-join optimization (Bloom, CACM '70; runtime
filter pushdown in every modern engine, incl. Spark's own AQE
InjectRuntimeFilter): build a bit set over the small side's join keys,
broadcast it, and discard fact rows whose key cannot be in the dimension
BEFORE the join shuffle. False positives only (a stray row survives to
the real join and drops there); never false negatives — so the join
result is unchanged while the shuffle shrinks by the selectivity of the
dimension.

This implementation is DETERMINISTIC and engine-portable (the repo's
md5-prefix hash; k probe positions per key; 32-bit words aggregated with
bit_or), so the filter itself — which keys it admits, exactly — is
hash-gradable against a SQL oracle, unlike engine-internal bloom filters
whose hash seeds are private.

State: ``n_bits/32`` BIGINT words, mergeable across shards by bit_or —
the same mergeable-sketch shape as CMS/FM/HLL (operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import _h32

_WORD = 32


def _positions(key: Column, n_bits: int, k: int) -> Column:
    """array<bigint> of the k probe bit-positions for a key."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: _h32(F.concat(i.cast("string"), F.lit("#"), key)) % n_bits,
    )


def bloom_build(
    keys: DataFrame, key_col: str, n_bits: int = 1024, k: int = 3
) -> DataFrame:
    """(word_id, bits): the filter as 32-bit words ORed per word — one
    explode (k rows per key) + one map-side-combinable aggregation.
    Sparse: words no key touched are absent (probes treat them as 0)."""
    pos = F.explode(
        _positions(F.col(key_col).cast("string"), n_bits, k)
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / _WORD).cast("bigint").alias("word_id"),
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {_WORD} AS INT)) AS BIGINT)"
            ).alias("bit"),
        )
        .groupBy("word_id")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 1024,
    k: int = 3,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append ``out_col`` (BIGINT 0/1): 1 iff ALL k probe bits are set.
    The word table collapses to ONE broadcast map row (n_bits/32 entries
    — a few KB, the whole point) cross-joined onto the fact, and the
    k-position test is a per-row ``forall`` expression: the fact NEVER
    shuffles and never even explodes — membership is decided inside the
    scan's codegen stage, exactly where a runtime filter belongs. The
    bit test is shift-free arithmetic ((word // 2^b) % 2 — 2^b exact for
    b<32) so it stays expressible inside the lambda in any engine."""
    wordmap = bloom.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word_id", "bits")))
        ).alias("_bloom")
    )
    key = F.col(key_col).cast("string")
    member = F.forall(
        _positions(key, n_bits, k),
        lambda p: (
            F.floor(
                F.coalesce(
                    F.element_at("_bloom", (p / _WORD).cast("bigint")),
                    F.lit(0),
                )
                / F.floor(F.pow(F.lit(2.0), (p % _WORD).cast("int"))).cast(
                    "bigint"
                )
            ).cast("bigint")
            % 2
            == 1
        ),
    )
    return (
        fact.crossJoin(F.broadcast(wordmap))
        .withColumn(out_col, member.cast("bigint"))
        .drop("_bloom")
    )
