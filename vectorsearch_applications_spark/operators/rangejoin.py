"""Interval (range) join — point-in-interval matching at scale.

Spark has no native range-join optimization: a plain theta join
``f.ts >= i.start AND f.ts < i.end`` plans as BroadcastNestedLoopJoin,
O(|facts|·|intervals|) comparisons — fine for 3 intervals, fatal for 10⁵
(calendar windows, incident windows, per-tenant maintenance windows over a
100 TB event log).

``interval_join`` implements the standard bucketed rewrite: quantize time
into fixed-width buckets, explode each interval into the buckets it covers,
then EQUI-join facts on bucket id with the exact range predicate as a
residual filter. The nested loop becomes a hash join probing
O(|facts| + Σ len(interval)/width) rows; with the (small) exploded interval
side broadcast, the fact table never shuffles at all — same posture as the
IVF/code-book joins elsewhere in this package.

All bucket arithmetic is integer DIV (see functions/time.py — double
arithmetic on int64 nanosecond counts rounds above 2^53), and the
``sequence()`` endpoints are ordered start ≤ end by construction (empty
intervals are dropped first), guarding the descending-sequence pitfall.

This operator is a training-data-pipeline extension (SURVEY.md §2 has no
interval-join row); the composition mirrors how the tumbling/session
operators in streaming/events.py bucket the same events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join fact rows to every interval with start ≤ ts < end.

    facts: any frame with an integer time column ``fact_ts`` (epoch
    seconds or nanoseconds — any unit, as long as ``bucket_width`` and the
    interval bounds use the same one).
    intervals: frame with integer ``start_col`` / ``end_col`` columns
    (half-open [start, end)).
    bucket_width: quantization step in the same unit; choose it near the
    typical interval length so each interval explodes into O(1) buckets.
    broadcast_intervals: keep True while the exploded interval side is
    small (the common case); set False to let AQE pick a shuffle join when
    intervals are themselves huge.

    Returns facts ⋈ intervals with all columns of both inputs; a fact row
    appears once per interval containing it.
    """
    exploded = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_bucket",
            F.explode(
                F.expr(
                    f"sequence({start_col} DIV {bucket_width},"
                    f" ({end_col} - 1) DIV {bucket_width})"
                )
            ),
        )
    )
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    return (
        facts.withColumn("_bucket", F.expr(f"{fact_ts} DIV {bucket_width}"))
        .join(exploded, "_bucket")
        .filter(
            (F.col(fact_ts) >= F.col(start_col))
            & (F.col(fact_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair with
    ``l_start < r_end AND r_start < l_end`` (half-open intervals).

    Same bucketed rewrite as ``interval_join`` generalized to two interval
    sides: both explode into covered buckets and equi-join on bucket id
    with the overlap predicate as residual. A pair overlapping across
    several shared buckets would match once per bucket; instead of a
    distinct (an extra full shuffle of the join output), each pair is kept
    only in the FIRST bucket of its overlap —
    ``_bucket == greatest(l_start, r_start) DIV width`` — which is shared
    by construction, making the join output exactly-once with zero
    post-processing. Long intervals explode into len/width bucket rows;
    choose ``bucket_width`` near the typical interval length.
    """
    def _explode(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(F.col(e) > F.col(s)).withColumn(
            "_bucket",
            F.explode(
                F.expr(f"sequence({s} DIV {bucket_width}, ({e} - 1) DIV {bucket_width})")
            ),
        )

    r = _explode(right, r_start, r_end)
    if broadcast_right:
        r = F.broadcast(r)
    return (
        _explode(left, l_start, l_end)
        .join(r, "_bucket")
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (
                F.col("_bucket")
                == F.expr(f"greatest({l_start}, {r_start}) DIV {bucket_width}")
            )
        )
        .drop("_bucket")
    )
