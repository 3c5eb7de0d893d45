"""Time scalar helpers (SURVEY.md §2.9 date/time family).

The events table's `ts` column has shipped in three physical encodings
across driver testdata generations: BIGINT nanoseconds (TIMESTAMP(NANOS)
via the legacy nanosAsLong conf), TIMESTAMP (µs, UTC-adjusted), and
TIMESTAMP_NTZ (µs, no zone — Spark's default read of naive parquet
timestamps when inferTimestampNTZ is on). Every helper here dispatches on
the actual dtype and uses exact integer arithmetic that does not depend on
the session timezone, so results hash-match a naive-timestamp engine
(DuckDB epoch()) regardless of how the harness configured its session.
TIMESTAMP_NTZ notably cannot be CAST to DOUBLE (DATATYPE_MISMATCH in
Spark 4), so the old floor(cast(ts as double)) path is gone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS_PER_SECOND = 1_000_000_000
US_PER_SECOND = 1_000_000

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_seconds(df: DataFrame, ts_col: str = "ts") -> Column:
    """Whole epoch seconds (BIGINT) from a timestamp / timestamp_ntz /
    BIGINT-nanoseconds column — exact integer arithmetic in every case.

    Floor semantics: microsecond diff with a pmod-normalised remainder, so
    pre-epoch values floor instead of truncating toward zero.
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return F.expr(f"{ts_col} DIV {NS_PER_SECOND}")
    if dtype == "timestamp_ntz":
        # Session-timezone-independent: diff two NTZ wall clocks in µs,
        # then exact floor-divide to seconds.
        us = F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {ts_col})")
        return ((us - F.pmod(us, F.lit(US_PER_SECOND))) / US_PER_SECOND).cast(
            "bigint"
        )
    # TIMESTAMP (µs, instant-based): unix_micros is exact; same floor-divide.
    us = F.unix_micros(F.col(ts_col))
    return ((us - F.pmod(us, F.lit(US_PER_SECOND))) / US_PER_SECOND).cast("bigint")


def epoch_micros(df: DataFrame, ts_col: str = "ts") -> Column:
    """Whole epoch microseconds (BIGINT) — the exact-resolution sibling of
    :func:`epoch_seconds` for orderings that must distinguish sub-second
    event times (SCD2 validity intervals, run boundaries). Same dtype
    dispatch; nanosecond sources floor-divide (driver testdata timestamps
    are µs-aligned so this is lossless there)."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return F.expr(f"{ts_col} DIV 1000")
    if dtype == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {ts_col})")
    return F.unix_micros(F.col(ts_col))


def to_timestamp_col(df: DataFrame, ts_col: str = "ts") -> Column:
    """A watermark-capable event-time column from any representation.

    withWatermark requires TIMESTAMP proper (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    TYPE on TIMESTAMP_NTZ in Spark 4), so NTZ is cast — the NTZ→TIMESTAMP
    cast anchors the wall clock in the session timezone, which session.py
    pins to UTC, making the mapping deterministic. Watermark/window
    semantics are offset-invariant anyway (all events shift together).
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
    if dtype == "timestamp_ntz":
        return F.col(ts_col).cast("timestamp")
    return F.col(ts_col)
