"""Time scalar helpers (SURVEY.md §2.9 date/time family).

The driver's events table stores TIMESTAMP(NANOS); Spark reads it (via the
legacy nanosAsLong conf set in sources/io.py) as BIGINT nanoseconds. All
bucketing uses exact integer DIV arithmetic so results hash-match engines
that keep full nanosecond precision (DuckDB epoch_ns // …) — double
conversion of an int64 nanosecond count would round (>2^53).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS_PER_SECOND = 1_000_000_000


def epoch_seconds(df: DataFrame, ts_col: str = "ts") -> Column:
    """Whole epoch seconds (BIGINT) from either a timestamp column or a
    BIGINT-nanoseconds column — exact integer arithmetic in both cases."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return F.expr(f"{ts_col} DIV {NS_PER_SECOND}")
    return F.floor(F.col(ts_col).cast("double")).cast("bigint")


def to_timestamp_col(df: DataFrame, ts_col: str = "ts") -> Column:
    """TimestampType from either representation (ns → µs truncation) — for
    Structured Streaming operators that need a real timestamp (watermarks)."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
    return F.col(ts_col)
