"""Column-statistics profiling — the ANALYZE TABLE pass of the engine.

Every cost-based decision upstream of this repo's plan choices (broadcast
vs shuffle join, skew salting, bucketing keys, runtime filters) starts
from per-column statistics: null fraction, distinct count, min/max. The
reference has no analog (Weaviate manages its own schema); at 100 TB the
stats pass is a first-class pipeline stage run per ingest batch.

Plan: ONE aggregation over one scan computes all columns' stats in
parallel (null counts and min/max are map-side combinable; exact
distinct counts ride the same pass — swap in hll_registers per column
when exactness is unaffordable), then the single stats row unpivots to
per-column rows with ``stack`` — driver never sees data, only the one
aggregate row reshaped inside the plan.

Determinism: min/max are canonicalized to strings only for BIGINT /
string / date inputs (ISO casts agree across engines); float columns
must be pre-bucketed to integers by the caller (the repo-wide
no-raw-floats output rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_null, n_distinct, min_s, max_s) per requested
    column — one scan, one aggregation, one stack."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            # min/max on the NATIVE type (numeric order), stringified
            # after the aggregate — casting first would rank "9999"
            # above "14999"
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_null, n_distinct, min_s, max_s)"
    ).select(
        "column_name",
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_s",
        "max_s",
    )
