"""Skew mitigation + co-location utilities (SCALE.md posture).

- ``salted_aggregate``: two-phase aggregation for skewed group keys — salt
  the key, partial-aggregate per (key, salt), then final-aggregate per key.
  The hot key's rows spread over ``n_salts`` reducers instead of one.
  Correct for decomposable aggregates (sum/count/min/max).

- ``bucket_table`` / bucketed joins: persist both sides bucketed by the
  join key so repeated joins are Exchange-free (verified by plan in
  tests/test_scale_plans.py). At 100 TB this is the difference between
  re-shuffling a fact table per query and never shuffling it.

AQE's skew-join splitting covers the join case at runtime; salting is for
aggregations and for deterministic layouts AQE can't rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {out_name: (agg_fn, col)} with agg_fn in {sum, count, min, max}.
    count is re-summed in the final phase; the rest re-apply themselves.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial_aggs = []
    final_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_aggs.append(F.count(col).alias(f"_p_{out}"))
            final_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn in ("sum", "min", "max"):
            partial_aggs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
            final_aggs.append(getattr(F, fn)(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*group_cols).agg(*final_aggs)


def bucket_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (requires a warehouse dir /
    catalog). Joins between tables bucketed identically on the join key
    skip the shuffle."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)
