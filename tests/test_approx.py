"""Approximate aggregates (the 100 TB substitutes for exact distinct/
quantiles) — sanity-bounded against exact results. Not oracle-gated:
HLL/GK sketches differ across engines by design."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.sources.io import load_table

from .conftest import SF_SMOKE


def test_approx_count_distinct_within_tolerance(spark):
    l = load_table(spark, SF_SMOKE, "lineitem")
    exact = l.select(F.countDistinct("l_partkey").alias("n")).collect()[0]["n"]
    approx = l.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) / exact < 0.1


def test_percentile_approx_brackets_exact_median(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    approx = o.select(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("m")
    ).collect()[0]["m"]
    lo, hi = o.approxQuantile("o_totalprice", [0.4, 0.6], 0.01)
    assert lo <= approx <= hi
