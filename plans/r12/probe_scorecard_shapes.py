#!/usr/bin/env python
"""VERDICT r11 item 8: A/B the supplier_scorecard Expand (two exact
countDistincts in one aggregate => 3x row multiplication before ONE
shuffle) against the split-aggregate rewrite (three shuffles of the fact
table, no Expand). Results asserted identical; interleaved sweeps.
Ad-hoc measurement tool — delete-safe."""

from __future__ import annotations

import os
import statistics
import sys
import time

HERE = "/root/repo"
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_applications_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
N_SWEEPS = int(os.environ.get("PROBE_SWEEPS", "8"))

spark = get_spark(app_name="scorecard_shapes_r12")
spark.sparkContext.setLogLevel("ERROR")

s = spark.read.parquet(os.path.join(SF, "supplier.parquet"))
li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
    F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
)
OUT = ["s_suppkey", "s_name", "n_lineitems", "n_orders", "n_parts",
       "revenue", "n_returned"]


def shape_expand():
    agg = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.sum(rev).cast("double").alias("revenue"),
        F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias(
            "n_returned"
        ),
    )
    return s.join(agg, agg["l_suppkey"] == s["s_suppkey"]).select(*OUT)


def shape_split():
    base = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.sum(rev).cast("double").alias("revenue"),
        F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias(
            "n_returned"
        ),
    )
    ords = (
        li.select("l_suppkey", "l_orderkey").distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    parts = (
        li.select("l_suppkey", "l_partkey").distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    agg = base.join(ords, "l_suppkey").join(parts, "l_suppkey")
    return s.join(agg, agg["l_suppkey"] == s["s_suppkey"]).select(*OUT)


a = sorted(map(repr, shape_expand().collect()))
b = sorted(map(repr, shape_split().collect()))
assert a == b, f"shapes disagree: {len(a)} vs {len(b)} rows"
print(f"results identical ({len(a)} rows)")

t_e: list[float] = []
t_s: list[float] = []
for i in range(N_SWEEPS):
    order = [(shape_expand, t_e), (shape_split, t_s)]
    if i % 2:
        order.reverse()
    for fn, acc in order:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        acc.append(time.perf_counter() - t0)

me, ms = statistics.median(t_e), statistics.median(t_s)
print(
    f"expand {me:.3f}s vs split {ms:.3f}s ({100 * (ms - me) / me:+.1f}% split-vs-expand)  "
    f"expand_all={[round(x, 3) for x in t_e]} split_all={[round(x, 3) for x in t_s]}"
)
