#!/usr/bin/env python
"""Decompose per-query wall time: Python/py4j plan construction (the
fn(spark, sf) call), JVM analysis+optimization (explain compile), and
execution (noop sink). Ad-hoc measurement tool for the r11 round —
delete-safe, not part of the round gates.

Usage: PROBE_QUERIES=a,b[,c] [PROBE_SWEEPS=3] python plans/r11/probe_decompose.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

HERE = "/root/repo"
sys.path.insert(0, HERE)

from vectorsearch_applications_spark.session import get_spark  # noqa: E402

NAMES = os.environ["PROBE_QUERIES"].split(",")
SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_SWEEPS", "3"))

spark = get_spark(app_name="probe_r11")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

from vectorsearch_applications_spark.queries import get_queries  # noqa: E402

qs = get_queries()

print(f"{'query':42s} {'build':>7s} {'compile':>8s} {'exec':>7s} {'total':>7s}")
for name in NAMES:
    fn = qs[name]
    builds, compiles, execs = [], [], []
    for _ in range(N):
        t0 = time.perf_counter()
        df = fn(spark, SF)
        t1 = time.perf_counter()
        # force analysis + optimization + physical planning without execution
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        builds.append(t1 - t0)
        compiles.append(t2 - t1)
        execs.append(t3 - t2)
    b, c, e = (statistics.median(x) for x in (builds, compiles, execs))
    print(f"{name:42s} {b:7.3f} {c:8.3f} {e:7.3f} {b + c + e:7.3f}")
