#!/usr/bin/env python
"""Pagerank decomposition + broadcast-hint probe (ad-hoc, delete-safe).

Phase A: time the graded query as the bench does (fn + noop), N sweeps.
Phase B: same edges, but each iteration hints broadcast(ranks) into the
         contribution join and broadcast(contribs) into the rank update,
         so the e_deg side never shuffles at all (AQE's runtime SMJ->BHJ
         conversion still pays the big side's shuffle WRITE; the hint
         does not). Results asserted identical.
Phase C: eager-materialization decomposition of the baseline: time the
         e / nodes / e_deg checkpoints separately, then the 3-iteration
         exec, to see where the wall goes.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_applications_spark.session import get_spark  # noqa: E402
from vectorsearch_applications_spark.sources.io import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 6

spark = get_spark(app_name="probe_pagerank")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def edges_df():
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
    )


def baseline():
    from vectorsearch_applications_spark.operators.graph import pagerank_int

    return pagerank_int(edges_df(), iterations=3)


def hinted():
    e = edges_df().select("src", "dst").distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    e_deg = e.join(outd, "src").localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank"))
    for _ in range(3):
        contribs = (
            F.broadcast(ranks)
            .join(e_deg, ranks["node"] == e_deg["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV odeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("incoming"))
        )
        ranks = nodes.join(F.broadcast(contribs), "node", "left").select(
            "node",
            (F.lit(150_000) + F.expr("(850 * coalesce(incoming, 0)) DIV 1000"))
            .cast("long")
            .alias("rank"),
        )
    return ranks.select("node", F.col("rank").cast("bigint").alias("rank"))


# equality first (+ codegen warmup)
rows_a = sorted(map(repr, baseline().collect()))
rows_b = sorted(map(repr, hinted().collect()))
assert rows_a == rows_b, "hinted variant changed results"
print(f"equality ok: {len(rows_a)} rows")

ts: dict[str, list[float]] = {"baseline": [], "hinted": []}
for _ in range(N):
    for tag, fn in (("baseline", baseline), ("hinted", hinted)):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts[tag].append(time.perf_counter() - t0)
for tag, xs in ts.items():
    print(
        f"{tag}: median {statistics.median(xs):.3f}s "
        f"runs {[round(x, 3) for x in xs]}"
    )

# Phase C: decomposition of the baseline shape with EAGER checkpoints
print("\ndecomposition (eager checkpoints, 3 sweeps):")
for _ in range(3):
    t0 = time.perf_counter()
    e = edges_df().select("src", "dst").distinct().localCheckpoint(eager=True)
    t1 = time.perf_counter()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t2 = time.perf_counter()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    e_deg = e.join(outd, "src").localCheckpoint(eager=True)
    t3 = time.perf_counter()
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank"))
    for _i in range(3):
        contribs = (
            ranks.join(e_deg, ranks["node"] == e_deg["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV odeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("incoming"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(150_000) + F.expr("(850 * coalesce(incoming, 0)) DIV 1000"))
            .cast("long")
            .alias("rank"),
        )
    ranks.select("node", "rank").write.format("noop").mode("overwrite").save()
    t4 = time.perf_counter()
    print(
        f"  e={t1-t0:.3f} nodes={t2-t1:.3f} e_deg={t3-t2:.3f} "
        f"iters+noop={t4-t3:.3f} total={t4-t0:.3f}"
    )
