#!/usr/bin/env python
"""VERDICT r11 item 5: prove the bucketed BM25 postings layout actually
prunes. Builds a persisted index over an 8x-replicated sf0.1 corpus —
large enough that bm25_save_index AUTO-chooses n_buckets > 1 — plus a
forced single-bucket twin of the same corpus, then:

1. dumps the indexed-search plan against the multi-bucket layout and
   asserts the postings scan carries a PartitionFilters bucket-IN entry
   (plans/r12/bm25_bucket_prune_auto.txt);
2. interleaved A/B of search wall (multi-bucket pruned vs single-bucket
   full-scan layout), results asserted identical.

Ad-hoc measurement tool — not part of the round gates; delete-safe.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

HERE = "/root/repo"
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_applications_spark.operators.bm25 import (  # noqa: E402
    bm25_save_index,
    bm25_search_indexed,
)
from vectorsearch_applications_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
ROOT = "/tmp/r12_bm25_prune"
N_SWEEPS = int(os.environ.get("PROBE_SWEEPS", "8"))

spark = get_spark(app_name="bm25_prune_r12")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
# sf0.1 is ~271k tokens; REPL=256 gives ~69M => auto n_buckets ~9
# (ceil(mass / 8M)) -- a real multi-directory fan-out, not a 2-way split
REPL = int(os.environ.get("PROBE_REPL", "256"))
big = docs.crossJoin(
    F.broadcast(spark.range(REPL).select(F.col("id").alias("_r")))
).select(
    (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
    "text",
)

os.makedirs(ROOT, exist_ok=True)
base_auto = os.path.join(ROOT, "auto__bm25")
base_one = os.path.join(ROOT, "one__bm25")
if not os.path.isdir(base_auto):
    t0 = time.perf_counter()
    base_auto = bm25_save_index(big, ROOT, "auto")  # auto bucket count
    t1 = time.perf_counter()
    base_one = bm25_save_index(big, ROOT, "one", n_buckets=1)
    t2 = time.perf_counter()
    print(f"builds: auto {t1 - t0:.1f}s, single-bucket {t2 - t1:.1f}s")

meta_auto = spark.read.parquet(os.path.join(base_auto, "meta")).head()
print(f"auto layout: n_buckets={meta_auto['n_buckets']}")
assert meta_auto["n_buckets"] > 1, "corpus too small for the auto fan-out"

queries = docs.filter(F.col("doc_id") < 5).select(
    F.col("doc_id").alias("query_id"),
    F.concat_ws(" ", F.slice(F.split(F.lower("text"), "[^a-zA-Z0-9_]+"), 1, 2)).alias("query"),
)

# 1. plan dump: PartitionFilters on the postings scan
plan_df = bm25_search_indexed(spark, ROOT, "auto", queries, limit=10)
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
txt = plan_df._jdf.queryExecution().explainString(mode)
out = os.path.join(HERE, "plans/r12/bm25_bucket_prune_auto.txt")
with open(out, "w") as fh:
    fh.write(txt)
part_lines = [ln.strip() for ln in txt.splitlines() if "PartitionFilters" in ln]
print(f"wrote {out}")
for ln in part_lines:
    print("  ", ln[:160])
assert any(
    "bucket" in ln and ("IN" in ln or "in(" in ln.lower()) for ln in part_lines
), "no bucket PartitionFilter found in the indexed-search plan"

# 2. interleaved A/B: pruned multi-bucket vs single-bucket full scan.
# Ranked rows must be identical (rank orders on round(score,4) + doc_id
# tie-break); the RAW double score legitimately differs in last-ulp
# across layouts (different partial-sum merge order), so compare keys
# exactly and scores to 1e-9.
ra = sorted(
    plan_df.collect(), key=lambda r: (r["query_id"], r["rank"])
)
ro = sorted(
    bm25_search_indexed(spark, ROOT, "one", queries, limit=10).collect(),
    key=lambda r: (r["query_id"], r["rank"]),
)
assert [(r["query_id"], r["doc_id"], r["rank"]) for r in ra] == [
    (r["query_id"], r["doc_id"], r["rank"]) for r in ro
], "ranked rows differ!"
assert all(abs(x["score"] - y["score"]) < 1e-9 for x, y in zip(ra, ro))
print(f"ranked rows identical ({len(ra)} rows; scores equal to <1e-9)")

t_auto: list[float] = []
t_one: list[float] = []
for i in range(N_SWEEPS):
    order = [("auto", t_auto), ("one", t_one)]
    if i % 2:
        order.reverse()
    for name, acc in order:
        s = time.perf_counter()
        bm25_search_indexed(spark, ROOT, name, queries, limit=10).write.format(
            "noop"
        ).mode("overwrite").save()
        acc.append(time.perf_counter() - s)

ma, mo = statistics.median(t_auto), statistics.median(t_one)
print(
    f"search wall: multi-bucket {ma:.3f}s vs single-bucket {mo:.3f}s "
    f"({100 * (ma - mo) / mo:+.1f}%)  "
    f"auto_all={[round(x, 3) for x in t_auto]} "
    f"one_all={[round(x, 3) for x in t_one]}"
)
