#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query and summarize
plan shape (Exchange count, join strategies, Python-eval nodes, scans).

Usage: python plans/r11/dump_plans.py <out_dir> [sf_dir] [--only a,b,c]

Writes <out_dir>/<query>.txt plus <out_dir>/_summary.tsv. Uses the bench
session (session.get_spark) so plans match what the bench executes.
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    out_dir = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)

    from vectorsearch_applications_spark.queries import get_queries
    from vectorsearch_applications_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rows = []
    for name, fn in sorted(get_queries().items()):
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            txt = f"ERROR {type(ex).__name__}: {ex}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        stats = {
            "exchanges": len(re.findall(r"\bExchange\b", txt)),
            "smj": len(re.findall(r"\bSortMergeJoin\b", txt)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", txt)),
            "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
            "cartesian": len(re.findall(r"\bCartesianProduct\b", txt)),
            "pyeval": len(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas"
                    r"|MapInArrow|FlatMapGroupsInPandas)\b",
                    txt,
                )
            ),
            "scans": len(re.findall(r"Scan parquet", txt)),
            "sorts": len(re.findall(r"\bSort\b", txt)),
            "windows": len(re.findall(r"\bWindow\b", txt)),
        }
        rows.append((name, stats))
    with open(os.path.join(out_dir, "_summary.tsv"), "w") as fh:
        cols = [
            "exchanges", "smj", "bhj", "shj", "bnlj", "cartesian",
            "pyeval", "scans", "sorts", "windows",
        ]
        fh.write("query\t" + "\t".join(cols) + "\n")
        for name, st in rows:
            fh.write(name + "\t" + "\t".join(str(st[c]) for c in cols) + "\n")
    print(f"dumped {len(rows)} plans to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
