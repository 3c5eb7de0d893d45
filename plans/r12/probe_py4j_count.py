#!/usr/bin/env python
"""Count py4j round trips per query BUILD (the fn(spark, sf) call).

On this host a py4j round trip costs ~2 ms (OPTIMIZATION_r11.md §12), so
plan-construction chatter is directly convertible to wall seconds:
n_round_trips * 2ms is the build floor the §12 SQL-template recipe can
attack. Counting is exact — unlike timing it is immune to host noise, so
this probe can run any time.

Usage: [COUNT_QUERIES=a,b] python plans/r12/probe_py4j_count.py
(default: every bench HEADLINE query; writes plans/r12/py4j_counts.tsv)

Ad-hoc measurement tool — not part of the round gates; delete-safe.
"""

from __future__ import annotations

import os
import sys

HERE = "/root/repo"
sys.path.insert(0, HERE)

import py4j.clientserver as cs  # noqa: E402
import py4j.java_gateway as jg  # noqa: E402

COUNTER = {"n": 0}

_orig_cs = cs.ClientServerConnection.send_command
_orig_gw = jg.GatewayConnection.send_command


def _patched_cs(self, *a, **k):
    COUNTER["n"] += 1
    return _orig_cs(self, *a, **k)


def _patched_gw(self, *a, **k):
    COUNTER["n"] += 1
    return _orig_gw(self, *a, **k)


cs.ClientServerConnection.send_command = _patched_cs
jg.GatewayConnection.send_command = _patched_gw

from vectorsearch_applications_spark.session import get_spark  # noqa: E402

SF = os.environ.get("COUNT_SF", "/root/testdata/sf0.1")

spark = get_spark(app_name="py4j_count_r12")
spark.sparkContext.setLogLevel("ERROR")

from vectorsearch_applications_spark.queries import get_queries  # noqa: E402

qs = get_queries()

if os.environ.get("COUNT_QUERIES"):
    names = os.environ["COUNT_QUERIES"].split(",")
else:
    sys.path.insert(0, HERE)
    import bench

    names = bench.HEADLINE

rows = []
for name in names:
    # one untimed warmup build so lazily-initialized helpers (first-use
    # imports, parsed-literal memos legal within one process) don't
    # inflate the first query measured
    qs[name](spark, SF)
    COUNTER["n"] = 0
    qs[name](spark, SF)
    rows.append((COUNTER["n"], name))

rows.sort(reverse=True)
out = os.environ.get(
    "COUNT_OUT", os.path.join(HERE, "plans/r12/py4j_counts.tsv")
)
with open(out, "w") as fh:
    fh.write("round_trips\tquery\n")
    for n, name in rows:
        fh.write(f"{n}\t{name}\n")
print(f"wrote {out}")
for n, name in rows[:30]:
    print(f"{n:7d}  {name}")
