#!/usr/bin/env python
"""General same-JVM interleaved A/B: working tree (NEW) vs a pinned git
ref (OLD), over a comma-separated query list. One process, one JVM; the
package versions are swapped via sys.modules between sweeps; sweeps
interleave OLD/NEW so transient host load cannot poison one side.
Results are asserted identical (sorted row repr) unless AB_SKIP_EQ=1
(for floating-dust cases — justify in OPTIMIZATION_r11.md).

Usage: AB_REF=<ref> AB_QUERIES=a,b AB_SWEEPS=8 python plans/r11/ab.py
Ad-hoc measurement tool — not part of the round gates; delete-safe.
"""

from __future__ import annotations

import importlib
import os
import statistics
import subprocess
import sys
import time

HERE = "/root/repo"
REF = os.environ["AB_REF"]
OLD = f"/root/repo/.ab_{REF.replace('/', '_')}"
NAMES = os.environ["AB_QUERIES"].split(",")
SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")
N_SWEEPS = int(os.environ.get("AB_SWEEPS", "8"))
SKIP_EQ = os.environ.get("AB_SKIP_EQ") == "1"

if not os.path.isdir(OLD):
    subprocess.run(
        ["git", "-C", HERE, "worktree", "add", "--detach", OLD, REF],
        check=True,
    )
_at = subprocess.run(
    ["git", "-C", OLD, "rev-parse", "HEAD"], capture_output=True, text=True,
    check=True,
).stdout.strip()
_want = subprocess.run(
    ["git", "-C", HERE, "rev-parse", REF + "^{commit}"],
    capture_output=True, text=True, check=True,
).stdout.strip()
if _at != _want:
    sys.exit(f"{OLD} at {_at[:12]} != {REF}; remove the stale worktree")

sys.path.insert(0, HERE)
from vectorsearch_applications_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab_r11")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def load_queries(root: str):
    for m in [
        k for k in sys.modules
        if k.startswith("vectorsearch_applications_spark")
    ]:
        del sys.modules[m]
    for p in (HERE, OLD):
        if p in sys.path:
            sys.path.remove(p)
    sys.path.insert(0, root)
    q = importlib.import_module("vectorsearch_applications_spark.queries")
    return q.get_queries()


def run_one(queries, name: str) -> float:
    t0 = time.perf_counter()
    queries[name](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# result equality first (and codegen warmup as a side effect)
for name in NAMES:
    rows = {}
    for tag, root in (("old", OLD), ("new", HERE)):
        qs = load_queries(root)
        rows[tag] = sorted(map(repr, qs[name](spark, SF).collect()))
    if not SKIP_EQ and rows["old"] != rows["new"]:
        # symmetric difference, not positional zip: a dropped/duplicated
        # row shifts every later position (and zip truncates), which
        # printed an empty/near-useless diff for count mismatches
        only_old = sorted(set(rows["old"]) - set(rows["new"]))[:3]
        only_new = sorted(set(rows["new"]) - set(rows["old"]))[:3]
        sys.exit(
            f"RESULTS DIFFER for {name}: "
            f"{len(rows['old'])} vs {len(rows['new'])} rows; "
            f"only-old={only_old} only-new={only_new}"
        )
    print(f"{name}: results identical ({len(rows['new'])} rows)"
          if not SKIP_EQ else f"{name}: eq-check skipped")

old_t: dict[str, list[float]] = {n: [] for n in NAMES}
new_t: dict[str, list[float]] = {n: [] for n in NAMES}
for i in range(N_SWEEPS):
    order = [("old", OLD, old_t), ("new", HERE, new_t)]
    if i % 2:
        order.reverse()
    for tag, root, acc in order:
        qs = load_queries(root)
        for name in NAMES:
            acc[name].append(run_one(qs, name))

for name in NAMES:
    o = statistics.median(old_t[name])
    n = statistics.median(new_t[name])
    print(
        f"{name}: old {o:.3f} new {n:.3f} ({100 * (n - o) / o:+.1f}%)  "
        f"old_all={[round(x, 3) for x in old_t[name]]} "
        f"new_all={[round(x, 3) for x in new_t[name]]}"
    )
