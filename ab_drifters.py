#!/usr/bin/env python
"""Same-session A/B of the three r7→r8 driver-bench drifters
(bpe_encode_corpus +29%, ann_ivfpq_refined +35%, supplier_scorecard
+24%) at r8/r9 HEAD vs 8e4a625 (r7 close). One process, one JVM: the
two package versions are swapped via sys.modules between sweeps so
JIT/page-cache state is shared, and sweeps interleave NEW/OLD to keep
transient load from poisoning one side. Ad-hoc tool — not part of the
round gates; delete-safe."""

from __future__ import annotations

import importlib
import os
import statistics
import subprocess
import sys
import time

HERE = "/root/repo"
OLD = "/root/repo/.ab_old"
OLD_REF = "8e4a625"  # r7 close — the pre-drift baseline

# reproducibility: materialize the baseline worktree, and verify a
# pre-existing one is actually pinned at OLD_REF (a stale worktree from
# an earlier session would silently mislabel the whole comparison)
if not os.path.isdir(OLD):
    subprocess.run(
        ["git", "-C", HERE, "worktree", "add", OLD, OLD_REF], check=True
    )
_at = subprocess.run(
    ["git", "-C", OLD, "rev-parse", "HEAD"], capture_output=True, text=True,
    check=True,
).stdout.strip()
_want = subprocess.run(
    ["git", "-C", HERE, "rev-parse", OLD_REF], capture_output=True, text=True,
    check=True,
).stdout.strip()
if _at != _want:
    sys.exit(
        f"{OLD} is checked out at {_at[:12]}, not {OLD_REF} — remove the "
        "stale worktree (git worktree remove --force) and re-run"
    )
NAMES = ["bpe_encode_corpus", "ann_ivfpq_refined", "supplier_scorecard"]
SF = "/root/testdata/sf0.1"
N_SWEEPS = 5

sys.path.insert(0, HERE)
from vectorsearch_applications_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab_drifters")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def load_queries(root: str):
    for m in [k for k in sys.modules if k.startswith("vectorsearch_applications_spark")]:
        del sys.modules[m]
    sys.path.remove(HERE) if HERE in sys.path else None
    if OLD in sys.path:
        sys.path.remove(OLD)
    sys.path.insert(0, root)
    q = importlib.import_module("vectorsearch_applications_spark.queries")
    return q.get_queries()


def sweep(queries, out: dict[str, list[float]]):
    for name in NAMES:
        t0 = time.perf_counter()
        queries[name](spark, SF).write.format("noop").mode("overwrite").save()
        out.setdefault(name, []).append(time.perf_counter() - t0)


# warmup both versions (codegen compile)
for root in (HERE, OLD):
    qs = load_queries(root)
    for name in NAMES:
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()

new_t: dict[str, list[float]] = {}
old_t: dict[str, list[float]] = {}
for i in range(N_SWEEPS):
    sweep(load_queries(HERE), new_t)
    sweep(load_queries(OLD), old_t)

for name in NAMES:
    n = statistics.median(new_t[name])
    o = statistics.median(old_t[name])
    print(
        f"{name}: HEAD {n:.3f}s vs 8e4a625 {o:.3f}s "
        f"({(n / o - 1) * 100:+.1f}%)  "
        f"new={['%.2f' % t for t in new_t[name]]} "
        f"old={['%.2f' % t for t in old_t[name]]}"
    )
