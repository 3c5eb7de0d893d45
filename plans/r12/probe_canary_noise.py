#!/usr/bin/env python
"""VERDICT r11 item 1 'Done' criterion: demonstrate that the new
scheduler-latency canary flags injected noise the CPU canary misses.

Times both bench canaries (the exact jobs bench.py runs) clean, then
under N_HOGS nice'd busy-loop processes (a fraction of the 32 cores —
the fleet-noise analog: long parallel compute barely degrades, but
every short task and driver round trip contends), then clean again.
Prints the ratios vs the clean floor next to the bench thresholds.

Ad-hoc measurement tool — not part of the round gates; delete-safe.
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time

HERE = "/root/repo"
sys.path.insert(0, HERE)

from vectorsearch_applications_spark.session import get_spark  # noqa: E402

sys.path.insert(0, HERE)
import bench  # noqa: E402  — the canaries under test, unmodified

N_HOGS = int(os.environ.get("PROBE_HOGS", "12"))
REPS = int(os.environ.get("PROBE_REPS", "5"))

spark = get_spark(app_name="canary_noise_r12")
spark.sparkContext.setLogLevel("ERROR")

# warmup (JIT) exactly like bench.py
bench._canary(spark)
bench._sched_canary(spark)


def sample(label: str) -> tuple[float, float]:
    cpu = statistics.median(bench._canary(spark) for _ in range(REPS))
    sched = statistics.median(bench._sched_canary(spark) for _ in range(REPS))
    print(f"{label:14s} cpu={cpu:.3f}s sched={sched:.3f}s")
    return cpu, sched


cpu_clean, sched_clean = sample("clean (before)")

hogs = [
    subprocess.Popen(
        ["nice", "-n", "10", "python3", "-c",
         "import time\nwhile True:\n  t=time.perf_counter()\n  x=0\n  "
         "while time.perf_counter()-t < 0.004: x+=1\n  time.sleep(0.001)"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    for _ in range(N_HOGS)
]
print(f"injected {N_HOGS} duty-cycle hog processes (pids "
      f"{[h.pid for h in hogs][:4]}...)")
time.sleep(1.0)
try:
    cpu_noisy, sched_noisy = sample("noisy")
finally:
    for h in hogs:
        h.kill()
    for h in hogs:
        h.wait()
time.sleep(1.0)
cpu_after, sched_after = sample("clean (after)")

floor_cpu = min(cpu_clean, cpu_after)
floor_sched = min(sched_clean, sched_after)
print(
    f"ratios vs clean floor: cpu {cpu_noisy / floor_cpu:.2f}x "
    f"(threshold {bench.CANARY_THRESHOLD}), "
    f"sched {sched_noisy / floor_sched:.2f}x "
    f"(threshold {bench.SCHED_CANARY_THRESHOLD})"
)
print(
    "cpu_flags:", cpu_noisy > floor_cpu * bench.CANARY_THRESHOLD,
    " sched_flags:", sched_noisy > floor_sched * bench.SCHED_CANARY_THRESHOLD,
)
