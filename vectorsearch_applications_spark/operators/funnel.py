"""Ordered-funnel conversion analysis over an event stream.

Counts, for an ordered step list (e.g. view → click → purchase), how many
users have completed each prefix of the funnel, with the full chain
required to fit in a conversion window anchored at the FIRST step.

The per-user scan is pure window algebra — no self-joins, no explosion:

    best_1(r)  = max es of step-1 events strictly before r
    best_i(r)  = max over step-i events c strictly before r of best_{i-1}(c)
                 (the latest possible chain START that reaches step i by c)

A user completes stage i if any step-i event sees a non-null chain start;
the final stage additionally requires es − start ≤ window. Tracking the
*latest* start is what makes the greedy correct: any chain satisfying the
window constraint is dominated by the one with the maximal start.

Strictly-before is evaluated on integer epoch SECONDS with a RANGE window
frame (rangeBetween(unboundedPreceding, −1)), so same-second events never
count as ordered — deterministic under any tie order, and exactly the
`a.es < b.es` semantics a relational oracle uses. All stages compute in
ONE user-partitioned sort (Spark chains the dependent window expressions
over the same spec without re-shuffling); the only shuffle of the event
table is that partition-by-user exchange, followed by a distinct-user
count per stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    es_col: str = "es",
) -> DataFrame:
    """Per-stage distinct-user completion counts.

    Output: (step, step_name, n_users), step 1-based following ``steps``.
    ``es_col`` must be integer epoch seconds (functions/time.epoch_seconds).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(es_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    df = events.select(user_col, type_col, es_col)

    is_step = [F.col(type_col) == s for s in steps]
    # chain start visible AT a row of stage i (null until reachable)
    start_at = F.when(is_step[0], F.col(es_col))
    df = df.withColumn("_best_1", F.max(start_at).over(w))
    for i in range(1, len(steps)):
        reach = F.when(is_step[i], F.col(f"_best_{i}"))
        df = df.withColumn(f"_best_{i + 1}", F.max(reach).over(w))

    # stage completion flags per row
    flags = []
    for i, s in enumerate(steps, start=1):
        if i == 1:
            done = is_step[0]
        else:
            start = F.col(f"_best_{i - 1}")
            done = is_step[i - 1] & start.isNotNull()
            if i == len(steps):
                done = done & (F.col(es_col) - start <= window_seconds)
        flags.append(
            F.max(F.when(done, F.lit(1)).otherwise(F.lit(0))).alias(f"_s{i}")
        )

    per_user = df.groupBy(user_col).agg(*flags)
    stages = [
        per_user.agg(
            F.lit(i).cast("bigint").alias("step"),
            F.lit(s).alias("step_name"),
            F.sum(f"_s{i}").cast("bigint").alias("n_users"),
        )
        for i, s in enumerate(steps, start=1)
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out
