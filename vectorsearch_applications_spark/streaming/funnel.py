"""Streaming ordered-funnel tracking — the Structured Streaming twin of
operators/funnel.py, as an applyInPandasWithState state machine.

Per user, the state carries the same two quantities the batch window
algebra computes with running maxes — the latest chain start that has
reached each stage — plus the stage-completion flags:

    state = (best_1, best_2, done_1, done_2, done_3)

best_1 = latest first-step (view) second seen; best_2 = latest chain start
carried through a second-step (click) event. Events inside one micro-batch
are processed second-by-second against a SNAPSHOT of the state taken
before that second, which reproduces the batch operator's strictly-before
RANGE-frame semantics exactly: a click never chains off a view in its own
second, in either engine. Cross-batch ordering relies on in-order source
delivery (file-ordered micro-batches), the same contract as the other
stream==batch twins in this package.

State is O(1) per user — two longs and three flags — so a billion-user
funnel holds state linear in users, never in events. Output mode: update
(one row per user per batch with current flags).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def stream_funnel(
    spark: SparkSession,
    events_path: str,
    schema,
    steps: Sequence[str] = ("view", "click", "purchase"),
    window_seconds: int = 86400,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming funnel over parquet files of (user_id, event_type, es).

    Exactly three steps (the state tuple is fixed-width); ``es`` must be
    integer epoch seconds. Returns an update-mode stream of
    (user_id, done_1, done_2, done_3).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    if len(steps) != 3:
        raise ValueError("stream_funnel tracks exactly 3 steps")
    s1_name, s2_name, s3_name = steps

    output_schema = "user_id long, done_1 int, done_2 int, done_3 int"
    state_schema = "best1 long, best2 long, d1 int, d2 int, d3 int"

    def update(key, pdfs, state: GroupState):
        best1, best2, d1, d2, d3 = (
            state.get if state.exists else (None, None, 0, 0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("es", kind="stable")
        for sec, rows in batch.groupby("es", sort=True):
            types = set(rows["event_type"])
            snap1, snap2 = best1, best2  # state strictly before this second
            if s1_name in types:
                d1 = 1
            if s2_name in types and snap1 is not None:
                d2 = 1
            if (
                s3_name in types
                and snap2 is not None
                and sec - snap2 <= window_seconds
            ):
                d3 = 1
            if s1_name in types:
                best1 = sec if best1 is None else max(best1, int(sec))
            if s2_name in types and snap1 is not None:
                best2 = snap1 if best2 is None else max(best2, snap1)
        state.update((best1, best2, d1, d2, d3))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "done_1": [d1],
                "done_2": [d2],
                "done_3": [d3],
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
