"""Streaming inter-event dwell time — the stateful twin of the batch
``lag()`` gap computation (queries.py events_dwell_time).

Per user, the state is the last (es, event_id) pair — O(1) — and every
incoming event emits its gap to the previous event. The batch operator
gets the same answer from one window (``es - lag(es)``); the stream gets
it from applyInPandasWithState without ever re-sorting history. In-order
micro-batch delivery (file-ordered source) is the same contract as the
other stream==batch twins here.

Why it matters at scale: dwell-time distributions feed sessionization
thresholds and bot detection; computing them incrementally on the live
stream avoids re-scanning an events corpus that only grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_dwell_times(
    spark: SparkSession,
    events_path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Append-mode stream of (user_id, event_id, gap_seconds) over parquet
    files of (user_id, event_id, es); first event per user emits no row
    (no predecessor), matching the batch lag() semantics."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    output_schema = "user_id long, event_id long, gap_seconds long"
    state_schema = "last_es long, last_eid long"

    def update(key, pdfs, state: GroupState):
        last_es, last_eid = state.get if state.exists else (None, None)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["es", "event_id"], kind="stable")
        out_eid, out_gap = [], []
        for es, eid in zip(batch["es"], batch["event_id"]):
            if last_es is not None:
                out_eid.append(int(eid))
                out_gap.append(int(es) - int(last_es))
            last_es, last_eid = int(es), int(eid)
        state.update((last_es, last_eid))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_eid),
                "event_id": out_eid,
                "gap_seconds": out_gap,
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(events_path)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
