"""Streaming running concurrency — the stateful twin of the batch
sweep-line peak (operators/timeseries.py peak_concurrency, graded as
events_peak_concurrency).

Per key, the state is the list of ACTIVE interval end instants plus the
running (peak, first-instant-of-peak). Each incoming event opens an
end-exclusive interval [es, es + duration); expired ends (end ≤ es) are
pruned against the incoming event's clock, the new interval is admitted,
and the event emits the concurrency at its start instant. Because ends
never raise concurrency, the running maximum over emitted values equals
the batch sweep-line peak, and the first instant a new maximum appears
equals the batch ``min t at peak`` — stream==batch is proven in
test_stream_concurrency.py against peak_concurrency on the same rows.

State bound: O(max simultaneous intervals per key) — exactly the quantity
being measured, so a key's state is as small as its answer. In-order
micro-batch delivery (file-ordered source, sorted within batch) is the
same contract as the other stream==batch twins here (burst, dwell,
funnel).

Implementation note: ``applyInPandasWithState`` rather than Spark 4's
``transformWithStateInPandas`` (whose Python worker imports
google.protobuf, absent in this container); the swap is mechanical.

Why this operator at scale: live concurrency IS the capacity/admission
signal (concurrent sessions, streams, device connections); recomputing a
growing interval log per decision is a non-starter, while the streaming
form holds only the active set per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_running_concurrency(
    spark: SparkSession,
    events_path: str,
    schema,
    key_col: str = "event_type",
    duration_seconds: int = 300,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Append-mode stream of (key, es, concurrent) over parquet files of
    (``key_col``, event_id, es): ``concurrent`` = intervals
    [s, s + duration) active at this event's start instant, the incoming
    event included."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    output_schema = f"{key_col} string, es long, concurrent long"
    state_schema = "active array<long>"

    def update(key, pdfs, state: GroupState):
        active = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["es", "event_id"], kind="stable")
        out_es, out_n = [], []
        for es in batch["es"]:
            es = int(es)
            # end-exclusive: an interval ending exactly at es is gone
            active = [e for e in active if e > es]
            active.append(es + duration_seconds)
            out_es.append(es)
            out_n.append(len(active))
        state.update((active,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_es),
                "es": out_es,
                "concurrent": out_n,
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(events_path)
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
