"""Streaming burst detection — the stateful twin of the batch trailing
RANGE-frame count (queries.py events_burst_users).

Per user, the state is the sliding deque of event timestamps inside the
trailing ``window_seconds`` — O(events per window), the exact state bound
the batch window pays per frame — and every incoming event emits its own
trailing count (how many events this user produced in the last 60 s,
inclusive). The batch twin computes the identical number with
``count(*) OVER (PARTITION BY user ORDER BY es RANGE 59 PRECEDING)``;
stream==batch equality is proven in test_stream_burst.py. In-order
micro-batch delivery (file-ordered source, sorted within batch) is the
same contract as the other stream==batch twins here (dwell, funnel).

Implementation note: Spark 4's ``transformWithStateInPandas`` (typed
state handles + TTL) would be the natural API, but its Python driver
worker imports ``google.protobuf``, which is not installed in this
container — so the operator uses ``applyInPandasWithState`` (the stable
arbitrary-state API, identical state bound and output). Migrating is a
mechanical swap of the handler wrapper once protobuf is available.

Why this operator at scale: the burst signal IS the rate-limit / bot
gate, and its value decays in seconds — recomputing a growing events
corpus per decision is a non-starter; the streaming form holds only the
trailing window per active user and prunes it as events age out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_burst_counts(
    spark: SparkSession,
    events_path: str,
    schema,
    window_seconds: int = 60,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Append-mode stream of (user_id, es, burst_count) over parquet files
    of (user_id, event_id, es): burst_count = events by this user in
    [es - window_seconds + 1, es]."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    output_schema = "user_id long, es long, burst_count long"
    state_schema = "recent array<long>"

    def update(key, pdfs, state: GroupState):
        recent = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["es", "event_id"], kind="stable")
        out_es, out_n = [], []
        for es in batch["es"]:
            es = int(es)
            lo = es - (window_seconds - 1)
            recent = [t for t in recent if t >= lo]
            recent.append(es)
            out_es.append(es)
            out_n.append(len(recent))
        state.update((recent,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_es),
                "es": out_es,
                "burst_count": out_n,
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
