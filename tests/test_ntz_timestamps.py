"""Driver-parity guard for TIMESTAMP_NTZ event timestamps.

The driver's harness session reads the naive parquet `ts` column as
TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ.enabled=true, the
Spark 4 recommended setting); our own session factory leaves it off, so
without this test the suite runs every event query only on the TIMESTAMP
read path — exactly how the r3 CAST(ts AS DOUBLE) red rows slipped
through. inferTimestampNTZ is a runtime SQL conf, so we toggle it per-test
on the shared session and restore it afterwards.
"""

from __future__ import annotations

import pytest

from vectorsearch_applications_spark.queries import get_oracles, get_queries

from .conftest import SF_SMOKE
from .oracle_utils import compare

EVENT_QUERIES = [
    "events_range_join",
    "events_asof_last_signup",
    "events_sliding_agg",
    "events_sessionize",
    "events_tumbling_agg",
    "event_scalar_functions",
    # round-4 continuation events queries — same NTZ exposure
    "events_gap_fill",
    "events_dwell_time",
    "events_user_lifecycle",
    "events_user_rolling_stats",
    "events_winsorized_stats",
    "events_value_histogram",
    "events_funnel",
    "events_retention",
    "events_session_campaign_overlap",
    "events_first_touch_attribution",
    "events_decayed_trending",
    "events_hourly_seasonality",
]

_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


@pytest.fixture()
def ntz_spark(spark):
    prev = spark.conf.get(_CONF)
    spark.conf.set(_CONF, "true")
    yield spark
    spark.conf.set(_CONF, prev)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_queries_under_ntz(ntz_spark, name):
    df = ntz_spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz", (
        "conf toggle did not produce an NTZ read — test would be vacuous"
    )
    queries, oracles = get_queries(), get_oracles()
    if name in oracles:
        compare(queries[name](ntz_spark, SF_SMOKE), oracles[name], SF_SMOKE)
    else:
        assert queries[name](ntz_spark, SF_SMOKE).count() >= 0
