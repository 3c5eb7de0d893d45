"""Unit tests for operators/timeseries.py resample_ffill (driver parity is
covered by test_oracle_parity on events_gap_fill)."""

from __future__ import annotations

from datetime import datetime

from vectorsearch_applications_spark.operators.timeseries import resample_ffill


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_gap_fill_carries_last_value_and_flags_gaps(spark):
    t = lambda s: datetime(2024, 1, 1, s // 3600, (s % 3600) // 60, s % 60)  # noqa: E731
    d = _events(
        spark,
        [
            (1, t(0), 7, 10.0),  # bucket 0 (two events: last wins)
            (2, t(30), 7, 11.0),  # bucket 0, later -> observed value
            (3, t(3 * 3600), 7, 99.0),  # bucket 3; buckets 1-2 are gaps
        ],
    )
    rows = resample_ffill(d, bucket_seconds=3600).collect()
    base = min(r["bucket"] for r in rows)  # absolute epoch-hour ids
    out = {r["bucket"] - base: r for r in rows}
    assert sorted(out) == [0, 1, 2, 3]  # full grid, no holes
    assert out[0]["n_events"] == 2 and out[0]["filled_value"] == 11.0
    assert out[1]["is_gap"] == 1 and out[1]["filled_value"] == 11.0
    assert out[2]["is_gap"] == 1 and out[2]["filled_value"] == 11.0
    assert out[3]["is_gap"] == 0 and out[3]["filled_value"] == 99.0


def test_gap_fill_last_within_bucket_breaks_ties_on_event_id(spark):
    ts = datetime(2024, 1, 1, 0, 0, 5)
    d = _events(spark, [(1, ts, 7, 1.0), (2, ts, 7, 2.0)])
    (row,) = resample_ffill(d, bucket_seconds=60).collect()
    assert row["filled_value"] == 2.0  # higher event_id wins at equal es


def test_gap_fill_grid_is_per_key(spark):
    t0, t5 = datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 5, 0, 0)
    d = _events(spark, [(1, t0, 1, 1.0), (2, t5, 1, 2.0), (3, t0, 2, 3.0)])
    out = resample_ffill(d, bucket_seconds=3600).collect()
    assert len([r for r in out if r["key"] == 1]) == 6  # hours 0..5
    assert len([r for r in out if r["key"] == 2]) == 1  # single bucket
