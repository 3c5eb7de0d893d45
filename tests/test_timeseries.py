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


# --- scd2_intervals / peak_concurrency (driver parity: scd2_user_state,
# events_peak_concurrency oracles) ---

from vectorsearch_applications_spark.operators.timeseries import (  # noqa: E402
    peak_concurrency,
    scd2_intervals,
)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, state string, us long, event_id long"
    )


def test_scd2_collapses_runs_and_stamps_intervals(spark):
    d = _log(
        spark,
        [
            (1, "a", 100, 1),
            (1, "a", 200, 2),  # same run
            (1, "b", 300, 3),  # new run
            (1, "a", 400, 4),  # back to a -> third run, not merged
        ],
    )
    out = {r["run_seq"]: r for r in scd2_intervals(d).collect()}
    assert [out[i]["state"] for i in (1, 2, 3)] == ["a", "b", "a"]
    assert out[1]["valid_from"] == 100 and out[1]["valid_to"] == 300
    assert out[2]["valid_from"] == 300 and out[2]["valid_to"] == 400
    assert out[3]["valid_to"] is None  # current row stays open
    assert out[1]["n_events"] == 2


def test_scd2_same_instant_ties_break_on_tie_col(spark):
    # two states at the SAME microsecond: event_id orders them, so the
    # run structure is deterministic (b follows a)
    d = _log(spark, [(1, "a", 100, 1), (1, "b", 100, 2)])
    out = sorted(scd2_intervals(d).collect(), key=lambda r: r["run_seq"])
    assert [r["state"] for r in out] == ["a", "b"]
    assert out[0]["valid_to"] == out[1]["valid_from"] == 100


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, t0 long, t1 long")


def test_peak_concurrency_touching_intervals_do_not_overlap(spark):
    # [0,10) and [10,20) touch: end-exclusive semantics -> peak 1
    out = peak_concurrency(
        _iv(spark, [("x", 0, 10), ("x", 10, 20)]), key_col="k"
    ).collect()
    assert out[0]["peak_concurrent"] == 1 and out[0]["peak_at"] == 0


def test_peak_concurrency_overlap_and_first_instant(spark):
    rows = [("x", 0, 10), ("x", 5, 15), ("x", 40, 50), ("y", 0, 5)]
    out = {r["k"]: r for r in peak_concurrency(_iv(spark, rows), key_col="k").collect()}
    assert out["x"]["peak_concurrent"] == 2 and out["x"]["peak_at"] == 5
    assert out["y"]["peak_concurrent"] == 1 and out["y"]["peak_at"] == 0


def test_peak_concurrency_identical_intervals_stack(spark):
    out = peak_concurrency(
        _iv(spark, [("x", 3, 9)] * 4), key_col="k"
    ).collect()
    assert out[0]["peak_concurrent"] == 4 and out[0]["peak_at"] == 3


def test_peak_concurrency_chunked_fallback_equals_default(spark):
    # the giant-key fallback (range-partitioned running sum + prefix
    # fix-up) must be result-identical to the single-window plan on a
    # mixed workload, including a pathological single key carrying every
    # interval (the shape the fallback exists for) and chunk counts that
    # do not divide the time range evenly.
    import random

    rng = random.Random(7)
    rows = [("hot", s := rng.randrange(0, 1000), s + rng.randrange(1, 60))
            for _ in range(400)]
    rows += [("cold", s := rng.randrange(0, 100), s + 5) for _ in range(10)]
    iv = _iv(spark, rows)
    want = sorted(map(tuple, peak_concurrency(iv, key_col="k").collect()))
    for n in (1, 3, 8, 64):
        got = sorted(
            map(tuple, peak_concurrency(iv, key_col="k", n_chunks=n).collect())
        )
        assert got == want, f"n_chunks={n}"


def test_peak_concurrency_chunked_bounds_task_input(spark):
    # one key, many distinct instants: the fallback's running-sum window
    # partitions on (key, chunk), so no task sees the whole key.
    iv = _iv(spark, [("only", t, t + 3) for t in range(0, 3000, 2)])
    df = peak_concurrency(iv, key_col="k", n_chunks=16)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_chunk" in plan  # chunked window actually in the plan
    out = df.collect()
    assert out[0]["peak_concurrent"] == 2  # [t,t+3) with stride 2 overlap


# --- scd2_apply_increment: incremental == full rebuild ---

from vectorsearch_applications_spark.operators.timeseries import (  # noqa: E402
    scd2_apply_increment,
)

FULL_LOG = [
    # user 1: run continues across the batch boundary (merge path)
    (1, "a", 100, 1), (1, "a", 200, 2), (1, "a", 300, 3), (1, "b", 400, 4),
    # user 2: state flips exactly at the boundary (close path)
    (2, "x", 100, 5), (2, "y", 250, 6), (2, "y", 350, 7),
    # user 3: only in batch 1 (untouched by batch 2)
    (3, "z", 50, 8),
    # user 4: appears for the first time in batch 2 (no open run)
    (4, "q", 400, 9), (4, "r", 500, 10),
]
SPLIT_AT = 250  # batch 1: us < 250, batch 2: us >= 250


def test_scd2_increment_equals_full_rebuild(spark):
    df = _log(spark, FULL_LOG)
    b1 = df.filter(df.us < SPLIT_AT)
    b2 = df.filter(df.us >= SPLIT_AT)
    empty_dim = scd2_intervals(df.limit(0))
    dim1 = scd2_apply_increment(empty_dim, b1)
    dim2 = scd2_apply_increment(dim1, b2)
    want = sorted(
        scd2_intervals(df).collect(),
        key=lambda r: (r["user_id"], r["run_seq"]),
    )
    got = sorted(dim2.collect(), key=lambda r: (r["user_id"], r["run_seq"]))
    assert got == want


def test_scd2_increment_batch1_alone_matches_rebuild_of_prefix(spark):
    df = _log(spark, FULL_LOG)
    b1 = df.filter(df.us < SPLIT_AT)
    dim1 = scd2_apply_increment(scd2_intervals(df.limit(0)), b1)
    want = sorted(
        scd2_intervals(b1).collect(),
        key=lambda r: (r["user_id"], r["run_seq"]),
    )
    got = sorted(dim1.collect(), key=lambda r: (r["user_id"], r["run_seq"]))
    assert got == want


def test_scd2_increment_empty_batch_is_identity(spark):
    df = _log(spark, FULL_LOG)
    dim = scd2_apply_increment(scd2_intervals(df.limit(0)), df)
    dim2 = scd2_apply_increment(dim, df.limit(0))
    assert sorted(dim.collect()) == sorted(dim2.collect())
