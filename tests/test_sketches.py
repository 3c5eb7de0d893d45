"""Mergeable sketch operators (operators/sketches.py): FM distinct
sketch and Count-Min. Driver parity via distinct_count_fm_sketch /
heavy_hitters_cms oracles; these tests check the sketch THEOREMS the
oracles can't express: CMS never underestimates, FM state merges with
max, estimates are within the published error regime."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearch_applications_spark.operators.sketches import (
    cms_counts,
    cms_estimate,
    fm_distinct_sketch,
)
from vectorsearch_applications_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    docs = load_table(spark, SF, "documents")
    terms = docs.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    sketch = cms_counts(tf, "term", d=4, w=1024, weight_col="exact")
    top = tf.orderBy(F.desc("exact"), F.asc("term")).limit(30)
    est = cms_estimate(sketch, top, term_col="term", d=4, w=1024)
    rows = top.join(est, "term").collect()
    assert len(rows) == 30
    for r in rows:
        assert r["cms_estimate"] >= r["exact"], r  # CMS one-sided error
    # most cells collision-free at this vocab size: estimates mostly exact
    exact_hits = sum(1 for r in rows if r["cms_estimate"] == r["exact"])
    assert exact_hits >= 15, exact_hits


def test_cms_sketch_state_is_bounded_and_merges_by_sum(spark):
    docs = load_table(spark, SF, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    def sk(d):
        t = d.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("term")).filter(
            F.col("term") != ""
        )
        return cms_counts(t, "term", d=2, w=256)

    merged = (
        sk(a).unionByName(sk(b)).groupBy("j", "bucket").agg(
            F.sum("count").cast("bigint").alias("count")
        )
    )
    whole = sk(docs)
    assert whole.count() <= 2 * 256  # bounded state
    got = {(r["j"], r["bucket"]): r["count"] for r in merged.collect()}
    want = {(r["j"], r["bucket"]): r["count"] for r in whole.collect()}
    assert got == want  # shard-merge == whole-corpus build


def test_fm_sketch_estimate_in_published_error_regime(spark):
    ev = load_table(spark, SF, "events")
    rows = fm_distinct_sketch(ev, "event_type", "user_id", n_buckets=16).collect()
    assert rows
    for r in rows:
        est = r["fm_estimate_pow2"]
        exact = r["exact_distinct"]
        # single-R FM is a coarse power-of-two estimator: within ~32x both
        # ways covers the phi correction + variance at these cardinalities
        assert est >= 1 and exact >= 1
        assert est <= exact * 32 and exact <= est * 32, r


def test_fm_rho_determinism_same_inputs_same_sketch(spark):
    ev = load_table(spark, SF, "events")
    a = sorted(map(tuple, fm_distinct_sketch(ev, "event_type", "user_id").collect()))
    b = sorted(
        map(
            tuple,
            fm_distinct_sketch(
                ev.repartition(7), "event_type", "user_id"
            ).collect(),
        )
    )
    assert a == b  # partitioning-invariant (max/sum are order-free)


# --- HyperLogLog registers (driver parity: distinct_count_hll_registers) ---

from vectorsearch_applications_spark.operators.sketches import (  # noqa: E402
    hll_estimate,
    hll_registers,
)


def test_hll_shard_merge_equals_whole_build(spark):
    ev = load_table(spark, SF, "events")
    whole = {
        (r["event_type"], r["register_id"]): r["rho_max"]
        for r in hll_registers(ev, "event_type", "user_id", b=4).collect()
    }
    # split the stream into 3 disjoint shards, build each, merge with max
    merged: dict = {}
    for i in range(3):
        shard = ev.filter(F.col("event_id") % 3 == i)
        for r in hll_registers(shard, "event_type", "user_id", b=4).collect():
            k = (r["event_type"], r["register_id"])
            merged[k] = max(merged.get(k, 0), r["rho_max"])
    assert merged == whole


def test_hll_estimate_tracks_exact_distinct(spark):
    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    regs = hll_registers(ev, "event_type", "user_id", b=4)
    est = {
        r["event_type"]: r["hll_estimate"]
        for r in hll_estimate(regs, "event_type", b=4).collect()
    }
    # m=16 gives ~26% standard error; accept 2 sigma
    for et, nd in exact.items():
        assert abs(est[et] - nd) / nd < 0.55, (et, nd, est[et])


def test_hll_estimate_sum_is_dyadic_exact(spark):
    # Σ 2^-rho over <=16 registers is exactly representable, so the
    # estimate is partition-order independent: rebuild with different
    # parallelism and compare bitwise.
    ev = load_table(spark, SF, "events")
    a = hll_estimate(
        hll_registers(ev, "event_type", "user_id"), "event_type"
    ).collect()
    b = hll_estimate(
        hll_registers(ev.repartition(13), "event_type", "user_id"),
        "event_type",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
