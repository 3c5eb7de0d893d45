"""Bloom-filter semi-join pruning (operators/bloom.py). Driver parity
via the bloom_filter_dim_prune oracle; these tests pin the theorems the
cross-tab can't express directly: zero false negatives on arbitrary key
sets, shard mergeability by bit_or, and the zero-shuffle probe plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearch_applications_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)


def test_bloom_has_no_false_negatives(spark):
    members = spark.range(0, 500, 3).withColumnRenamed("id", "k")
    bloom = bloom_build(members, "k", n_bits=2048, k=3)
    probed = bloom_probe(
        spark.range(0, 500).withColumnRenamed("id", "k"), "k", bloom,
        n_bits=2048, k=3,
    )
    rows = probed.collect()
    for r in rows:
        if r["k"] % 3 == 0:
            assert r["maybe_member"] == 1, r  # member MUST pass
    # and the filter actually filters: most non-members rejected
    fp = sum(1 for r in rows if r["k"] % 3 != 0 and r["maybe_member"] == 1)
    non = sum(1 for r in rows if r["k"] % 3 != 0)
    assert fp / non < 0.25, (fp, non)


def test_bloom_shards_merge_by_bit_or(spark):
    whole = {
        r["word_id"]: r["bits"]
        for r in bloom_build(
            spark.range(300).withColumnRenamed("id", "k"), "k"
        ).collect()
    }
    merged: dict = {}
    for i in range(3):
        shard = spark.range(300).withColumnRenamed("id", "k").filter(
            F.col("k") % 3 == i
        )
        for r in bloom_build(shard, "k").collect():
            merged[r["word_id"]] = merged.get(r["word_id"], 0) | r["bits"]
    assert merged == whole


def test_bloom_probe_plan_never_shuffles_the_fact(spark):
    members = spark.range(50).withColumnRenamed("id", "k")
    bloom = bloom_build(members, "k")
    probed = bloom_probe(
        spark.range(10_000).withColumnRenamed("id", "k"), "k", bloom
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the only exchanges allowed are the broadcast of the word map and
    # the word table's own build aggregation — never a fact shuffle
    import re
    fact_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"Exchange hashpartitioning", ln)
        and "word_id" not in ln
    ]
    assert not fact_exchanges, fact_exchanges


def test_bloom_fp_rate_tracks_fill_factor_ladder(spark):
    # measured sizing ladder (the SCALE.md fill-factor math): FP rate
    # ~ (1 - e^(-kn/m))^k, so growing m collapses the FP rate. 500
    # member keys, 2000 probes, k=3.
    import math

    members = spark.range(0, 5000, 10).withColumnRenamed("id", "k")  # 500
    probes = spark.range(5000, 7000).withColumnRenamed("id", "k")  # disjoint
    measured = {}
    for m in (2048, 8192, 32768):
        bloom = bloom_build(members, "k", n_bits=m, k=3)
        fp = (
            bloom_probe(probes, "k", bloom, n_bits=m, k=3)
            .filter(F.col("maybe_member") == 1)
            .count()
        )
        measured[m] = fp / 2000
        predicted = (1 - math.exp(-3 * 500 / m)) ** 3
        # within 3x of theory (small-sample noise) and monotone in m
        assert measured[m] <= max(3 * predicted, 0.01), (m, measured[m], predicted)
    assert measured[2048] >= measured[8192] >= measured[32768]
    assert measured[32768] < 0.005  # ~0.0001 predicted; must be tiny
