"""Recall-ladder invariants (SCALE.md round-5 section): IVF recall is
monotone in nprobe, LSH multiprobe beats single-bucket, and probing all
buckets recovers exact recall. Run at sf0.001 for speed; the documented
sf0.1 numbers come from the same operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearch_applications_spark.operators.ann import ivf_build, ivf_search
from vectorsearch_applications_spark.operators.knn import knn_search_crossjoin
from vectorsearch_applications_spark.operators.lsh import lsh_planes, lsh_search
from vectorsearch_applications_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"
K = 10


def _setup(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_search_crossjoin(emb, q, k=K).select("query_id", "vec_id")
    nq = q.count()
    return emb, q, exact, nq


def _recall(exact, nq, approx):
    hits = exact.join(
        approx.select("query_id", "vec_id"), ["query_id", "vec_id"]
    ).count()
    return hits / (nq * K)


def test_ivf_recall_monotone_in_nprobe_and_exact_at_full_probe(spark):
    emb, q, exact, nq = _setup(spark)
    cents, asg = ivf_build(emb, n_centroids=8)
    rs = [
        _recall(exact, nq, ivf_search(emb, cents, asg, q, k=K, nprobe=p))
        for p in (1, 2, 4, 8)
    ]
    assert rs == sorted(rs), rs          # more probes never hurt
    assert rs[-1] == 1.0, rs             # all 8 of 8 buckets == exact
    assert rs[0] > 0.05, rs              # one bucket beats the random floor


def test_lsh_multiprobe_beats_single_bucket(spark):
    emb, q, exact, nq = _setup(spark)
    planes = lsh_planes(n_planes=4, dim=64)
    r0 = _recall(exact, nq, lsh_search(emb, q, planes, k=K, multiprobe=0))
    r1 = _recall(exact, nq, lsh_search(emb, q, planes, k=K, multiprobe=1))
    assert r1 >= r0 and r1 > 0.1, (r0, r1)
