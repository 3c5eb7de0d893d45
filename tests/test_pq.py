"""Unit tests for operators/pq.py product quantization (driver parity is
covered by test_oracle_parity on ann_pq_adc)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearch_applications_spark.operators.knn import knn_search_crossjoin
from vectorsearch_applications_spark.operators.pq import (
    pq_adc_search,
    pq_codebook,
    pq_encode,
)
from vectorsearch_applications_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_codebook_vectors_encode_to_their_own_codes(spark):
    emb = load_table(spark, SF, "embeddings")
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    codes = pq_encode(emb.filter(F.col("vec_id") < 8), cb, n_sub=8, dim=64)
    for r in codes.collect():
        # vector c IS code c in every subspace -> d = -<c,c>*1e6, minimal
        assert r["codes"] == [r["vec_id"]] * 8, r


def test_adc_self_query_ranks_query_first_for_codebook_vectors(spark):
    emb = load_table(spark, SF, "embeddings")
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    codes = pq_encode(emb, cb, n_sub=8, dim=64)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = pq_adc_search(codes, cb, q, n_codes=8, n_sub=8, dim=64, k=1)
    for r in hits.collect():
        # a codebook vector reconstructs exactly, so ADC(q,q) is the true
        # minimal -<q,q>; no other code combo can be closer to q than q
        assert r["vec_id"] == r["query_id"]


def test_adc_recall_beats_random_floor(spark):
    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    codes = pq_encode(emb, cb, n_sub=8, dim=64)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = pq_adc_search(codes, cb, q, n_codes=8, n_sub=8, dim=64, k=10)
    exact = knn_search_crossjoin(emb, q, k=10)
    hits = exact.join(
        approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "inner"
    ).count()
    recall = hits / exact.count()
    # 10 random picks from n would land ~10/n of the true top-10
    assert recall > max(0.2, 20.0 / n), recall


def test_ivfpq_results_subset_of_full_adc_ranking(spark):
    # IVFPQ = ADC restricted to probed buckets: every hit it returns must
    # carry the same adc_score the unrestricted ADC search assigns
    from vectorsearch_applications_spark.operators.pq import ivfpq_search

    emb = load_table(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    codes = pq_encode(emb, cb, n_sub=8, dim=64)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    full = {
        (r["query_id"], r["vec_id"]): r["adc_score"]
        for r in pq_adc_search(codes, cb, q, k=10_000).collect()
    }
    ivfpq = ivfpq_search(emb, cents, cb, q, k=10, nprobe=2).collect()
    assert len(ivfpq) > 0
    for r in ivfpq:
        assert full[(r["query_id"], r["vec_id"])] == r["adc_score"]


def test_ivfpq_probing_all_buckets_equals_full_adc(spark):
    from vectorsearch_applications_spark.operators.pq import ivfpq_search

    emb = load_table(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    codes = pq_encode(emb, cb, n_sub=8, dim=64)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
        for r in ivfpq_search(emb, cents, cb, q, k=10, nprobe=8).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
        for r in pq_adc_search(codes, cb, q, k=10).collect()
    )
    assert a == b


def test_pq_persisted_index_matches_in_plan_search(spark, tmp_path):
    from vectorsearch_applications_spark.operators.pq import (
        pq_save_index,
        pq_search_indexed,
    )

    emb = load_table(spark, SF, "embeddings")
    root = str(tmp_path)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    base = pq_save_index(emb, root, "vecs", centroids=cents)
    import os

    # IVFADC on-disk layout: codes partitioned by bucket
    assert any(
        d.startswith("centroid_id=") for d in os.listdir(os.path.join(base, "codes"))
    )

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    codes = pq_encode(emb, cb, n_sub=8, dim=64)
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
        for r in pq_adc_search(codes, cb, q, k=5).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
        for r in pq_search_indexed(spark, root, "vecs", q, k=5).collect()
    )
    assert got == want


def test_codebook_rank_rule_survives_sparse_id_space(spark):
    # ADVICE r4 (pq.py): the old id-prefix rule (id < n_codes) produced a
    # GAPPY codebook on any corpus whose ids don't start dense at 0, and
    # the flat LUT index m*K+code then silently misaligned. The rank rule
    # must make search results invariant to a constant id shift.
    emb = load_table(spark, SF, "embeddings")
    shifted = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    q0 = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    def run(corpus):
        cb = pq_codebook(corpus, n_codes=8, n_sub=8, dim=64)
        codes = pq_encode(corpus, cb, n_sub=8, dim=64)
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
            for r in pq_adc_search(codes, cb, q0, k=10).collect()
        )
    base = run(emb)
    shift = [(q, rk, v - 1000, s) for (q, rk, v, s) in run(shifted)]
    assert base == shift
    # and the codebook itself is dense 0..7 per subspace on the shifted ids
    cb = pq_codebook(shifted, n_codes=8, n_sub=8, dim=64)
    got = sorted(
        (r["sub"], r["code"]) for r in cb.select("sub", "code").collect()
    )
    assert got == [(s, c) for s in range(8) for c in range(8)]


def test_small_corpus_codebook_lut_indexing_stays_aligned(spark):
    # corpus smaller than n_codes: the codebook has K < n_codes codes and
    # scoring must index the LUT by the ACTUAL K, not the parameter
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 6)
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    assert cb.count() == 6 * 8  # K=6 codes x 8 subspaces
    codes = pq_encode(emb, cb, n_sub=8, dim=64)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = pq_adc_search(codes, cb, q, n_codes=8, n_sub=8, dim=64, k=3)
    rows = hits.collect()
    assert len(rows) == 6  # 2 queries x k=3, no NULL-poisoned scores
    for r in rows:
        assert r["adc_score"] is not None
        if r["rank"] == 1:
            # codebook vectors reconstruct exactly -> self is top-1
            assert r["vec_id"] == r["query_id"]


def test_ivfpq_search_indexed_matches_in_plan(spark, tmp_path):
    from vectorsearch_applications_spark.operators.pq import (
        ivfpq_search,
        ivfpq_search_indexed,
        pq_save_index,
    )

    emb = load_table(spark, SF, "embeddings")
    root = str(tmp_path)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    pq_save_index(emb, root, "vecs", centroids=cents)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cb = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
        for r in ivfpq_search(emb, cents, cb, q, k=5, nprobe=2).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc_score"])
        for r in ivfpq_search_indexed(
            spark, root, "vecs", q, k=5, nprobe=2
        ).collect()
    )
    assert got == want


def test_kmeans_codebook_shape_and_quantization_error_improves(spark):
    # Lloyd-trained sub-codebooks (SCALE.md recall-ladder lever): dense
    # (sub, code) grid preserved, and total quantization error (sum of
    # true L2^2 from each sub-slice to its assigned code) must not get
    # worse than the rank-rule seed codebook.
    from vectorsearch_applications_spark.operators.pq import (
        pq_codebook,
        pq_codebook_kmeans,
        pq_encode,
    )

    emb = load_table(spark, SF, "embeddings")
    seed = pq_codebook(emb, n_codes=8, n_sub=8, dim=64)
    trained = pq_codebook_kmeans(emb, n_codes=8, n_sub=8, dim=64, iterations=2)
    got = sorted(
        (r["sub"], r["code"]) for r in trained.select("sub", "code").collect()
    )
    assert got == [(s, c) for s in range(8) for c in range(8)]

    def qerr(cb):
        codes = pq_encode(emb, cb, n_sub=8, dim=64)
        joined = codes.join(
            emb.select("vec_id", "embedding"), "vec_id"
        ).crossJoin(
            F.broadcast(
                cb.groupBy().agg(
                    F.map_from_arrays(
                        F.collect_list(
                            F.concat_ws(
                                "_",
                                F.col("sub").cast("string"),
                                F.col("code").cast("string"),
                            )
                        ),
                        F.collect_list("cvec"),
                    ).alias("cbm")
                )
            )
        )
        err = joined.select(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(7)),
                F.lit(0.0),
                lambda acc, m: acc
                + F.aggregate(
                    F.zip_with(
                        F.slice(
                            F.transform(
                                "embedding", lambda x: x.cast("double")
                            ),
                            m * 8 + 1,
                            8,
                        ),
                        F.element_at(
                            "cbm",
                            F.concat_ws(
                                "_",
                                m.cast("string"),
                                F.element_at("codes", m + 1).cast("string"),
                            ),
                        ),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
            ).alias("e")
        ).agg(F.sum("e")).collect()[0][0]
        return err

    e_seed, e_trained = qerr(seed), qerr(trained)
    assert e_trained <= e_seed * 1.0001, (e_seed, e_trained)
    # and the ADC pipeline runs on the trained codebook with no NULLs
    codes = pq_encode(emb, trained, n_sub=8, dim=64)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = pq_adc_search(codes, trained, q, k=5).collect()
    assert len(rows) == 10 and all(r["adc_score"] is not None for r in rows)
