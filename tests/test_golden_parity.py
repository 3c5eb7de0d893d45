"""Retrieval-quality parity against the REFERENCE'S OWN golden dataset.

/root/reference/data/golden_datasets/golden_256.json carries the actual
evaluation set the reference publishes numbers for (BASELINE.md: BM25
hit_rate@5 = 0.78, MRR@5 = 0.64 at chunk 256 — notebooks/4-Reranking
cell 14): 100 real queries, the gold chunk for each, and the chunk texts.

The published numbers were measured against the FULL chunk corpus
(~thousands of candidates); the golden file ships only the 100 gold
chunks, so retrieval here ranks the gold chunk among 100 candidates — a
strictly easier pool. The published full-corpus rates are therefore a
LOWER bound for this engine's metrics on the same queries: if our
engine-owned BM25 + hit_rate/MRR semantics fell below them even on the
reduced pool, quality parity would be broken.

Floors pinned: plain BM25, two-stage late interaction, and PRF — all
lexical/derived-from-lexical under this sandbox's deterministic
hash-embed twin. Hybrid fusion deliberately has NO floor: measured
0.92 hit_rate / 0.63 MRR on the reduced pool (r9), where the vector
arm is the hash-embed FAKE, not the published MiniLM — pinning the
real-embedding floor against a fake arm would fail on the fake's
ranking noise, and pinning a lower number would look like a quality
claim it isn't. The real-model path is import-gated
(test_reference_golds_optional.py).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

GOLDEN = "/root/reference/data/golden_datasets/golden_256.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden dataset not present"
)


@pytest.fixture(scope="module")
def golden():
    return json.load(open(GOLDEN))


def test_bm25_beats_published_fullcorpus_rates_on_golden_queries(
    spark, golden
):
    from vectorsearch_applications_spark.operators.bm25 import bm25_search
    from vectorsearch_applications_spark.operators.evaluation import (
        retrieval_metrics,
    )

    qid = {q: i for i, q in enumerate(golden["queries"])}  # uuid -> int
    did = {d: i for i, d in enumerate(golden["corpus"])}
    corpus = spark.createDataFrame(
        [(did[k], t) for k, t in golden["corpus"].items()],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(qid[k], t) for k, t in golden["queries"].items()],
        "query_id long, query string",
    )
    gold = spark.createDataFrame(
        [(qid[q], did[d]) for q, d in golden["relevant_docs"].items()],
        "query_id long, relevant_doc_id long",
    )
    hits = bm25_search(corpus, queries, limit=5).withColumn(
        "method", F.lit("bm25")
    )
    (m,) = retrieval_metrics(hits, gold).collect()
    assert m["n_queries"] == 100
    # published full-corpus numbers are the floor for the reduced pool
    assert m["hit_rate"] >= 0.78, m
    assert m["mrr"] >= 0.64, m


TRIPLETS = "/root/reference/data/qa_training_triplets.json"


@pytest.mark.skipif(
    not os.path.exists(TRIPLETS), reason="reference triplets not present"
)
def test_triplet_schema_matches_reference_artifact(spark):
    """Our F5 triplet output must carry exactly the fields the reference's
    shipped training artifact carries (anchor/positive/hard_negative) —
    a consumer fine-tuning from that artifact can switch engines without
    changing their loader."""
    import __spark_entry__ as entry

    ref_fields = set(json.load(open(TRIPLETS))[0].keys())
    ours = entry.queries()["qa_triplets"](
        spark, "/root/testdata/sf0.001"
    )
    assert ref_fields <= set(ours.columns)
    # and the triplet semantics hold on our output
    row = ours.limit(1).collect()[0]
    assert row["positive"] != row["hard_negative"]


GUESTS = "/root/reference/data/metadata/guests.json"


@pytest.mark.skipif(
    not os.path.exists(GUESTS), reason="reference metadata not present"
)
def test_reference_corpus_metadata_loads_with_baseline_cardinality(spark):
    """S1 JSON ingest of the reference's own metadata reproduces the
    published corpus cardinality (193 episodes — BASELINE.md) and the
    repeat-guest structure its GROUP BY ops rely on."""
    guests = json.load(open(GUESTS))
    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(guests)], "episode long, guest string"
    )
    assert df.count() == 193
    repeats = (
        df.groupBy("guest").count().filter(F.col("count") > 1).count()
    )
    assert repeats >= 1  # zipfian guests: GROUP BY ... HAVING COUNT>1 is non-empty


def test_two_stage_late_interaction_quality_on_golden_queries(spark, golden):
    """The two-stage late-interaction entry point must retrieve at least
    as well as its own BM25 first stage on the reference's golden
    queries — Σ-maxsim re-ranking of the BM25 candidates may reorder but
    must not lose gold docs that the prune already surfaced (k ≤ N), and
    its absolute quality stays above the published full-corpus floor."""
    from vectorsearch_applications_spark.operators.evaluation import (
        retrieval_metrics,
    )
    from vectorsearch_applications_spark.operators.late_interaction import (
        late_interaction_two_stage,
    )

    qid = {q: i for i, q in enumerate(golden["queries"])}
    did = {d: i for i, d in enumerate(golden["corpus"])}
    corpus = spark.createDataFrame(
        [(did[k], t) for k, t in golden["corpus"].items()],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(qid[k], t) for k, t in golden["queries"].items()],
        "query_id long, query string",
    )
    gold = spark.createDataFrame(
        [(qid[q], did[d]) for q, d in golden["relevant_docs"].items()],
        "query_id long, relevant_doc_id long",
    )
    hits = late_interaction_two_stage(
        corpus, queries, k=5, n_candidates=25
    ).withColumn("method", F.lit("li2"))
    (m,) = retrieval_metrics(hits, gold).collect()
    assert m["n_queries"] == 100
    assert m["hit_rate"] >= 0.78, m
    assert m["mrr"] >= 0.64, m


def test_prf_beats_published_fullcorpus_rates_on_golden_queries(
    spark, golden
):
    """RM3-lite pseudo-relevance feedback must not degrade retrieval
    below the reference's published BM25 floor on its own golden set —
    query expansion is only worth shipping if the expanded round keeps
    quality (measured 0.94 / 0.88 on the reduced pool; the published
    full-corpus 0.78 / 0.64 is the conservative floor shared with the
    plain-BM25 and two-stage late-interaction pins)."""
    from vectorsearch_applications_spark.operators.bm25 import (
        bm25_prf_search,
    )
    from vectorsearch_applications_spark.operators.evaluation import (
        retrieval_metrics,
    )

    qid = {q: i for i, q in enumerate(golden["queries"])}
    did = {d: i for i, d in enumerate(golden["corpus"])}
    corpus = spark.createDataFrame(
        [(did[k], t) for k, t in golden["corpus"].items()],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(qid[k], t) for k, t in golden["queries"].items()],
        "query_id long, query string",
    )
    gold = spark.createDataFrame(
        [(qid[q], did[d]) for q, d in golden["relevant_docs"].items()],
        "query_id long, relevant_doc_id long",
    )
    hits = bm25_prf_search(
        corpus, queries, fb_k=5, n_expand=3, limit=5
    ).withColumn("method", F.lit("bm25_prf"))
    (m,) = retrieval_metrics(hits, gold).collect()
    assert m["n_queries"] == 100
    assert m["hit_rate"] >= 0.78, m
    assert m["mrr"] >= 0.64, m
