"""Reference chunk-boundary golds — OPTIONAL-DEPS test (VERDICT r4 #6).

The reference pins llama-index SentenceSplitter(chunk_size=256,
chunk_overlap=0, tokenizer=tiktoken.encoding_for_model('gpt-4o-mini'))
and its notebook golds are: 154/85/146 chunks for episodes 0-2 of the
impact-theory corpus and doc_id 'kpTJqwIfHcM_61' for chunk 61 of episode
kpTJqwIfHcM (notebooks/1-...COLAB.ipynb cells 48 and 82). Reproducing
them needs BOTH the pinned libs (tiktoken + llama-index, absent in this
container) and the source corpus json (data/impact_theory_data.json, not
shipped in the reference checkout here). This test runs the real-model
path end to end where those exist and skips with a precise reason where
they don't; the portable-counter twin (operators/sentence_chunk.py) is
golden-tested unconditionally in test_sentence_chunk.py.
"""

from __future__ import annotations

import json
import os

import pytest

CORPUS_CANDIDATES = [
    "/root/reference/data/impact_theory_data.json",
    os.environ.get("SPARK_GRAFT_REFERENCE_CORPUS", ""),
]

tiktoken = pytest.importorskip(
    "tiktoken", reason="tiktoken not installed in this container"
)
llama_parser = pytest.importorskip(
    "llama_index.core.node_parser",
    reason="llama-index not installed in this container",
)


def _corpus_path() -> str:
    for p in CORPUS_CANDIDATES:
        if p and os.path.isfile(p):
            return p
    pytest.skip(
        "reference corpus json (impact_theory_data.json) not present in "
        "this checkout"
    )


def test_reference_chunk_count_golds_episodes_0_2(spark):
    """With pinned libs + corpus: the Spark mapInPandas splitter must hit
    the notebook's exact chunk counts 154/85/146 for episodes 0-2."""
    from vectorsearch_applications_spark.operators.chunking import (
        chunk_with_splitter_factory,
    )

    with open(_corpus_path()) as fh:
        eps = json.load(fh)[:3]
    df = spark.createDataFrame(
        [(e["video_id"], e["content"]) for e in eps],
        "doc_id string, text string",
    )
    out = df.mapInPandas(
        chunk_with_splitter_factory(chunk_size=256, overlap=0),
        "doc_id string, chunk_index long, chunk_text string",
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    want = dict(zip([e["video_id"] for e in eps], [154, 85, 146]))
    assert counts == want


def test_reference_doc_id_gold_kpTJqwIfHcM_61(spark):
    from vectorsearch_applications_spark.operators.chunking import (
        chunk_with_splitter_factory,
    )
    import pyspark.sql.functions as F

    with open(_corpus_path()) as fh:
        eps = [e for e in json.load(fh) if e["video_id"] == "kpTJqwIfHcM"]
    assert eps, "episode kpTJqwIfHcM missing from corpus"
    df = spark.createDataFrame(
        [(e["video_id"], e["content"]) for e in eps],
        "doc_id string, text string",
    )
    out = df.mapInPandas(
        chunk_with_splitter_factory(chunk_size=256, overlap=0),
        "doc_id string, chunk_index long, chunk_text string",
    ).withColumn(
        "chunk_id",
        F.concat_ws("_", F.col("doc_id"), F.col("chunk_index")),
    )
    ids = {r["chunk_id"] for r in out.select("chunk_id").collect()}
    assert "kpTJqwIfHcM_61" in ids
