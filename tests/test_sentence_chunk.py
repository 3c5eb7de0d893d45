"""Sentence-packing parity tests (F1 hard path) — non-gated: the packer
runs for real with the portable token counter; hand-computed golden
fixtures mirror the reference's SentenceSplitter contract
(notebooks/1-Data_Preprocessing_Week1_COLAB.ipynb cells 43-48)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.sentence_chunk import (
    SentencePacker,
    chunk_sentences,
    portable_token_count,
    split_sentences,
)
from vectorsearch_applications_spark.sources.io import load_table

from .conftest import SF_SMOKE

TEXT = "The quick brown fox jumps. It was sunny. Dogs bark loudly at night. Cats sleep."
# portable token counts per sentence (incl. trailing '.'): 6, 4, 6, 3


def test_split_sentences_preserves_text():
    parts = split_sentences(TEXT)
    assert parts == [
        "The quick brown fox jumps. ",
        "It was sunny. ",
        "Dogs bark loudly at night. ",
        "Cats sleep.",
    ]
    assert "".join(parts) == TEXT


def test_greedy_sentence_packing_golden():
    packer = SentencePacker(chunk_size=10, chunk_overlap=0)
    assert packer.split_text(TEXT) == [
        "The quick brown fox jumps. It was sunny.",
        "Dogs bark loudly at night. Cats sleep.",
    ]


def test_overlap_carries_sentence_tail():
    packer = SentencePacker(chunk_size=10, chunk_overlap=4)
    # the 4-token tail sentence "It was sunny." seeds chunk 2; the 6-token
    # "Dogs bark..." exceeds the overlap budget so chunk 3 gets no tail
    assert packer.split_text(TEXT) == [
        "The quick brown fox jumps. It was sunny.",
        "It was sunny. Dogs bark loudly at night.",
        "Cats sleep.",
    ]


def test_oversized_sentence_falls_back_to_clauses():
    text = "a b c d e, f g h i j, k l m n o."
    packer = SentencePacker(chunk_size=10, chunk_overlap=0)
    # 18 tokens, no sentence boundary inside → clause-level split, each
    # 6-token clause kept intact, one clause per chunk after packing
    assert packer.split_text(text) == [
        "a b c d e,",
        "f g h i j,",
        "k l m n o.",
    ]


def test_fitting_doc_is_one_chunk_and_empty_is_none():
    packer = SentencePacker(chunk_size=256, chunk_overlap=0)
    assert packer.split_text("One tiny doc. Two sentences.") == [
        "One tiny doc. Two sentences."
    ]
    assert packer.split_text("") == []
    assert packer.split_text("   \n  ") == []


def test_chunk_sentences_dataframe_lossless(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 20)
    out = chunk_sentences(docs, chunk_size=64).toPandas()
    src = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    assert (out["n_chunk_tokens"] <= 64).all()
    assert (
        out["chunk_id"]
        == out["doc_id"].astype(str) + "_" + out["chunk_index"].astype(str)
    ).all()
    # overlap=0: the flat token stream of each doc's chunks (in chunk_index
    # order) must equal the original text's token stream — no loss, no dup
    from vectorsearch_applications_spark.operators.sentence_chunk import _TOKEN

    for doc_id, grp in out.sort_values("chunk_index").groupby("doc_id"):
        chunk_toks = [t for c in grp["chunk_text"] for t in _TOKEN.findall(c)]
        assert chunk_toks == _TOKEN.findall(src[doc_id]), doc_id
    # every non-empty doc produced at least one chunk
    nonempty = {d for d, t in src.items() if t and t.strip()}
    assert nonempty == set(out["doc_id"])


def test_packer_respects_chunk_size_on_corpus(spark):
    """Property over real corpus text: no chunk exceeds chunk_size unless
    it is a single unsplittable token run (which the corpus doesn't have)."""
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") < 100)
        .select("text")
        .collect()
    )
    packer = SentencePacker(chunk_size=32, chunk_overlap=8)
    for row in docs:
        for chunk in packer.split_text(row["text"]):
            assert portable_token_count(chunk) <= 32 + 8  # overlap seed slack
