"""Document chunking — the reference's F1 UDTF (1 row → N chunk rows).

Reference: ``create_dataset`` splits each episode transcript with
llama-index's SentenceSplitter(chunk_size=256, overlap=0) + tiktoken
(``notebooks/1-Data_Preprocessing_Week1_COLAB.ipynb`` cells 45-48; gold
counts 154/85/146 for episodes 0-2) and emits
``doc_id = f"{video_id}_{chunk_index}"`` (cell 82 gold ``kpTJqwIfHcM_61``).

Engine re-expression, two tiers:

- ``chunk_tokens`` (default): deterministic token-window chunking on the
  portable tokenizer — pure Catalyst (sequence + transform + posexplode),
  no Python, oracle-checkable. The chunk boundary rule is
  ``tokens[i*stride : i*stride+size]`` with stride = size − overlap.

- ``chunk_with_splitter_factory``: the ingest-parity path — a mapInPandas
  UDTF that runs the pinned llama-index SentenceSplitter inside Arrow
  batches (import-gated; reproduces the reference's exact boundaries when
  the pinned libs are present). Never in the query path (SURVEY §7 hard
  part 4).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def chunk_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
    overlap: int = 0,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Explode each doc into token-window chunks.

    Output: (doc_id, chunk_index, chunk_id = '{doc_id}_{chunk_index}',
    chunk_text, n_chunk_tokens). Docs with zero tokens produce no rows
    (matches the reference: empty transcripts are dropped upstream).
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    # let-bind the token array once (transform(array(...), t -> …)[0]):
    # higher-order functions are interpreted with no CSE, so a raw tokenize
    # subtree would re-run its regex for the size() checks AND for every
    # chunk window
    def _chunk_windows(t: Column) -> Column:
        # windows needed to cover n tokens: 1 + ceil((n − size)/stride),
        # min 1 for any non-empty doc (equals ceil(n/size) when
        # overlap = 0, which is the form the SQL oracles use)
        n_chunks = F.when(F.size(t) == 0, F.lit(0)).otherwise(
            F.lit(1)
            + F.ceil(
                F.greatest(F.size(t) - chunk_size, F.lit(0)) / F.lit(stride)
            ).cast("int")
        )
        # guard: Spark's sequence(0, -1) yields a DESCENDING [0, -1], not
        # [] — zero-token docs must produce zero chunks
        return F.when(
            n_chunks <= 0, F.array().cast("array<array<string>>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(t, i * stride + 1, chunk_size),
            )
        )

    chunks = F.transform(F.array(tokenize(text_col)), _chunk_windows)[0]
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_index", "_ct")
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_index").cast("bigint").alias("chunk_index"),
        F.concat(
            F.col("doc_id").cast("string"), F.lit("_"), F.col("chunk_index")
        ).alias("chunk_id"),
        F.concat_ws(" ", F.col("_ct")).alias("chunk_text"),
        F.size("_ct").cast("bigint").alias("n_chunk_tokens"),
    )


def chunk_with_splitter_factory(chunk_size: int = 256, overlap: int = 0):
    """mapInPandas UDTF using llama-index SentenceSplitter (ingest parity).

    Output schema: ``doc_id string, chunk_index long, chunk_text string``.
    Import-gated: raises NotImplementedError when the pinned splitter libs
    are absent (this container), keeping the plumbing testable with
    ``chunk_tokens`` as the deterministic stand-in.
    """
    import pandas as pd

    def split_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        try:
            from llama_index.core.node_parser import SentenceSplitter  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "llama-index not installed; use chunk_tokens for the "
                "deterministic engine path"
            ) from e
        splitter = SentenceSplitter(chunk_size=chunk_size, chunk_overlap=overlap)
        for pdf in batches:
            out_ids, out_idx, out_text = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, chunk in enumerate(splitter.split_text(text)):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_text.append(chunk)
            yield pd.DataFrame(
                {"doc_id": out_ids, "chunk_index": out_idx, "chunk_text": out_text}
            )

    return split_batches
