"""Sentence-aware chunking — the reference's F1 hard path, llama-index-free.

The reference pins llama-index ``SentenceSplitter(chunk_size=256,
chunk_overlap=0, tokenizer=tiktoken.encoding_for_model('gpt-4o-mini').encode)``
(``/root/reference/notebooks/1-Data_Preprocessing_Week1_COLAB.ipynb`` cells
43-48; gold chunk counts 154/85/146 for episodes 0-2). This module
re-implements the same *semantics* from the splitter's public contract
without importing llama-index:

1. **decompose** — recursively split the text through a cascade
   (paragraph separator → sentence boundary → clause punctuation →
   whitespace → characters) until every piece fits ``chunk_size`` tokens;
   pieces produced at the paragraph/sentence levels are marked
   sentence-complete.
2. **pack** — greedy merge: keep appending pieces while the running token
   count fits; a piece that would overflow a non-empty chunk closes the
   chunk and re-tries (never splitting a fitting sentence across chunks);
   on close, a token-bounded tail of the finished chunk seeds the next one
   as overlap. Chunks are whitespace-stripped; empty chunks are dropped.

The token counter is pluggable: pass ``tiktoken_counter()`` for exact
reference parity when tiktoken is installed; the default
``portable_token_count`` (word + punctuation regex, BPE-ish granularity)
is deterministic in this container, so the packing logic itself runs —
and is tested — for real either way.

Scale: the splitter runs inside Arrow-batched ``mapInPandas`` — pure
narrow transformation, one row → N chunk rows, no shuffle, no driver
involvement; at 100 TB it parallelizes per input parquet split.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_PARAGRAPH_SEP = "\n\n\n"
# a sentence ends at ./!/? (plus closing quotes/brackets) followed by
# whitespace; the match INCLUDES the trailing whitespace so concatenating
# the sentences reproduces the input byte-for-byte
_SENT_BOUNDARY = re.compile(r"[.!?]+[\"'’”)\]]*\s+")
# clause-level fallback: runs up to (and including) , . ; and CJK stops
_CLAUSE = re.compile(r"[^,.;。？！]+[,.;。？！]?")
_TOKEN = re.compile(r"\w+|[^\w\s]")


def portable_token_count(text: str) -> int:
    """Deterministic stand-in for a BPE token count: words + punctuation
    marks. Granularity is close enough to tiktoken that 256-token chunks
    land in the same size regime; swap ``tiktoken_counter()`` in for exact
    reference parity."""
    return len(_TOKEN.findall(text))


def tiktoken_counter(model: str = "gpt-4o-mini") -> Callable[[str], int]:
    """Reference-parity token counter (requires tiktoken; not in this
    container — the caller owns the import failure)."""
    import tiktoken

    enc = tiktoken.encoding_for_model(model)
    return lambda text: len(enc.encode(text))


def split_sentences(text: str) -> list[str]:
    """Whitespace-preserving sentence split: ``''.join(result) == text``."""
    out, start = [], 0
    for m in _SENT_BOUNDARY.finditer(text):
        out.append(text[start : m.end()])
        start = m.end()
    if start < len(text):
        out.append(text[start:])
    return [s for s in out if s]


def _split_keep_sep(text: str, sep: str) -> list[str]:
    """Split on ``sep``, re-attaching it to the front of each following
    part so concatenation reproduces the input."""
    parts = text.split(sep)
    return [p if i == 0 else sep + p for i, p in enumerate(parts) if p or i == 0]


@dataclass
class _Piece:
    text: str
    is_sentence: bool
    n_tokens: int


class SentencePacker:
    """Sentence-aware chunker with SentenceSplitter-equivalent packing."""

    def __init__(
        self,
        chunk_size: int = 256,
        chunk_overlap: int = 0,
        token_counter: Callable[[str], int] | None = None,
    ) -> None:
        if chunk_overlap >= chunk_size:
            raise ValueError("chunk_overlap must be smaller than chunk_size")
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.count = token_counter or portable_token_count

    # -- decompose ---------------------------------------------------------
    def _decompose(self, text: str) -> list[_Piece]:
        n = self.count(text)
        if n <= self.chunk_size:
            return [_Piece(text, True, n)]
        cascade: list[tuple[Callable[[str], list[str]], bool]] = [
            (lambda t: _split_keep_sep(t, _PARAGRAPH_SEP), True),
            (split_sentences, True),
            (lambda t: _CLAUSE.findall(t), False),
            (lambda t: _split_keep_sep(t, " "), False),
            (list, False),
        ]
        for splitter, is_sentence in cascade:
            parts = [p for p in splitter(text) if p]
            if len(parts) <= 1:
                continue
            pieces: list[_Piece] = []
            for part in parts:
                pn = self.count(part)
                if pn <= self.chunk_size:
                    pieces.append(_Piece(part, is_sentence, pn))
                else:
                    pieces.extend(self._decompose(part))
            return pieces
        return [_Piece(text, False, n)]  # single unsplittable token run

    # -- pack --------------------------------------------------------------
    def split_text(self, text: str) -> list[str]:
        if not text or not text.strip():
            return []
        pieces = self._decompose(text)

        chunks: list[str] = []
        cur: list[_Piece] = []
        cur_len = 0
        fresh = True  # nothing accepted into the current chunk yet

        def close() -> None:
            nonlocal cur, cur_len, fresh
            chunks.append("".join(p.text for p in cur))
            tail: list[_Piece] = []
            tail_len = 0
            for p in reversed(cur):
                if tail_len + p.n_tokens > self.chunk_overlap:
                    break
                tail.insert(0, p)
                tail_len += p.n_tokens
            cur, cur_len, fresh = tail, tail_len, True

        i = 0
        while i < len(pieces):
            p = pieces[i]
            if not fresh and cur_len + p.n_tokens > self.chunk_size:
                close()  # piece not consumed: re-tried against the new chunk
            else:
                cur.append(p)
                cur_len += p.n_tokens
                fresh = False
                i += 1
        if not fresh:
            chunks.append("".join(p.text for p in cur))

        return [c for c in (c.strip() for c in chunks) if c]


def chunk_sentences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 256,
    chunk_overlap: int = 0,
    token_counter: Callable[[str], int] | None = None,
) -> DataFrame:
    """Explode each doc into sentence-packed chunks (1 row → N rows).

    Output: (doc_id, chunk_index, chunk_id = '{doc_id}_{chunk_index}',
    chunk_text, n_chunk_tokens) — the reference's ``doc_id`` convention
    (nb1 cell 82 gold ``kpTJqwIfHcM_61``). Empty/whitespace docs emit no
    rows, matching the reference's upstream drop.
    """
    import pandas as pd

    id_type = docs.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("doc_id", id_type),
            StructField("chunk_index", LongType()),
            StructField("chunk_id", StringType()),
            StructField("chunk_text", StringType()),
            StructField("n_chunk_tokens", LongType()),
        ]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        packer = SentencePacker(chunk_size, chunk_overlap, token_counter)
        for pdf in batches:
            ids, idxs, cids, texts, ntoks = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, chunk in enumerate(packer.split_text(text or "")):
                    ids.append(doc_id)
                    idxs.append(i)
                    cids.append(f"{doc_id}_{i}")
                    texts.append(chunk)
                    ntoks.append(packer.count(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_index": idxs,
                    "chunk_id": cids,
                    "chunk_text": texts,
                    "n_chunk_tokens": ntoks,
                }
            )

    narrowed = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return narrowed.mapInPandas(gen, out_schema)
