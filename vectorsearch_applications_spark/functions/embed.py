"""Embedding UDFs (SURVEY.md F2/Q2 query-side embedding).

Two implementations behind one interface:

- ``hash_embed_col`` — the deterministic default (FIXTURES.md determinism
  rules): token-hash-based unit-norm vector, pure Catalyst expressions, so
  retrieval tests reproduce bit-for-bit with no model weights and the DuckDB
  oracle can recompute it.

- ``model_embed_factory`` — the production path: a ``mapInPandas`` /
  ``pandas_udf`` with a per-executor SentenceTransformer singleton (the
  reference's ``all-MiniLM-L6-v2``, ``weaviate_interface_v4.py:47,66``).
  The model library is not in this container, so it is gated behind an
  import-try; the *plumbing* (Arrow batching, singleton caching, schema) is
  real and tested with a fake encoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import stable_hash64, tokenize
from .vectors import l2_normalize


def hash_embed_col(text: Column, dim: int = 16) -> Column:
    """Deterministic unit-norm embedding of a text column.

    dim_d(text) = Σ_tokens ((md5-hash(token#d) mod 1000) − 499.5)/500,
    then L2-normalized. Zero-token texts embed to the zero vector.
    """
    toks = tokenize(text)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc
            + (
                (
                    stable_hash64(F.concat(t, F.lit("#"), d.cast("string"))) % 1000
                ).cast("double")
                - 499.5
            )
            / 500.0,
        ),
    )
    return F.when(F.size(toks) == 0, raw).otherwise(l2_normalize(raw))


_MODEL_CACHE: dict[str, object] = {}


def _get_model(name: str):
    """Per-executor model singleton (load-once; the reference caches with
    st.cache_resource, ``src/app_functions.py:15-39``)."""
    if name not in _MODEL_CACHE:
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as e:  # pragma: no cover - model lib absent in CI
            raise NotImplementedError(
                "sentence-transformers not installed; use hash_embed_col or "
                "pass a custom encode_fn"
            ) from e
        _MODEL_CACHE[name] = SentenceTransformer(name)
    return _MODEL_CACHE[name]


def model_embed_factory(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    dim: int = 384,
    encode_fn: Callable[[list[str]], "list[list[float]]"] | None = None,
):
    """Build a mapInPandas function embedding a ``text`` column → adds
    ``embedding array<float>``. ``encode_fn`` injects a custom/fake encoder
    (tests); default loads the SentenceTransformer singleton per executor.
    """
    import pandas as pd

    def embed_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fn = encode_fn
        if fn is None:
            model = _get_model(model_name)
            fn = lambda texts: model.encode(texts, normalize_embeddings=True).tolist()  # noqa: E731
        for pdf in batches:
            out = pdf.copy()
            out["embedding"] = fn(pdf["text"].tolist())
            yield out

    return embed_batches
