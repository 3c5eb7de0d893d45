"""Late-interaction (maxsim) retrieval — token-level dense scoring.

score(q, d) = Σ_{query tokens} max_{doc tokens} cos(qt, dt): each query
token finds its best-matching document token and the per-token maxima
sum. The interaction happens AFTER encoding (late), so document token
embeddings are precomputable/indexable — the retrieval model family the
single-vector kNN (operators/knn.py, SURVEY Q2) can't express because
one pooled vector per document loses token-level alignment.

Token embeddings here are the repo's deterministic hash encoder
(functions/embed.py hash_embed_col on the single token), making every
similarity bit-reproducible and the whole operator DuckDB-oracle-
checkable; swap a real per-token encoder via the same column.

Scale shape: document tokens embed via the DISTINCT token vocabulary
(hash each token once, not once per occurrence — Heaps-bounded like the
BPE encode map; no broadcast hint, the vocab grows with the corpus);
the query side is a few dozen token rows → broadcast into the scoring
join. The dense form scores every (doc token, query token) pair —
that's the exact semantic definition and is quadratic in tokens, so at
100 TB prune candidates first (BM25 or single-vector ANN top-N, then
late-interaction re-rank over N docs — the standard two-stage
deployment; this operator IS that second stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.embed import hash_embed_col
from ..functions.text import tokenize
from ..functions.vectors import dot_double


def late_interaction_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """Top-``k`` docs per query under Σ-maxsim late interaction.

    Output: (query_id, doc_id, rank, score) — score is the raw double
    sum of per-query-token maxima (round at the consumer if hashing);
    rank breaks ties on doc_id. Duplicate query tokens count once per
    POSITION (the ColBERT convention); duplicate document tokens
    collapse (a max can't change by repeating a candidate).
    """
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(tokenize(F.col(query_text_col))).alias("q_pos", "tok"),
    ).withColumn("_qe", hash_embed_col(F.col("tok"), dim))
    dt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("tok"),
    )
    # hash each DISTINCT corpus token once (vocabulary table), then join
    # back — same amortization as the BPE encode map; no broadcast hint
    vocab = dt.select("tok").distinct().withColumn(
        "_de", hash_embed_col(F.col("tok"), dim)
    )
    dte = dt.join(vocab, "tok").select("doc_id", "_de")
    sims = dte.crossJoin(
        F.broadcast(qt.select("query_id", "q_pos", "_qe"))
    ).select(
        "query_id",
        "q_pos",
        "doc_id",
        dot_double(F.col("_de"), F.col("_qe")).alias("_sim"),
    )
    maxsim = sims.groupBy("query_id", "q_pos", "doc_id").agg(
        F.max("_sim").alias("_m")
    )
    scored = maxsim.groupBy("query_id", "doc_id").agg(
        F.sum("_m").alias("score")
    )
    # rank on the ROUNDED score: exact-token matches give many docs
    # near-identical sums that differ only in summation-order ulps
    # (engine-to-engine AND run-to-run under parallel aggregation), so a
    # raw-double ordering is nondeterministic exactly where ties are
    # common; 4-decimal ties then break on doc_id
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 4)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )
