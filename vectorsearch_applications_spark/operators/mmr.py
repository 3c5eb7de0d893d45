"""Maximal Marginal Relevance diversified top-k re-ranking.

The reference returns the raw similarity-ordered hit list (Weaviate
``near_vector``/``hybrid``, ``src/database/weaviate_interface_v4.py:246-315``)
and leaves redundancy between the top hits to the cross-encoder stage. MMR
(Carbonell & Goldstein, SIGIR '98 — public) is the standard diversification
step between first-stage retrieval and rerank: greedily pick the candidate
maximizing ``lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)``.

Scale shape: MMR is inherently sequential *within one query's candidate
list*, but candidate lists are bounded (first-stage top-N, N ≲ 100) and
queries are independent. So the right 100 TB plan is one shuffle on
query_id followed by per-group greedy selection in an Arrow-batched
``applyInPandas`` — per-group work is O(N²·D) on ≤100 rows, and a billion
queries parallelize across executors. No driver-side loop, no crossjoin.

Determinism: float64 throughout, ties broken by ascending id, so the
selection order is reproducible and oracle-checkable (the DuckDB oracle
unrolls the same greedy argmax as k chained CTE steps).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_diversify(
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rel_col: str = "relevance",
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR top-k per query over a bounded candidate set.

    ``candidates`` must carry the candidate embedding (``vec_col``) and a
    relevance score (``rel_col``, higher is better). Returns one row per
    selected candidate: (query_id, id, mmr_rank, mmr_score) where the
    first pick's score is its relevance and later picks score
    ``lam*rel - (1-lam)*max_sim_to_selected``.
    """
    out_schema = (
        f"{query_id_col} {dict(candidates.dtypes)[query_id_col]}, "
        f"{id_col} {dict(candidates.dtypes)[id_col]}, "
        "mmr_rank int, mmr_score double"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        emb = np.array(pdf[vec_col].to_list(), dtype=np.float64)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        sims = emb @ emb.T  # N × N, N bounded by first-stage top-N
        selected: list[int] = []
        scores: list[float] = []
        mask = np.zeros(n, dtype=bool)
        for _ in range(min(k, n)):
            if not selected:
                cand_scores = rel.copy()
            else:
                max_sim = sims[:, selected].max(axis=1)
                cand_scores = lam * rel - (1.0 - lam) * max_sim
            cand_scores[mask] = -np.inf
            # argmax with ascending-id tie-break: rows are id-sorted, and
            # np.argmax returns the first maximal index.
            best = int(np.argmax(cand_scores))
            selected.append(best)
            scores.append(float(cand_scores[best]))
            mask[best] = True
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[selected].to_numpy(),
                id_col: pdf[id_col].iloc[selected].to_numpy(),
                "mmr_rank": range(1, len(selected) + 1),
                "mmr_score": scores,
            }
        )

    return candidates.groupBy(query_id_col).applyInPandas(pick, out_schema)


def mmr_oracle_sql(
    cand_cte: str,
    k: int = 5,
    lam: float = 0.7,
) -> str:
    """Unrolled greedy-MMR DuckDB oracle over a candidate CTE.

    ``cand_cte`` must define ``cand(query_id, vec_id, rel, emb)`` (emb as
    DOUBLE[]). Emits k chained argmax steps — the sequential semantics the
    Spark operator implements per group — and returns
    (query_id, vec_id, mmr_rank, mmr_score) with mmr_score rounded to 4.
    """
    mu = f"{1.0 - lam!r}"
    parts = [
        cand_cte,
        # step 1: plain relevance argmax
        "sel1 AS (SELECT query_id, vec_id, rel AS mmr FROM cand "
        "QUALIFY row_number() OVER (PARTITION BY query_id "
        "ORDER BY rel DESC, vec_id ASC) = 1)",
        "selall1 AS (SELECT query_id, vec_id FROM sel1)",
    ]
    for i in range(2, k + 1):
        prev = i - 1
        parts.append(
            f"score{i} AS (SELECT c.query_id, c.vec_id, "
            f"{lam!r} * c.rel - {mu} * max(list_dot_product(c.emb, sc.emb)) AS mmr "
            f"FROM cand c JOIN (SELECT s.query_id, c2.emb FROM selall{prev} s "
            "JOIN cand c2 ON c2.query_id = s.query_id AND c2.vec_id = s.vec_id) sc "
            "ON sc.query_id = c.query_id "
            f"WHERE NOT EXISTS (SELECT 1 FROM selall{prev} p "
            "WHERE p.query_id = c.query_id AND p.vec_id = c.vec_id) "
            "GROUP BY c.query_id, c.vec_id, c.rel)"
        )
        parts.append(
            f"sel{i} AS (SELECT query_id, vec_id, mmr FROM score{i} "
            "QUALIFY row_number() OVER (PARTITION BY query_id "
            "ORDER BY mmr DESC, vec_id ASC) = 1)"
        )
        parts.append(
            f"selall{i} AS (SELECT query_id, vec_id FROM selall{prev} "
            f"UNION ALL SELECT query_id, vec_id FROM sel{i})"
        )
    union = " UNION ALL ".join(
        f"SELECT query_id, vec_id, {i} AS mmr_rank, mmr FROM sel{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + f",\npicks AS ({union})\n"
        "SELECT query_id, vec_id, mmr_rank::BIGINT AS mmr_rank, "
        "round(mmr, 4) + 0.0 AS mmr_score FROM picks"
    )


__all__ = ["mmr_diversify", "mmr_oracle_sql"]
