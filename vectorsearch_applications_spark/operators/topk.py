"""Top-k / limit / budget-truncation operators (SURVEY.md §2.7).

T1/T2 — per-group top-k: window row_number ≤ k. Catalyst compiles the
global case to TakeOrderedAndProject (no full sort); the grouped case does
per-partition partial top-k before the shuffle thanks to the rank-limit
pushdown (WindowGroupLimit) — verified in the plan, see tests.

T3 — token-budget truncation: the reference iteratively drops the
lowest-ranked hit until the assembled prompt fits a token budget
(``src/app_functions.py:47-88``, threshold 2500 at ``rag_ui.py:115``).
Set-based re-expression: cumulative token sum in rank order, keep the prefix
within budget — one window pass instead of a retokenize-per-iteration loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def token_budget_truncate(
    hits: DataFrame,
    token_col: str,
    budget: int,
    group_cols: list[str] = ("query_id",),
    rank_col: str = "rank",
) -> DataFrame:
    """Keep, per group in rank order, the longest prefix whose cumulative
    ``token_col`` stays ≤ budget. The first hit is always kept (the
    reference never returns an empty context)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc(rank_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        hits.withColumn("_cum_tokens", cum)
        .filter((F.col("_cum_tokens") <= budget) | (F.col(rank_col) == 1))
        .drop("_cum_tokens")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk sequence packing (pretraining batch prep): each
    shard's documents are concatenated in deterministic id order and cut
    into training sequences of exactly ``budget`` tokens (last sequence of
    a shard may be partial; documents straddle cut points, GPT-style).

    Sharding makes the packing scale-shaped: a GLOBAL concat order would
    need a single-partition cumulative sum over the corpus, while per-shard
    streams (how real pipelines feed N data-loader workers) parallelize
    the window — one shuffle on the md5 shard key, cumsum within shard.

    Output: (shard, bin_id, n_docs, bin_tokens) — one row per sequence in
    which at least one document STARTS (a document longer than ``budget``
    swallows its following cut points; those all-middle sequences carry no
    row), with the sequence's token count (= budget except the shard's
    final partial). All integer arithmetic; the md5 shard hash and
    exclusive cumsum reproduce exactly in the SQL oracle.
    """
    from ..functions.text import stable_hash64

    shard = F.pmod(
        stable_hash64(F.col(id_col).cast("string")), F.lit(n_shards)
    ).alias("shard")
    d = docs.select(
        shard, F.col(id_col).alias("_id"), F.col(token_col).alias("_toks")
    ).filter(F.col("_toks") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.asc("_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_cum0", F.coalesce(F.sum("_toks").over(w), F.lit(0)))
    starts = d.groupBy(
        "shard", F.expr(f"_cum0 DIV {budget}").alias("bin_id")
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    totals = d.groupBy("shard").agg(F.sum("_toks").alias("_total"))
    return (
        starts.join(totals, "shard")
        .select(
            "shard",
            "bin_id",
            "n_docs",
            F.least(
                F.lit(budget).cast("bigint"),
                F.col("_total") - F.col("bin_id") * budget,
            ).alias("bin_tokens"),
        )
    )
