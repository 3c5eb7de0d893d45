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
