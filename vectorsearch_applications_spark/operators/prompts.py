"""Prompt / context assembly (SURVEY.md F8, T3 downstream).

Reference: ``create_context_blocks`` / ``generate_prompt_series``
(``src/llm/prompt_templates.py:58-97``) formats the top-k reranked hits
into context blocks and a final prompt string per query — driver-side
Python there; one grouped aggregation here.

The LLM generation step itself (F3) is an egress UDF out of engine scope;
the engine's deliverable is the assembled prompt column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TEMPLATE = "Question: {q} Context: {ctx}"
CONTEXT_SEPARATOR = " | "


def assemble_prompts(
    hits: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(query_id, n_context, prompt): hits (query_id, doc_id, rank) joined to
    doc texts, concatenated in rank order into the prompt template.

    collect_list over sorted (rank, text) structs keeps rank order inside
    the aggregation (no second window pass).
    """
    ctx = (
        hits.select("query_id", F.col(id_col).alias("doc_id"), "rank")
        .join(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
            "doc_id",
        )
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_context"),
            F.concat_ws(
                CONTEXT_SEPARATOR,
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rank", "_t"))),
                    lambda s: s._t,
                ),
            ).alias("_ctx"),
        )
    )
    # build the prompt from the module template so the constant is the
    # single configuration point
    before, middle = DEFAULT_TEMPLATE.split("{q}")
    middle, after = middle.split("{ctx}")
    return ctx.join(
        F.broadcast(
            queries.select(
                F.col(query_id_col).alias("query_id"), F.col(query_col).alias("_q")
            )
        ),
        "query_id",
    ).select(
        "query_id",
        "n_context",
        F.concat(
            F.lit(before), F.col("_q"), F.lit(middle), F.col("_ctx"), F.lit(after)
        ).alias("prompt"),
    )
