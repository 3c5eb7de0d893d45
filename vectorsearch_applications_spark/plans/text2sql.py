"""Text2SQL execution surface (SURVEY.md Q6 / S9 / §3.3).

The reference executes LLM-generated SQL on a sqlite table
(``notebooks/8-Text2SQL_Week3.ipynb`` cell 51: text2sql →
``get_sqldb_response`` → humanize). Here the generated SQL runs on
``spark.sql`` against registered temp views — Spark's parser/Catalyst
replace sqlite wholesale, and the full surface the reference's prompt
constrains to (SELECT/COUNT/MAX, LIKE '%x%', GROUP BY … HAVING, ORDER BY …
LIMIT — cell 29 + ``data/rl_sql_train_queries.json``) is native.

Guardrail (SURVEY §3.3): the generated string is validated as a single
SELECT-only statement before execution — LLM output is untrusted input.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class SqlGuardError(ValueError):
    pass


_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|drop|create|alter|merge|truncate|grant|revoke|"
    r"copy|attach|pragma|set|call|refresh|msck|load|unload|analyze|cache|"
    r"uncache|clear|add|reset|use|describe|show|explain)\b",
    re.IGNORECASE,
)


def validate_select_only(sql: str) -> str:
    """Return the cleaned statement or raise SqlGuardError.

    The keyword / semicolon scan runs with string literals blanked out so
    legitimate queries like ``WHERE c LIKE '%update%'`` or a ``';'``
    inside a literal are not rejected; the returned (executable) statement
    keeps its literals.
    """
    cleaned = re.sub(r"--[^\n]*", " ", sql)
    cleaned = re.sub(r"/\*.*?\*/", " ", cleaned, flags=re.DOTALL)
    cleaned = cleaned.strip().rstrip(";").strip()
    # blank out single-quoted literals ('' escapes included) for scanning
    scannable = re.sub(r"'(?:[^']|'')*'", "''", cleaned)
    if ";" in scannable:
        raise SqlGuardError("multiple statements are not allowed")
    if not re.match(r"^(select|with)\b", scannable, re.IGNORECASE):
        raise SqlGuardError("only SELECT statements are allowed")
    if _FORBIDDEN.search(scannable):
        raise SqlGuardError("statement contains a forbidden keyword")
    return cleaned


def run_guarded_sql(spark: SparkSession, sql: str) -> DataFrame:
    return spark.sql(validate_select_only(sql))


_SYSTEM_MESSAGE = (
    "Your main function is to generate flawless SQL queries from plain "
    "text language. Return the SQL as a single command with no newlines "
    "and nothing else."
)
_USER_TEMPLATE = "PLAIN TEXT QUERY: {query} SQL:"


def text2sql_generate(questions: DataFrame, acomplete_fn=None) -> DataFrame:
    """NL→SQL generation stage (reference nb8 cells 49-51: system + user
    prompt into the LLM, SQL string back). Adds ``generated_sql`` via the
    F3 egress operator; ``acomplete_fn`` injects the deterministic stub in
    tests or the litellm-backed call in deployment. Expects a ``question``
    column; passes every other column through."""
    from pyspark.sql import functions as F

    from ..operators.llm import llm_complete

    prompts = questions.select(
        "*",
        F.lit(_SYSTEM_MESSAGE).alias("system_message"),
        F.concat(
            F.lit(_USER_TEMPLATE.split("{query}")[0]),
            F.col("question"),
            F.lit(_USER_TEMPLATE.split("{query}")[1]),
        ).alias("user_message"),
    )
    return llm_complete(
        prompts, acomplete_fn=acomplete_fn, out_col="generated_sql"
    ).drop("system_message", "user_message")


def text2sql_pipeline(
    spark: SparkSession, question: str, acomplete_fn=None
) -> DataFrame:
    """End-to-end Q6: generate → guard → execute. One statement per call
    (the reference's interactive shape); the generated string is untrusted
    input and always passes through :func:`validate_select_only`."""
    from ..sources.io import one_slice_df

    q = one_slice_df(spark, [(question,)], "question string")
    generated = text2sql_generate(q, acomplete_fn=acomplete_fn)
    sql = generated.select("generated_sql").head()["generated_sql"]
    return run_guarded_sql(spark, sql)
