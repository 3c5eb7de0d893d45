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
