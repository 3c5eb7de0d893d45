"""PII scrubbing for training-corpus curation.

Large-scale pretraining pipelines redact personal identifiers before
training (C4/Dolma-style rule-based scrubbing — public recipes). This is a
pure projection: chained ``regexp_replace`` expressions that run JVM-side
inside whole-stage codegen — zero shuffle, zero Python, scan-speed at
100 TB.

Patterns are kept to the RE2 ∩ java.util.regex common dialect (character
classes, bounded repeats, ``\\b``, ``\\d``) so the Spark plan and the
DuckDB oracle scrub byte-identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: emails before digit-runs (an email's local part may contain
# digits), phones before bare digit-runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digit_run", r"\b\d{9,}\b", "<NUMBER>"),
]


def scrub_text(col: Column) -> Column:
    """Replace every PII pattern with its placeholder token, in the fixed
    PII_PATTERNS order."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def token_count(col: Column, token: str) -> Column:
    """Exact occurrence count of a literal placeholder token — computed as
    a length delta so it stays a codegen expression (no regexp second
    pass), and identically expressible in ANSI SQL for the oracle."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(""))))
        / F.lit(len(token))
    ).cast("bigint")


def scrub_sql(expr: str) -> str:
    """The DuckDB-side equivalent of scrub_text over a SQL expression."""
    out = expr
    for _, pattern, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def token_count_sql(expr: str, token: str) -> str:
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{token}', '')))"
        f" / {len(token)} AS BIGINT)"
    )


__all__ = [
    "PII_PATTERNS",
    "scrub_text",
    "token_count",
    "scrub_sql",
    "token_count_sql",
]
