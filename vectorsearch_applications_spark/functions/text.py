"""Text scalar functions (SURVEY.md §2.9) — all JVM-side built-ins.

Tokenization contract (FIXTURES.md determinism rules): ``lower`` + regexp
split on ``\\W+`` + drop empties. This is the documented token model for the
BM25 / dedup / text-analysis operators so a SQL oracle can reproduce TF/DF
exactly. (The reference's BM25 tokenizer lives server-side in Weaviate —
``src/database/weaviate_interface_v4.py:201-244`` only ships the query — so
the token model is ours to define; we pick the simplest portable one.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regexp used on BOTH engines (Spark `split`, DuckDB `regexp_split_to_array`).
# Kept as \W+ on purpose: the semantically-identical character class
# [^a-zA-Z0-9_]+ measured 3-5x SLOWER on split-heavy plans (r12 —
# quality_composite_rank 13 -> 61 s: StringSplit re-compiles its pattern
# per evaluation, so pattern SOURCE LENGTH is a per-row cost). The SQL
# fast paths embed it via sql_token_pattern_literal(), which escapes per
# the session's parser conf (r11 advice: '\\W+' only parses to \W+ while
# spark.sql.parser.escapedStringLiterals is false, the default).
TOKEN_PATTERN = r"\W+"


def sql_token_pattern_literal() -> str:
    """TOKEN_PATTERN as it must appear inside a SQL string literal for
    the ACTIVE session: backslashes doubled under the default parser
    (backslash is an escape character there), raw under the legacy
    spark.sql.parser.escapedStringLiterals=true conf."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    esc = (
        s is not None
        and s.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        == "true"
    )
    return TOKEN_PATTERN if esc else TOKEN_PATTERN.replace("\\", "\\\\")


def tokenize(col: Column | str) -> Column:
    """lower → split on \\W+ → drop empty strings. Returns array<string>.

    Stays inside whole-stage codegen (no UDF): split + filter are
    Catalyst expressions.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_PATTERN), lambda x: x != F.lit(""))


def tokenize_sql(text_sql: str) -> str:
    """SQL-fragment twin of :func:`tokenize` for the §12 construction
    fast paths — same split/filter tree and the SAME compiled pattern
    (escaped per the active session's parser conf), so token arrays are
    bitwise identical to the Column form."""
    return (
        f"filter(split(lower({text_sql}), "
        f"'{sql_token_pattern_literal()}'), x -> x != '')"
    )


def token_count(col: Column | str) -> Column:
    """Whitespace/punctuation token count (reference A6 ``get_token_count``,
    ``src/llm/llm_utils.py:6-28`` — tiktoken there; the portable token model
    here)."""
    return F.size(tokenize(col))


# GPT-2-style pretokenizer, simplified to the alternation both Java regex
# (Spark) and RE2 (DuckDB) evaluate identically leftmost-first: contraction
# tail | space?+letters | space?+digits | space?+other-punct run. Whitespace
# between matches is skipped by extract_all, so no \\s+ branch is needed.
BPE_PATTERN = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_tokenize(col: Column | str) -> Column:
    """BPE-ish pretokenization (reference A6 counts tokens with tiktoken,
    ``src/llm/llm_utils.py:6-28``; this is the portable regex analog of its
    pretokenizer stage). lower → leftmost-first alternation scan. Returns
    array<string>; stays in codegen (regexp_extract_all is a Catalyst
    expression, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pretokenizer — the LLM-billing-shaped
    counter (punctuation runs and contraction tails count as tokens, unlike
    ``token_count`` which drops them)."""
    return F.size(bpe_tokenize(col))


def stable_hash64(col: Column, seed: int | None = None) -> Column:
    """Engine-portable deterministic 32-bit-range hash as BIGINT.

    ``conv(substr(md5(x), 1, 8), 16, 10)`` — reproducible in DuckDB as
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``. Used by MinHash/SimHash so
    the dedup operators are oracle-checkable. md5 is a Catalyst built-in →
    still codegen, no Python.
    """
    if seed is not None:
        col = F.concat(col, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
