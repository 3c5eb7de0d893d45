"""Vector math over plain ``array<float|double>`` columns — no UDFs.

Spark has no vector type for DataFrames; a float array is the right
shuffle-friendly representation (SURVEY.md §1.1). Dot / cosine are
higher-order-function expressions (``zip_with`` + ``aggregate``) that run
JVM-side inside codegen — at 100 TB this keeps the kNN scoring scan in the
JVM instead of round-tripping to Python.

Reference semantics: embeddings are unit-norm MiniLM vectors, so cosine
similarity == dot product and Weaviate's ``distance`` = 1 − cos
(``src/database/weaviate_interface_v4.py:246-287``, SURVEY Q2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision, left-to-right (matches the DuckDB
    oracle's list_dot_product to ~1e-12)."""
    return dot_double(_as_double(a), _as_double(b))


def sql_ident(name: str) -> str:
    """Backtick-quoted TOP-LEVEL column reference for the SQL-fragment
    construction fast paths (r11 advice: embedded backticks must be
    doubled or a hostile name breaks the parse). Note the quoted form
    binds a literal top-level name — a dotted nested-field reference
    that F.col() would resolve does NOT resolve through it; callers
    needing nested fields must pass a Column and take the DataFrame-API
    path."""
    return f"`{name.replace('`', '``')}`"


def isin_ints(col_name: str, values) -> Column:
    """``col IN (<values>)`` parsed as ONE SQL expression when every
    value is a plain Python int (bool excluded) — ``Column.isin(list)``
    converts the literal list element-by-element over py4j (~4 round
    trips per value: a 500-id candidate re-entry measured 2,029 round
    trips ≈ 0.4 s of pure construction chatter on this host), while the
    parsed form is one round trip (guide §7.3 planning cost). Catalyst
    builds the same In(col, literals) predicate either way (integer
    literals coerce to the column's integral type in both paths), so
    results are bitwise identical — pinned by the oracle preflight on
    every consumer. Empty values short-circuit to lit(False); any
    non-int value falls back to Column.isin (strings would need
    escaping, float repr can drift)."""
    vals = list(values)
    if not vals:
        return F.lit(False)
    if all(type(v) is int for v in vals):
        ident = f"`{col_name.replace('`', '``')}`"
        return F.expr(f"{ident} IN ({','.join(map(str, vals))})")
    return F.col(col_name).isin(vals)


def dot_double_sql(a: str, b: str) -> str:
    """SQL-fragment twin of :func:`dot_double` for hot construction
    paths: callers embed it in ONE ``F.expr``/``selectExpr`` string so
    the whole scoring expression parses JVM-side in a single py4j round
    trip instead of assembling ~25 tree nodes at one round trip each
    (r11 optimization: ~2 ms per round trip on the bench host — builder
    chatter dominated several interactive-search walls; guide §7.3
    driver-side planning cost). The parsed tree is the same zip_with +
    left-fold aggregate seeded 0.0D, so results are bitwise identical
    (pinned by the ANN/PQ oracle rows and test_operators.py)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )


def cast_double_sql(arr: str) -> str:
    """SQL-fragment twin of :func:`_as_double`."""
    return f"transform({arr}, x -> cast(x as double))"


def dot_double(a: Column, b: Column) -> Column:
    """``dot`` for arrays ALREADY cast to double — skips the per-
    evaluation element casts. In a pair join the cast otherwise re-runs
    per PAIR (three array allocations each time); projecting the cast
    once per ROW before the join and folding raw here measured
    2.24 s → 1.37 s on the semantic-dedup pair join at sf0.1 (same-
    session A/B). Identical values and fold order, so bitwise-equal
    results."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column, b: Column, assume_normalized: bool = True) -> Column:
    if assume_normalized:
        return dot(a, b)
    norm = lambda v: F.sqrt(dot(v, v))  # noqa: E731
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column, assume_normalized: bool = True) -> Column:
    """Weaviate-style distance = 1 − cosine (lower is better; the notebooks
    flip it back with ``1 - distance``, nb4 cell 19)."""
    return F.lit(1.0) - cosine_similarity(a, b, assume_normalized)


def l2_normalize(arr: Column) -> Column:
    """Unit-normalize once at index-build time so query-time cosine is a
    plain dot product (cheapest possible inner loop at scale)."""
    d = _as_double(arr)
    norm = F.sqrt(
        F.aggregate(F.transform(d, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return F.transform(d, lambda x: x / norm)
