"""Deterministic stratified sampling — corpus rebalancing for training data.

Pre-training pipelines routinely downsample dominant strata (language,
source, domain) to a target mixture. Spark's ``df.sampleBy`` does exactly
this but draws from a seeded RNG whose sequence depends on partitioning —
re-running after a repartition changes the sample. ``stratified_sample``
instead keeps a row iff ``hash(id || salt) mod D < fraction·D`` with the
engine-portable md5 hash from functions/text.py (the same primitive behind
train_val_split and the MinHash family), so the sample is:

- a pure narrow filter — no shuffle, no RNG state; at 100 TB it rides the
  scan and Catalyst can push surviving-column pruning through it;
- stable under repartition/retry/speculative re-execution (a property
  seeded RNG sampling does NOT have on a real cluster, where a retried
  task re-draws its randomness);
- reproducible bit-for-bit in any engine with md5 (oracle-checkable);
- monotone in the fraction: raising a stratum's rate only ADDS rows
  (the kept set at 10% is a subset of the kept set at 20%), which makes
  mixture sweeps comparable run-to-run.

Reference scope: the reference has no sampling operator (its corpus is one
podcast's transcripts); this is part of the training-data-pipeline
extension alongside dedup and language-ID.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import stable_hash64

_DENOM = 10_000  # fraction resolution: 0.01%


def stratum_threshold(
    stratum_col: str, fractions: dict[str, float], default: float = 0.0
) -> Column:
    """CASE mapping stratum → keep-threshold in [0, _DENOM]."""
    expr: Column = F.lit(int(round(default * _DENOM)))
    for k in sorted(fractions, reverse=True):
        expr = F.when(
            F.col(stratum_col) == k, F.lit(int(round(fractions[k] * _DENOM)))
        ).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "#sample",
    default: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability fractions[s],
    deterministically in the row id. Strata missing from ``fractions``
    keep at ``default`` (0 = drop)."""
    bucket = (
        stable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        % _DENOM
    )
    return df.filter(bucket < stratum_threshold(stratum_col, fractions, default))


def stratified_sample_oracle_where(
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "#sample",
    default: float = 0.0,
) -> str:
    """DuckDB WHERE clause computing the identical keep decision —
    generated from the same fractions dict as the Spark filter."""
    whens = " ".join(
        f"WHEN '{k}' THEN {int(round(fractions[k] * _DENOM))}"
        for k in sorted(fractions)
    )
    case = f"CASE {stratum_col} {whens} ELSE {int(round(default * _DENOM))} END"
    h = f"('0x' || substr(md5({id_col}::VARCHAR || '{salt}'), 1, 8))::BIGINT"
    return f"{h} % {_DENOM} < {case}"


def temperature_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "#temp",
) -> DataFrame:
    """Square-root temperature downsampling of dominant strata (the
    multilingual-pretraining mixture trick, T = 1/2): stratum s keeps rows
    with probability sqrt(n_s / n_max), flattening the source distribution
    toward the smaller strata while never *up*-sampling anyone.

    The keep-fraction is computed IN the plan (one map-side-combined count
    per stratum, broadcast back) — no driver collect, so the operator
    composes into a single declarative pipeline at any scale. The per-row
    decision reuses the md5-threshold machinery of ``stratified_sample``
    (repartition/retry-stable, engine-portable). sqrt and the int64→double
    division are correctly-rounded IEEE ops in any engine, so the
    thresholds — unlike a general pow(n, T), whose libm rounding varies —
    reproduce bitwise in the SQL oracle.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    nmax = counts.agg(F.max("_n").alias("_nmax"))
    thresholds = counts.crossJoin(F.broadcast(nmax)).select(
        stratum_col,
        F.floor(
            F.sqrt(F.col("_n") / F.col("_nmax")) * _DENOM
        ).alias("_th"),
    )
    bucket = (
        stable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        % _DENOM
    )
    return (
        df.join(F.broadcast(thresholds), stratum_col)
        .filter(bucket < F.col("_th"))
        .drop("_th")
    )


def temperature_resample_oracle_sql(
    table: str,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "#temp",
    select: str = "*",
) -> str:
    """DuckDB query making the identical keep decision (same md5 bucket,
    same sqrt threshold) — generated from the same parameters."""
    h = f"('0x' || substr(md5(t.{id_col}::VARCHAR || '{salt}'), 1, 8))::BIGINT"
    return f"""
WITH counts AS (
  SELECT {stratum_col} AS s, count(*) AS n FROM {table} GROUP BY {stratum_col}
),
th AS (
  SELECT s, floor(sqrt(n::DOUBLE / (SELECT max(n) FROM counts)) * {_DENOM}) AS th
  FROM counts
)
SELECT {select} FROM {table} t JOIN th ON th.s = t.{stratum_col}
WHERE {h} % {_DENOM} < th.th
"""
