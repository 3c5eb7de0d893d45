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
