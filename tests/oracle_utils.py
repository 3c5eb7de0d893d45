"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row count + sorted-column order-insensitive value comparison."""

from __future__ import annotations

import math
import struct

import duckdb
import pandas as pd

from vectorsearch_applications_spark.sources.io import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # bytes / decimals → str for stable compare
            df[c] = df[c].map(lambda v: v if isinstance(v, str) else str(v))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duckdb_con(sf_dir)
    oracle = con.sql(oracle_sql).fetchdf()
    result = spark_df.toPandas()
    assert len(result) == len(oracle), (
        f"row count: spark={len(result)} oracle={len(oracle)}"
    )
    r, o = _normalize(result), _normalize(oracle)
    assert list(r.columns) == list(o.columns), (
        f"columns: spark={list(r.columns)} oracle={list(o.columns)}"
    )
    assert list(r.dtypes) == list(o.dtypes), (
        f"dtypes: spark={list(r.dtypes)} oracle={list(o.dtypes)}"
    )
    for c in r.columns:
        rv, ov = r[c].tolist(), o[c].tolist()
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(rv, ov))
            if not _eq(a, b)
        ]
        assert not mism, f"column {c}: first mismatches {mism[:5]}"


def _bits(x: float) -> bytes:
    # canonicalize every NaN payload to the one NaN; -0.0 keeps its sign
    # bit and so DIFFERS from +0.0 — exactly like the driver's value hash
    if math.isnan(x):
        x = float("nan")
    return struct.pack("<d", x)


def _eq(a, b) -> bool:
    """Bitwise float equality (after NaN canonicalization) so the local
    gate predicts the driver's hash compare — an |a-b|<eps tolerance let
    the knn_search -0.0 red row through two rounds running."""
    if isinstance(a, float) and isinstance(b, float):
        return _bits(a) == _bits(b)
    return a == b
