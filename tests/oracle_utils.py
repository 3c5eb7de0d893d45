"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row count + sorted-column order-insensitive value comparison."""

from __future__ import annotations

import math

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
            df[c] = df[c].round(6)
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
    for c in r.columns:
        rv, ov = r[c].tolist(), o[c].tolist()
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(rv, ov))
            if not _eq(a, b)
        ]
        assert not mism, f"column {c}: first mismatches {mism[:5]}"


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) < 1e-9
    return a == b
