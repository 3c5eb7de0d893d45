#!/usr/bin/env python
"""Driver pre-flight: run EVERY registered query against its DuckDB oracle
under a VANILLA SparkSession — exactly the environment the driver grades in
(none of session.py's tuning; default shuffle partitions change float
summation order vs the test session, which is precisely the class of
difference the bitwise hash compare exists to catch).

Usage: python preflight.py [sf_dir] [--only name[,name...]]
(default sf_dir /root/testdata/sf0.01; --only restricts the sweep to the
named queries and prints a row-level diff preview on mismatch — the
single-query debug loop).
Exit code 0 iff every swept query matches rows + schema + bitwise values.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_utils import _eq, _normalize, duckdb_con

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb_con(sf_dir)
    failures: list[str] = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        r = o = None  # per-query frames for the mismatch preview
        try:
            df = fn(spark, sf_dir)
            # Registry lint: the driver's pandas canonicalizer cannot sort
            # array/map/struct columns (r5: embedding_pca_project crashed
            # grading with "unhashable type: 'list'") — every registered
            # query must emit scalar columns only.
            complex_cols = [
                f.name for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                raise TypeError(
                    f"non-scalar output columns {complex_cols} — flatten "
                    "(posexplode/concat_ws) before registering"
                )
            if name not in oracles:
                assert df.count() >= 0
                continue
            r = _normalize(df.toPandas())
            o = _normalize(con.sql(oracles[name]).fetchdf())
            ok = (
                len(r) == len(o)
                and list(r.columns) == list(o.columns)
                and list(r.dtypes) == list(o.dtypes)
                and all(
                    _eq(a, b)
                    for c in r.columns
                    for a, b in zip(r[c].tolist(), o[c].tolist())
                )
            )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            ok = False
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")
        if not ok:
            failures.append(name)
            print(f"FAIL {name}")
            # diff preview only when BOTH sides materialized this
            # iteration (an oracle error after the spark side assigned r
            # would otherwise UnboundLocalError on o and kill the sweep)
            if only is not None and r is not None and o is not None:
                print("spark head:"); print(r.head(5))
                print("oracle head:"); print(o.head(5))
    n_swept = len(only) if only is not None else len(qs)
    print(f"preflight: {n_swept - len(failures)}/{n_swept} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
