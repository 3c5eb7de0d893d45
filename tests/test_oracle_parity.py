"""Run every registered query against its DuckDB oracle — the same gate the
driver applies at sf0.01, run here at sf0.001 for speed (sf0.01 via
SPARK_GRAFT_PARITY_SF env)."""

from __future__ import annotations

import os

import pytest

from vectorsearch_applications_spark.queries import get_oracles, get_queries

from .oracle_utils import compare

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

_oracles = get_oracles()
_queries = get_queries()


@pytest.mark.parametrize("name", sorted(_oracles))
def test_oracle_parity(spark, name):
    compare(_queries[name](spark, PARITY_SF), _oracles[name], PARITY_SF)


@pytest.mark.parametrize("name", sorted(set(_queries) - set(_oracles)))
def test_rows_only_queries_run(spark, name):
    df = _queries[name](spark, PARITY_SF)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
