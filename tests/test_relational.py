"""Every registered SQL-expressible query must hash-match its DuckDB oracle
at sf0.001 (fast) — the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from kafka_workers_spark.queries import load_all
from tests.oracle import compare_query

REGISTRY = load_all()
SQL_CHECKED = [s for s in REGISTRY.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SQL_CHECKED, ids=[s.name for s in SQL_CHECKED])
def test_query_matches_oracle(spark, sf_dir, spec):
    compare_query(spark, sf_dir, spec)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql().keys()) <= set(e.queries().keys())
