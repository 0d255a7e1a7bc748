"""Local replica of the driver's t2 duckdb-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by all columns).
Exact equality for every cell — floats included — because the driver
hash-compares values; our DECIMAL-summation discipline is what makes exact
float equality achievable across engines.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import pandas as pd

from kafka_workers_spark.sources.files import TABLE_NAMES


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — exact match required
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare_query(spark, sf_dir: str, spec) -> None:
    """Assert Spark result == DuckDB oracle result for one QuerySpec."""
    sdf = spec.fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        odf = con.execute(spec.oracle).fetch_df()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{spec.name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{spec.name}: row count spark={len(sdf)} oracle={len(odf)}"
    s_rows, o_rows = canonicalize(sdf), canonicalize(odf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{spec.name}: value mismatch, first diffs: {diffs}")
