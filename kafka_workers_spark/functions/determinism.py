"""Cross-engine deterministic aggregation.

Floating-point addition is not associative, so a parallel SUM over DOUBLE
differs between engines (and between runs, as partitioning changes) in the
last bits. Every oracle-checked aggregate in this engine therefore sums
through DECIMAL — exact, associative, partition-order-independent — and
casts back to DOUBLE at the end. The same discipline applies at 100 TB:
decimal partial aggregates make results reproducible across cluster sizes
and AQE re-plans, at single-digit % cost over double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent sum of a double column (exact decimal arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    """ANSI-SQL rendering of :func:`dsum` for the DuckDB oracles."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sample_coin(id_col: str = "doc_id") -> Column:
    """Deterministic per-row coin in [0, 100): first 15 hex chars of
    md5(id) as an integer, mod 100 — non-negative (15 hex chars < 2^60),
    identical in Spark (conv base-16) and DuckDB ('0x' cast,
    :func:`sql_sample_coin`). No RNG state, so re-runs and backfills
    sample identical rows — the reproducibility contract of a production
    sampling pass. Shared by queries/corpus.py and pipeline.py so the two
    can never drift."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )


def sql_sample_coin(id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`sample_coin`."""
    return f"CAST('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15) AS BIGINT) % 100"
