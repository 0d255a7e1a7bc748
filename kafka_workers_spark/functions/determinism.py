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
