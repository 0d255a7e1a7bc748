"""Query registry: the SURVEY.md §2 operator inventory, runnable.

Every implemented operator registers here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an equivalent
ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py`` re-exports this
registry to the driver's correctness harness.

Cross-engine determinism rules (so the driver's order-insensitive
value-hash matches):

- Sums/avgs over double columns go through DECIMAL (exact, associative,
  partition-order-independent) and are cast back to DOUBLE at the end.
  Raw double summation would differ between Spark and DuckDB in the last
  bits because addition order differs.
- Every computed column is aliased identically in the Spark plan and the
  oracle SQL.
- Top-k / limit queries always sort with a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    category: str = "relational"


REGISTRY: dict[str, QuerySpec] = {}

#: Queries rotated OUT of the driver's 50-query window (the window is
#: full — see DRIVER_QUERY_WINDOW). They keep the exact same QuerySpec
#: contract and are held to the same DuckDB oracle locally by
#: tests/test_oracle_extra.py::test_rotated_out_queries_still_match_oracle,
#: so rotating a query between windows never changes its verification,
#: only WHO runs it (driver vs pytest).
EXTRA_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, category: str = "relational", windowed: bool = True
):
    """Decorator: add a query to the driver-checked registry
    (``windowed=True``) or the locally-oracle-checked overflow
    (``windowed=False``)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY or name in EXTRA_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        target = REGISTRY if windowed else EXTRA_REGISTRY
        target[name] = QuerySpec(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


#: The driver's correctness harness checks at most the first 50
#: registrations — the whole registry must fit (pinned by
#: tests/test_relational.py::test_registry_fits_driver_window), and the
#: specialized families register before the relational long tail so a
#: future overflow could only ever push relational variants out.
DRIVER_QUERY_WINDOW = 50


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the registry."""
    from kafka_workers_spark.queries import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        streaming,
        text,
        corpus,
        pipeline_ops,
        relational,
        graph,
        drift,
    )

    return REGISTRY


def load_extra() -> dict[str, QuerySpec]:
    """Import every query module and return the OFF-window registry."""
    load_all()
    return EXTRA_REGISTRY
