"""Scalar/aggregate function surface.

The reference has NO scalar functions (payloads are opaque bytes —
SURVEY.md §2 Table B): the engine's function surface IS
``pyspark.sql.functions``, exposed natively. This package holds only what
Spark does not: cross-engine-deterministic aggregation helpers
(:mod:`.determinism`) used by every oracle-checked query, and hashing
primitives live in ``operators.dedup`` / ``streaming.subpartition``.
"""

from kafka_workers_spark.functions.determinism import dsum, sql_dsum

__all__ = ["dsum", "sql_dsum"]
