"""Scalar/aggregate function surface.

The reference has NO scalar functions (payloads are opaque bytes —
SURVEY.md §2 Table B): the engine's function surface IS
``pyspark.sql.functions``, exposed natively. This package holds what
Spark's raw surface does not shape for the pipeline: cross-engine
deterministic aggregation helpers and the sampling coin
(:mod:`.determinism`) used by the oracle-checked queries, and the
mergeable-sketch rollup pattern (:mod:`.sketches` — HLL distinct
sketches, approximate quantiles, heavy hitters). Hashing primitives live
in ``operators.dedup`` / ``streaming.subpartition``.
"""

from kafka_workers_spark.functions.determinism import dsum, sample_coin, sql_dsum, sql_sample_coin

__all__ = ["dsum", "sample_coin", "sql_dsum", "sql_sample_coin"]
