"""Physical-plan inspection and assertions.

The reference has no optimizer to audit (SURVEY.md §4.1); on Spark the
engine's performance contract is that Catalyst's optimizations actually
fire. This package turns ``df.explain()`` into assertable facts — tests
and operators use it to pin: filters pushed to the parquet scan, column
pruning (ReadSchema), broadcast joins on dimension tables, whole-stage
codegen coverage, and the absence of cartesian products.
"""

from kafka_workers_spark.plans.audit import PlanAudit, audit

__all__ = ["PlanAudit", "audit"]
