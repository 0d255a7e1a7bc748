"""Physical-plan inspection and assertions.

The reference has no optimizer to audit (SURVEY.md §4.1); on Spark the
engine's performance contract is that Catalyst's optimizations actually
fire. This package turns ``df.explain()`` into assertable facts — tests
and operators use it to pin: filters pushed to the parquet scan, column
pruning (ReadSchema), broadcast joins on dimension tables, whole-stage
codegen coverage, and the absence of cartesian products.
"""

from kafka_workers_spark.plans.audit import PlanAudit, audit

__all__ = ["PlanAudit", "assert_scale_safe", "audit"]


def assert_scale_safe(df, allow_python: bool = False, allow_cartesian: bool = False):
    """Raise if a DataFrame's physical plan violates the engine's scale
    rules (ARCHITECTURE.md §4): CartesianProduct (n² blowup) and — unless
    the operator is deliberately Arrow-batched — Python evaluation in the
    plan. Use it as a pre-flight check on user-composed pipelines; the
    engine's own registry is held to the same rules in
    tests/test_plans.py.
    """
    a = audit(df)
    problems = []
    if a.cartesian_products and not allow_cartesian:
        problems.append(f"{a.cartesian_products} CartesianProduct node(s)")
    if a.python_evals and not allow_python:
        problems.append(f"{a.python_evals} row-at-a-time Python eval node(s)")
    if problems:
        raise AssertionError(
            "plan violates scale rules: " + "; ".join(problems) + "\n" + a.text[:2000]
        )
    return a
