"""Plan audit: parse the formatted physical plan into assertable facts."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    """Facts extracted from one DataFrame's physical plan."""

    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    exchanges: int = 0
    reused_exchanges: int = 0
    codegen_stages: int = 0
    python_evals: int = 0

    def scans_only_columns(self, *cols: str) -> bool:
        """True if every parquet scan reads a subset of `cols`."""
        want = set(cols)
        for schema in self.read_schemas:
            got = set(re.findall(r"(\w+):", schema))
            if not got <= want:
                return False
        return True

    def has_pushed_filter(self, fragment: str) -> bool:
        return any(fragment in f for f in self.pushed_filters)


def audit(df: DataFrame) -> PlanAudit:
    """Execute EXPLAIN FORMATTED and extract plan facts."""
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    a = PlanAudit(text=text)
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                a.pushed_filters.extend(p.strip() for p in inner.split(","))
        elif line.startswith("ReadSchema:"):
            a.read_schemas.append(line.split(":", 1)[1].strip())
    a.broadcast_joins = len(re.findall(r"BroadcastHashJoin", text))
    a.sortmerge_joins = len(re.findall(r"SortMergeJoin", text))
    a.shuffled_hash_joins = len(re.findall(r"ShuffledHashJoin", text))
    a.nested_loop_joins = len(re.findall(r"BroadcastNestedLoopJoin", text))
    a.cartesian_products = len(re.findall(r"CartesianProduct", text))
    # count only the detail-section node headers so tree + detail lines of
    # the same node aren't double-counted
    a.exchanges = len(re.findall(r"^\(\d+\) Exchange\b", text, re.MULTILINE))
    a.reused_exchanges = len(re.findall(r"^\(\d+\) ReusedExchange\b", text, re.MULTILINE))
    a.codegen_stages = len(re.findall(r"WholeStageCodegen", text))
    a.python_evals = len(re.findall(r"ArrowEvalPython|BatchEvalPython", text))
    return a
