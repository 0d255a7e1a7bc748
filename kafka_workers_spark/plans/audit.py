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
    partition_filters: list[str] = field(default_factory=list)
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

    def has_partition_filter(self, fragment: str) -> bool:
        """True if a scan prunes Hive partitions on `fragment` — the
        directory-level skip (whole partitions never listed), a stronger
        cut than row-group PushedFilters."""
        return any(fragment in f for f in self.partition_filters)


def audit(df: DataFrame) -> PlanAudit:
    """Execute EXPLAIN FORMATTED and extract plan facts."""
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    a = PlanAudit(text=text)
    def split_filters(inner: str) -> list[str]:
        # paren-aware top-level comma split: GreaterThan(x,1.0) and
        # In(c, [a,b]) are single entries, not comma fragments
        parts, depth, cur = [], 0, []
        for ch in inner:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur).strip())
        return [p for p in parts if p]

    for line in text.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                a.pushed_filters.extend(split_filters(inner))
        elif line.startswith("PartitionFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                a.partition_filters.extend(split_filters(inner))
        elif line.startswith("ReadSchema:"):
            a.read_schemas.append(line.split(":", 1)[1].strip())
    # count only the detail-section node headers ("(N) NodeName") so the
    # tree line + detail line of one node aren't double-counted — each
    # node prints twice in EXPLAIN FORMATTED
    def nodes(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", text, re.MULTILINE))

    a.broadcast_joins = nodes("BroadcastHashJoin")
    a.sortmerge_joins = nodes("SortMergeJoin")
    a.shuffled_hash_joins = nodes("ShuffledHashJoin")
    a.nested_loop_joins = nodes("BroadcastNestedLoopJoin")
    a.cartesian_products = nodes("CartesianProduct")
    a.exchanges = nodes("Exchange")
    a.reused_exchanges = nodes("ReusedExchange")
    # formatted mode renders codegen as "[codegen id : N]" annotations,
    # never the literal WholeStageCodegen node name
    a.codegen_stages = len(set(re.findall(r"\[codegen id : (\d+)\]", text)))
    a.python_evals = nodes("ArrowEvalPython") + nodes("BatchEvalPython")
    return a
