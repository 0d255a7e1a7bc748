"""Interactive dev harness: `python -i scripts/dev.py` gives a warm Spark
session plus `check('query', ...)` oracle comparison at any SF."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kafka_workers_spark.queries as Q
from kafka_workers_spark import WorkersConfig, build_session
from tests.oracle import compare_query

spark = build_session(WorkersConfig(app_name="dev", shuffle_partitions=8))


def check(*names: str, sf: str = "/root/testdata/sf0.001") -> None:
    reg = Q.load_all()
    for n in names or reg:
        s = reg[n]
        if s.oracle is None:
            print(n, "rows-only:", s.fn(spark, sf).count())
            continue
        try:
            compare_query(spark, sf, s)
            print(n, "OK")
        except Exception as e:  # noqa: BLE001
            print(n, "FAIL", str(e)[:500])


def reload_queries() -> None:
    """Re-import engine modules after an edit (registry rebuilt)."""
    for m in [m for m in sys.modules if m.startswith("kafka_workers_spark")]:
        del sys.modules[m]
    import kafka_workers_spark.queries as Q2

    globals()["Q"] = Q2


print("ready: check(*names, sf=...), reload_queries()")
