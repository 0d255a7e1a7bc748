"""Replicate the driver's full per-round gate locally, in one command:

    python scripts/verify_all.py [sf_dir]

Builds a VANILLA session (no engine defaults — the driver harness builds
its own), smoke-checks ``entry()``, then runs every registered query
against its DuckDB oracle at the given SF (default: the driver's sf0.01)
and prints one line per query plus a summary. Exit code 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .appName("verify_all")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from kafka_workers_spark.queries import DRIVER_QUERY_WINDOW, load_all
    from tests.oracle import compare_query

    assert entry_mod.entry(spark).count() > 0, "entry() smoke failed"
    registry = load_all()
    if len(registry) > DRIVER_QUERY_WINDOW:
        print(f"FATAL: registry {len(registry)} > driver window {DRIVER_QUERY_WINDOW}")
        return 1

    failures = []
    for name, spec in registry.items():
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                status = f"rows-only ({n})"
            else:
                compare_query(spark, sf_dir, spec)
                status = "OK"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL {str(exc)[:160]}"
            failures.append(name)
        print(f"{name:40s} {time.perf_counter() - t0:6.2f}s  {status}", flush=True)

    print(f"\n{len(registry) - len(failures)}/{len(registry)} green at {sf_dir}")
    if failures:
        print("failures:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
