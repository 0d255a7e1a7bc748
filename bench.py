#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Per-query timing includes full plan execution (count-style action that
cannot skip work) but not session startup. Each query runs once after a
warmup of the input files' footers; every timed rep (including noise
retries) starts from spark.catalog.clearCache() so persisted frames can
never make a retry cache-assisted, and the JSON records the first run
per query alongside the kept minimum.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_workers_spark import WorkersConfig, build_session
from kafka_workers_spark.queries import load_all, load_extra

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Default roster IS the driver's correctness window (all 50 registered
    # queries, VERDICT r06 #2) — self-syncing across rotations, so a perf
    # regression in any windowed query is always visible in BENCH_r{N}.
    #
    # `--extra` (VERDICT r08 #1) benches the OFF-window registry instead,
    # under the identical cache-honest protocol, so every registered query
    # has a recorded wall time (BENCH_EXTRA_r{N}.json companion) and a
    # cold-path regression in a rotated-out family is visible before it
    # rotates back into the driver window. The driver's own invocation
    # (no args) is unchanged.
    extra = "--extra" in sys.argv[1:]
    registry = load_extra() if extra else load_all()
    metric = "extra_queries_total" if extra else "headline_queries_total"
    names = list(registry)

    spark = build_session(
        WorkersConfig(
            app_name="kafka_workers_spark_bench",
            extra_confs={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
        )
    )
    # Warmup pass at the smallest SF: JIT/codegen compilation and parquet
    # footer caching dominate cold first-query latency; the timed pass
    # should measure plan execution, not JVM warmup.
    warmup_dir = "/root/testdata/sf0.001"
    for name in names:
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, warmup_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        print(f"warmup {name} {time.perf_counter() - t0:.2f}s", file=sys.stderr, flush=True)

    def run_once(name: str) -> float:
        # Cache-honest timing (VERDICT r07 #2): several operators persist
        # intermediate frames, and Spark's CacheManager serves retries of
        # the identical plan from cache — min-of-retries would then keep
        # the cache-assisted time and hide a cold-path regression. Every
        # timed rep starts from an empty cache.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in names:
        timings[name] = first_run[name] = run_once(name)
        print(f"timed {name} {timings[name]:.2f}s", file=sys.stderr, flush=True)

    # This environment shows rare multi-minute scheduler stalls (~95% idle
    # CPU) on random queries, plus ±several-second jitter on individual
    # runs; re-run outliers and keep the minimum so machine noise doesn't
    # masquerade as a plan regression. The threshold is median-relative
    # with a 2s floor: sub-second queries spiking to 4-5s are noise worth
    # retrying, while genuinely heavy queries (several x median) still
    # retry at most twice.
    med = sorted(timings.values())[len(timings) // 2]
    threshold = max(2.0, 3 * med)
    for name in [n for n, t in timings.items() if t > threshold]:
        for _ in range(2):
            retry = run_once(name)
            print(f"retry {name} {retry:.2f}s (was {timings[name]:.2f}s)", file=sys.stderr, flush=True)
            timings[name] = min(timings[name], retry)
            if timings[name] <= threshold:
                break

    timings = {n: round(t, 3) for n, t in timings.items()}
    first_run = {n: round(t, 3) for n, t in first_run.items()}
    total = sum(timings.values())

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                # first (cold-cache) run per query, before any noise
                # retries — a cold-path regression stays visible even
                # when min-of-retries keeps a faster later rep
                "queries_first_run": first_run,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
