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

Self-adjudication (VERDICT r12 #1 — BENCH_r12's 124.5 s first-run was
recorded under machine contention and nothing in the artifact could
prove it): the JSON now carries enough context to adjudicate a suspect
number WITHOUT a re-run —

- ``load``: 1/5/15-min load averages + CPU count, sampled BEFORE the
  session starts (the clean external-contention signal — our own Spark
  load is still zero then), at the end, and the 1-min value per query.
- ``slowest_recheck``: after the full pass, the 3 slowest first-run
  queries run once more. On a quiet machine the recheck lands inside
  normal jitter of the kept time; a run whose early numbers were
  inflated by a competing workload shows large end-of-run improvements.
- ``contaminated`` + ``contamination_reasons``: the explicit verdict,
  from :func:`assess_contamination` (pure, unit-tested in
  tests/test_bench_contract.py) — pre-session 1-min load >
  CONTENTION_LOAD_START, or a median slowest-3 recheck improvement >
  RECHECK_IMPROVEMENT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_workers_spark import WorkersConfig, build_session

#: Pre-session 1-min load average above which a run starts contaminated.
#: The sample is taken before the Spark session exists, so ANY load is a
#: competing workload; 2+ cores of sustained foreign work is the scale
#: that skewed BENCH_r12 (VERDICT r12: 124.5 s contended vs 93.2 s quiet).
CONTENTION_LOAD_START = 2.0

#: Median fractional improvement of the slowest-3 end-of-run rechecks
#: above which the run is flagged: quiet-machine jitter on multi-second
#: queries sits well under this; BENCH_r12's contended rows re-ran ~25-55%
#: faster once the competing load drained.
RECHECK_IMPROVEMENT = 0.20

#: Third signal (found live in round 13 when a concurrent pytest run
#: polluted a bench whose start load was clean and whose END was still
#: loaded — neither other rule fires then): when noise-retries find a
#: much faster rep for MANY rows, the first-run lane was measured under
#: load. The threshold is a COUNT of rows, not any single row's ratio,
#: and it sits ABOVE the structural quiet-run gainers measured in round
#: 13 (4 rows: the store-backed build-vs-hit row, plus rows whose sf0.1
#: plan shape diverges from the sf0.001 warmup so their first rep pays
#: JIT/codegen — multimodal_frame_dedup reproduces 16.5 s → 5.0 s in an
#: ISOLATED quiet session) but below the contended-run count (9 rows).
#: The per-row list is always recorded as `retry_gain_rows` so a reader
#: can adjudicate borderline runs from the artifact.
#:
#: Round-14 recalibration: the absolute count 7 was implicitly ~14% of
#: the 50-row roster it was calibrated on; applied verbatim to the
#: 104-row EXTRA roster it doubled the exposure to this box's RANDOM
#: per-row first-rep stalls and false-flagged two genuinely quiet runs
#: (pre-session 1-min loads 0.10-0.16, gain sets DISJOINT across runs —
#: 3, 9, and 12 rows with barely any overlap, which sustained
#: contention cannot produce; kept lanes agreed across the runs). The
#: threshold therefore scales with roster size at the ORIGINAL
#: fraction, with the original absolute count as the floor — headline
#: (50-row) behavior is bit-identical: max(7, int(0.15·50)) = 7.
RETRY_GAIN_RATIO = 2.0
RETRY_GAIN_ROWS = 7
RETRY_GAIN_FRACTION = 0.15
RETRY_GAIN_MIN_KEPT_S = 0.2


def assess_contamination(
    load_start_1m: float,
    recheck: dict[str, dict[str, float]],
    first_run: dict[str, float] | None = None,
    kept: dict[str, float] | None = None,
) -> tuple[bool, list[str]]:
    """The adjudication rule, as a pure function so it is unit-testable
    with a synthetic contended run (the 'deliberate contended-run test'
    VERDICT r12 #1 asks for): returns (contaminated, reasons).

    ``recheck`` maps query name -> {"kept": timed_s, "recheck": rerun_s};
    ``first_run``/``kept`` are the per-query lanes (optional for
    backward-compatible callers/tests of the first two rules).
    Returns (contaminated, reasons); callers can recompute the
    retry-gain row list via :func:`retry_gain_rows`.
    """
    reasons: list[str] = []
    if load_start_1m > CONTENTION_LOAD_START:
        reasons.append(
            f"pre-session 1-min load {load_start_1m:.2f} > "
            f"{CONTENTION_LOAD_START} (a competing workload was already "
            "running when the bench started)"
        )
    improvements = sorted(
        (r["kept"] - r["recheck"]) / r["kept"]
        for r in recheck.values()
        if r["kept"] > 0
    )
    if improvements:
        med = improvements[len(improvements) // 2]
        if med > RECHECK_IMPROVEMENT:
            reasons.append(
                f"slowest-3 end-of-run recheck median improvement "
                f"{med:.0%} > {RECHECK_IMPROVEMENT:.0%} (early timings were "
                "inflated by load that drained before the end of the run)"
            )
    if first_run and kept:
        gained = retry_gain_rows(first_run, kept)
        limit = max(RETRY_GAIN_ROWS, int(RETRY_GAIN_FRACTION * len(first_run)))
        if len(gained) >= limit:
            reasons.append(
                f"{len(gained)} rows' retries ran >{RETRY_GAIN_RATIO:.0f}x "
                f"faster than their first run (threshold {limit} on a "
                f"{len(first_run)}-row roster; {', '.join(sorted(gained)[:6])}"
                f"{'…' if len(gained) > 6 else ''}) — the first-run lane was "
                "measured under load that later drained"
            )
    return (bool(reasons), reasons)


def retry_gain_rows(
    first_run: dict[str, float], kept: dict[str, float]
) -> list[str]:
    """Rows whose kept rep beat their first run by more than
    RETRY_GAIN_RATIO — the contamination-rule input, also recorded
    verbatim in the JSON so borderline runs stay adjudicable."""
    return sorted(
        n
        for n, f in first_run.items()
        if kept.get(n, 0) > RETRY_GAIN_MIN_KEPT_S
        and f / kept[n] > RETRY_GAIN_RATIO
    )


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
    from kafka_workers_spark.queries import load_all, load_extra

    extra = "--extra" in sys.argv[1:]
    registry = load_extra() if extra else load_all()
    metric = "extra_queries_total" if extra else "headline_queries_total"
    names = list(registry)

    # sampled BEFORE the session: our own load is zero, so this is pure
    # external contention
    load_start = os.getloadavg()
    cpus = os.cpu_count() or 1

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
    load1_at_query: dict[str, float] = {}
    for name in names:
        load1_at_query[name] = round(os.getloadavg()[0], 2)
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

    # End-of-run recheck of the 3 slowest first-run rows (VERDICT r12 #1):
    # a contended run's early numbers deflate sharply once the competing
    # load drains, so the kept-vs-recheck delta adjudicates the artifact
    # without a judge re-run. The recheck also updates the kept minimum —
    # it is one more honest cache-cleared rep.
    slowest = sorted(first_run, key=first_run.get, reverse=True)[:3]
    recheck: dict[str, dict[str, float]] = {}
    for name in slowest:
        again = run_once(name)
        print(f"recheck {name} {again:.2f}s (kept {timings[name]:.2f}s)", file=sys.stderr, flush=True)
        recheck[name] = {"kept": round(timings[name], 3), "recheck": round(again, 3)}
        timings[name] = min(timings[name], again)

    load_end = os.getloadavg()
    contaminated, reasons = assess_contamination(
        load_start[0], recheck, first_run, timings
    )
    # ADVICE r13 #3: the recorded retry_gain_rows must be the SAME list
    # the verdict was computed from — compute it once from the unrounded
    # lanes (a row at the ratio boundary could otherwise appear in one
    # and not the other after 3-decimal rounding)
    gain_rows = retry_gain_rows(first_run, timings)

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
                "load": {
                    "start_1m_5m_15m": [round(x, 2) for x in load_start],
                    "end_1m_5m_15m": [round(x, 2) for x in load_end],
                    "cpus": cpus,
                    "at_query_1m": load1_at_query,
                },
                "slowest_recheck": recheck,
                "retry_gain_rows": gain_rows,
                "contaminated": contaminated,
                "contamination_reasons": reasons,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
