#!/usr/bin/env python
"""Sharded pre-commit gate (VERDICT r13 #4, resharded r15 per VERDICT
r14 #6): the IDENTICAL full test suite — nothing excluded, same failure
attribution — run as FOUR parallel pytest lanes so the wall stops
compounding:

  slow-a/b   : ``-m slow`` split by explicit file list / its ignore-
               complement — live streaming e2e / restart-replay / heavy
               property pins. Scheduler-WAIT-bound (micro-batch trigger
               waits, not compute), so the pair parallelizes against the
               compute lanes nearly for free; split in round 15 when the
               tier's serial wall (~503s) overtook the fast shards and
               became the gate's critical path.
  fast-a lane: ``-m "not slow"`` over an EXPLICIT file list — the heavy
               compute files, chosen so the two fast shards land within
               ~3% of each other on the round-15 duration profile
               (``--durations=0``, quiet box: pipeline 110s, similarity
               82s, plans 67s, sketches 32s, oracle_extra 30s, drift
               22s ≈ 341s of 704s total).
  fast-b lane: ``-m "not slow"`` over everything else (``--ignore`` of
               the fast-a files) — so a NEW test file defaults into
               fast-b (a NEW slow test into slow-b) and is never
               silently dropped: the four lanes partition the suite by
               construction (pinned in tests/test_gate_script.py).

Each lane is a separate pytest process with its own Spark session,
basetemp, and summary; the gate fails iff any lane fails, and each
lane's failure lines (full test ids) are replayed on the gate's stdout
so attribution is unchanged from a single run. A lane that COLLECTS
NOTHING (pytest exit code 5 — e.g. a renamed marker or an emptied
shard) fails the gate with an explicit message instead of the generic
nonzero-exit path (ADVICE r14 #5): a silently empty lane would read as
green coverage that no longer runs. CPU split: the wait-bound slow lane
gets a small executor pool, the two compute shards split the rest;
every knob rides SPARK_GRAFT_CPUS, nothing in the suite changes.

Usage: ``python scripts/gate.py`` from the repo root. Exit code 0 iff
all lanes pass. Measured walls live in SURVEY.md's status header.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

#: The heavy compute files forming fast shard A. Chosen from the
#: round-15 --durations=0 profile; rebalance when the profile drifts.
FAST_A = [
    "tests/test_pipeline.py",
    "tests/test_similarity.py",
    "tests/test_plans.py",
    "tests/test_sketches.py",
    "tests/test_oracle_extra.py",
    "tests/test_drift.py",
]

#: The heavy live-streaming files forming slow shard A (the slow tier
#: grew past the fast shards' wall in round 15 — the new critical path
#: splits the same way; ~254s/~249s on the round-15 profile). Files can
#: appear in a FAST list AND a SLOW list: the marker expressions keep
#: the two tiers disjoint.
SLOW_A = [
    "tests/test_components_stream.py",
    "tests/test_drift_stream.py",
    "tests/test_cardinality_stream.py",
    "tests/test_watermark.py",
    "tests/test_markov_stream.py",
    "tests/test_integration_stream.py",
]

_COMPUTE_CPUS = max(16, (os.cpu_count() or 16) - 12)

LANES = {
    "slow-a": {
        "args": [*SLOW_A, "-m", "slow",
                 "--basetemp=/dev/shm/kw_pytest_tmp_slow_a"],
        "cpus": "6",
    },
    "slow-b": {
        "args": ["tests/", "-m", "slow",
                 *[f"--ignore={f}" for f in SLOW_A],
                 "--basetemp=/dev/shm/kw_pytest_tmp_slow_b"],
        "cpus": "6",
    },
    "fast-a": {
        "args": [*FAST_A, "-m", "not slow",
                 "--basetemp=/dev/shm/kw_pytest_tmp_fast_a"],
        "cpus": str(_COMPUTE_CPUS // 2),
    },
    "fast-b": {
        "args": ["tests/", "-m", "not slow",
                 *[f"--ignore={f}" for f in FAST_A],
                 "--basetemp=/dev/shm/kw_pytest_tmp_fast_b"],
        "cpus": str(_COMPUTE_CPUS - _COMPUTE_CPUS // 2),
    },
}


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    procs: dict[str, tuple[subprocess.Popen, str]] = {}
    for name, lane in LANES.items():
        out_path = f"/tmp/kw_gate_{name}.log"
        env = {**os.environ, "SPARK_GRAFT_CPUS": lane["cpus"]}
        out = open(out_path, "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *lane["args"]],
            cwd=root,
            env=env,
            stdout=out,
            stderr=subprocess.STDOUT,
        )
        procs[name] = (p, out_path)
        print(f"[gate] {name} lane started (pid {p.pid}, cpus {lane['cpus']}, log {out_path})")

    rc = 0
    for name, (p, out_path) in procs.items():
        code = p.wait()
        wall = time.time() - t0
        with open(out_path) as fh:
            lines = fh.read().splitlines()
        # replay failures verbatim (pytest's own short summary holds the
        # full test ids) plus the lane's closing summary line
        fails = [ln for ln in lines if ln.startswith("FAILED") or ln.startswith("ERROR")]
        for ln in fails:
            print(f"[{name}] {ln}")
        tail = [ln for ln in lines if " passed" in ln or " failed" in ln or " error" in ln]
        if code == 5:
            # pytest: no tests collected — an emptied shard or renamed
            # marker. Explicitly red: the lane's coverage silently
            # stopped running (ADVICE r14 #5).
            print(f"[gate] {name} lane COLLECTED NO TESTS after {wall:.0f}s — "
                  "shard list or marker expression no longer matches the suite")
            rc = 1
            continue
        print(f"[gate] {name} lane exit {code} after {wall:.0f}s: "
              f"{tail[-1] if tail else '(no summary)'}")
        if code != 0:
            rc = 1
    print(f"[gate] total wall {time.time() - t0:.0f}s -> {'PASS' if rc == 0 else 'FAIL'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
