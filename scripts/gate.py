#!/usr/bin/env python
"""Sharded pre-commit gate (VERDICT r13 #4): the IDENTICAL full test
suite — nothing excluded, same failure attribution — run as TWO parallel
pytest lanes so the wall stops compounding at ~+5 min/round:

  slow lane : ``-m slow``        — live streaming e2e / restart-replay /
              heavy property pins. Scheduler-WAIT-bound (micro-batch
              trigger waits, not compute), so it parallelizes against
              the other lane nearly for free.
  fast lane : ``-m "not slow"``  — everything else (compute-bound).

Each lane is a separate pytest process with its own Spark session,
basetemp, and JUnit-style summary; the gate fails iff either lane fails,
and each lane's tail (including any failure lines, which pytest prints
with full test ids) is replayed on the gate's stdout so attribution is
unchanged from a single run. CPU split: the wait-bound slow lane gets a
small executor pool (8 threads), the compute-bound fast lane the rest —
both knobs ride SPARK_GRAFT_CPUS, nothing in the suite changes.

Usage: ``python scripts/gate.py`` from the repo root. Exit code 0 iff
both lanes pass. Measured on the round-14 tree: see PLANS.md §Round 14
(single-process wall ~22 min quiet → sharded wall roughly the fast
lane's own wall).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

LANES = {
    "slow": {
        "args": ["-m", "slow", "--basetemp=/dev/shm/kw_pytest_tmp_slow"],
        "cpus": "8",
    },
    "fast": {
        "args": ["-m", "not slow", "--basetemp=/dev/shm/kw_pytest_tmp_fast"],
        "cpus": str(max(8, (os.cpu_count() or 16) - 8)),
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
            [sys.executable, "-m", "pytest", "tests/", "-q", *lane["args"]],
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
        print(f"[gate] {name} lane exit {code} after {wall:.0f}s: "
              f"{tail[-1] if tail else '(no summary)'}")
        if code != 0:
            rc = 1
    print(f"[gate] total wall {time.time() - t0:.0f}s -> {'PASS' if rc == 0 else 'FAIL'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
