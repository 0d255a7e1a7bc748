"""Streaming funnel (streaming/funnel.py — VERDICT r08 #4): the per-user
WorkerTask state machine's live streaming path must equal the batch
funnel_steps operator on the same events, including the within_seconds
arm; plus pure-function tests of the vectorized greedy advance."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pandas as pd
import pytest

# slow tier (VERDICT r12 #6): live streaming funnel == batch cross-plan runs -- seconds-per-test by
# nature (micro-batch scheduling waits, not compute). Full suite
# stays the pre-commit gate; `-m "not slow"` is the fast lane.
pytestmark = pytest.mark.slow

from kafka_workers_spark.operators.relational import funnel_steps
from kafka_workers_spark.streaming.funnel import (
    _advance,
    funnel_tasks_batch,
    streaming_funnel,
)

STEPS = ["view", "click", "purchase"]


def _ts(s: float) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=s)


def _pdf(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "event_type": [r[2] for r in rows],
        }
    )


# ---------------------------------------------------------------------------
# pure greedy-advance semantics (no Spark)
# ---------------------------------------------------------------------------


def test_advance_is_incremental_across_batches():
    """Feeding the history in two ts-ordered chunks reaches the same
    chain as one pass — the cross-batch correctness the streaming path
    relies on."""
    rows = [
        (1, _ts(10), "view"),
        (1, _ts(20), "click"),
        (1, _ts(25), "view"),
        (1, _ts(30), "purchase"),
    ]
    whole = _advance([], _pdf(rows), STEPS, "event_type", "ts", None)
    split = _advance([], _pdf(rows[:2]), STEPS, "event_type", "ts", None)
    split = _advance(split, _pdf(rows[2:]), STEPS, "event_type", "ts", None)
    assert whole == split and len(whole) == 3


def test_advance_equal_timestamps_do_not_advance():
    rows = [(1, _ts(10), "view"), (1, _ts(10), "click"), (1, _ts(15), "purchase")]
    t = _advance([], _pdf(rows), STEPS, "event_type", "ts", None)
    assert len(t) == 1  # click tied with view; purchase needs click first


def test_advance_window_floors_to_seconds():
    """The within bound compares floored epoch seconds (the batch
    operator's cast-to-long), so a chain whose raw-microsecond span
    exceeds the window can still qualify when the floored span fits."""
    rows = [(1, _ts(10.9), "view"), (1, _ts(31.3), "click")]
    # raw span 20.4s > 20; floored 31 - 10 = 21 > 20 → excluded
    assert len(_advance([], _pdf(rows), STEPS, "event_type", "ts", 20)) == 1
    # floored 31 - 10 = 21 <= 21 → included even though raw span > 20.4
    assert len(_advance([], _pdf(rows), STEPS, "event_type", "ts", 21)) == 2


# ---------------------------------------------------------------------------
# live stream == batch operator
# ---------------------------------------------------------------------------

_EVENTS = [
    # u1: full chain → completes on the data path
    (1, 10.0, "view"), (1, 20.0, "click"), (1, 30.5, "purchase"),
    # u2: click precedes its view (no count), later click counts → depth 2
    (2, 5.0, "click"), (2, 10.0, "view"), (2, 40.0, "click"),
    # u3: purchase first (no count), then view only → depth 1
    (3, 10.0, "purchase"), (3, 20.0, "view"),
    # u4: never reaches step 1 → NO row
    (4, 10.0, "click"),
    # u5: click ties the view (strict >, no advance) → depth 1
    (5, 10.0, "view"), (5, 10.0, "click"), (5, 15.0, "purchase"),
    # u6: chain completes only OUTSIDE a 20s window (within arm: depth 2)
    (6, 0.0, "view"), (6, 15.0, "click"), (6, 30.0, "purchase"),
]


def _write_sources(spark, tmp_path):
    """Two parquet files split at ts=16 — per-user ts order holds across
    files, so micro-batch arrival order matches the module contract."""
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(u, _ts(s), e) for (u, s, e) in _EVENTS],
        "user_id long, ts timestamp, event_type string",
    )
    df.filter("ts <= timestamp'2024-01-01 00:00:16'").coalesce(1).write.parquet(src)
    df.filter("ts > timestamp'2024-01-01 00:00:16'").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    return src, df


def _run_stream(spark, src, ckpt, name, within=None):
    schema = "user_id long, ts timestamp, event_type string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_funnel(
        stream, STEPS, within_seconds=within, idle_timeout_ms=1200
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            time.sleep(0.3)
            n = spark.sql(f"SELECT COUNT(*) AS c FROM {name}").first().c
            p = q.lastProgress
            state_rows = (
                p["stateOperators"][0]["numRowsTotal"]
                if p and p.get("stateOperators")
                else None
            )
            if n >= 5 and state_rows == 0:
                break
        return sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    finally:
        q.stop()
        q.awaitTermination(30)


@pytest.mark.parametrize("within", [None, 20])
def test_streaming_funnel_equals_batch(spark, tmp_path, within):
    """E2E: completed chains emit on the data path, partials on idle
    close; the final table equals funnel_steps on the same events —
    including the user who never reaches step 1 (no row) and the
    within_seconds arm (u6 completes outside the window → depth 2)."""
    src, df = _write_sources(spark, tmp_path)
    name = f"funnel_{'w' if within else 'full'}"
    got = _run_stream(spark, src, str(tmp_path / "ckpt"), name, within=within)
    want = sorted(
        map(tuple, funnel_steps(df, STEPS, within_seconds=within).collect())
    )
    assert got == want
    depths = {r[0]: r[-1] for r in got}
    if within is None:
        assert depths == {1: 3, 2: 2, 3: 1, 5: 1, 6: 3}
    else:
        # u2's second click (t=40) falls outside the 20s window from
        # t_1=10, so the within arm stops it at depth 1
        assert depths == {1: 3, 2: 1, 3: 1, 5: 1, 6: 2}


def test_funnel_tasks_batch_equals_funnel_steps(spark):
    """The batch entry of the same task (applyInPandas over full
    history) equals the relational operator with no arrival-order
    caveat — including the within arm."""
    df = spark.createDataFrame(
        [(u, _ts(s), e) for (u, s, e) in _EVENTS],
        "user_id long, ts timestamp, event_type string",
    )
    for within in (None, 20):
        got = sorted(
            map(tuple, funnel_tasks_batch(df, STEPS, within_seconds=within).collect())
        )
        want = sorted(
            map(tuple, funnel_steps(df, STEPS, within_seconds=within).collect())
        )
        assert got == want, f"within={within}"
