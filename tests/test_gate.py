"""A3 accept gate: head-of-queue pause semantics on a live stream.

Reference: WorkerTask.accept returning false pauses the sub-partition —
the head stays queued and everything behind it waits IN ORDER, even rows
that would individually pass (WorkerThread.java:70-85). Un-pausing comes
from state changes (here: a punctuate-driven budget bump, the
timeout-release policy)."""

from __future__ import annotations

import json
import time

import pandas as pd
import pytest

from kafka_workers_spark.streaming.gate import (
    GateBufferLimitExceeded,
    _gate_handler,
    accept_gate,
)
from kafka_workers_spark.streaming.offsets import ProcessingTimeoutError


class FakeGroupState:
    """Minimal GroupState double for driving _gate_handler directly —
    includes the processing-time clock so deadline tests don't depend on
    wall time (the gate must use state.getCurrentProcessingTimeMs, not
    time.time — ADVICE r03)."""

    def __init__(self, now_ms: int = 0):
        self._tuple = None
        self.now_ms = now_ms
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._tuple is not None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = tuple(t)

    def remove(self):
        self._tuple = None

    def setTimeoutDuration(self, ms):
        pass

    def getCurrentProcessingTimeMs(self):
        return self.now_ms


def _drive(handle, state, rows):
    """Feed one micro-batch of rows through the handler; return released rows."""
    out = []
    pdf = pd.DataFrame(rows) if rows else None
    it = iter([pdf]) if pdf is not None else iter([])
    for emitted in handle((0,), it, state):
        out.extend(emitted.to_dict("records"))
    return out


def _budget_gate_fns():
    # budget release: a row releases iff its cost fits the remaining
    # budget; released rows spend it; punctuate refills it
    def accept(row, st):
        return row["cost"] <= st.get("budget", 5)

    def on_release(row, st):
        return {**st, "budget": st.get("budget", 5) - row["cost"] + 3}

    def on_punctuate(st):
        return {**st, "budget": st.get("budget", 5) + 10}

    return accept, on_release, on_punctuate


def test_accept_gate_head_blocks_and_punctuate_releases(spark, tmp_path):
    src = str(tmp_path / "src")
    # key 0, ordered by offset: costs 2,1,20,1 — budget starts at 5:
    # release 2 (budget 6), release 1 (8), 20 blocks (and the final 1
    # behind it must wait despite fitting); each punctuate adds 10 →
    # after >=2 refills the head releases and the tail follows.
    rows = [(0, 0, 2), (0, 1, 1), (0, 2, 20), (0, 3, 1)]
    spark.createDataFrame(rows, "k int, offset long, cost long").coalesce(1).write.parquet(src)

    accept, on_release, on_punctuate = _budget_gate_fns()
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = accept_gate(
        stream,
        keys=["k"],
        accept=accept,
        output_schema="k int, offset long, cost long",
        order_by="offset",
        on_release=on_release,
        on_punctuate=on_punctuate,
        punctuate_interval_ms=500,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("gate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # phase 1: only the pre-block prefix is out, in offset order
        deadline = time.time() + 30
        while time.time() < deadline:
            got = [r.offset for r in spark.sql("SELECT * FROM gate_out ORDER BY offset").collect()]
            if len(got) >= 2:
                break
            time.sleep(0.3)
        assert got[:2] == [0, 1], got
        # phase 2: punctuate refills the budget until the head releases,
        # and the waiting tail follows in order
        deadline = time.time() + 60
        while time.time() < deadline:
            got = [r.offset for r in spark.sql("SELECT * FROM gate_out ORDER BY offset").collect()]
            if len(got) == 4:
                break
            time.sleep(0.3)
        assert got == [0, 1, 2, 3], got
    finally:
        q.stop()
        q.awaitTermination(30)


def test_accept_gate_never_drops_or_reorders(spark, tmp_path):
    """Flow control, not filtering: with a predicate that eventually passes
    everything, the full input comes out exactly once per key in order."""
    src = str(tmp_path / "src")
    rows = [(k, o, 1) for k in (0, 1) for o in range(6)]
    spark.createDataFrame(rows, "k int, offset long, cost long").coalesce(1).write.parquet(src)

    accept, on_release, on_punctuate = _budget_gate_fns()
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = accept_gate(
        stream,
        keys=["k"],
        accept=accept,
        output_schema="k int, offset long, cost long",
        order_by="offset",
        on_release=on_release,
        on_punctuate=on_punctuate,
        punctuate_interval_ms=300,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("gate_all")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM gate_all").count() == 12:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(30)
    for k in (0, 1):
        got = [
            r.offset
            for r in spark.sql(f"SELECT * FROM gate_all WHERE k = {k} ORDER BY offset").collect()
        ]
        assert got == list(range(6)), (k, got)


def test_accept_gate_drops_state_for_drained_keys(spark, tmp_path):
    """A drained key (empty buffer, empty user state) must not keep a
    state-store row or a re-armed timer: gate state grows with *blocked*
    keys only, never with every key ever seen."""
    src = str(tmp_path / "src")
    rows = [(k, 0, 1) for k in range(20)]
    spark.createDataFrame(rows, "k int, offset long, cost long").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = accept_gate(
        stream,
        keys=["k"],
        accept=lambda row, st: True,
        output_schema="k int, offset long, cost long",
        order_by="offset",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("gate_drain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS c FROM gate_drain").collect()[0].c
            if n == 20:
                break
            time.sleep(0.3)
        assert n == 20, n
        # the batch that released the rows also removed their state
        deadline = time.time() + 30
        total = None
        while time.time() < deadline:
            p = q.lastProgress
            if p and p.get("stateOperators"):
                total = p["stateOperators"][0]["numRowsTotal"]
                if total == 0:
                    break
            time.sleep(0.3)
        assert total == 0, f"state rows left behind: {total}"
    finally:
        q.stop()


@pytest.mark.slow
def test_gate_record_deadline_fails_query(spark, tmp_path):
    """A9 record granularity for buffered records: a head blocked past
    max_buffer_age_ms raises ProcessingTimeoutError and the live query
    terminates with that cause (reference:
    ProcessingTimeoutTest.java:75-104 — one unacked record kills the
    pipeline)."""
    import pytest

    src = str(tmp_path / "src")
    rows = [(0, 0, 99)]  # cost 99 never fits: head blocks forever
    spark.createDataFrame(rows, "k int, offset long, cost long").coalesce(1).write.parquet(src)
    accept, on_release, on_punctuate = _budget_gate_fns()
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = accept_gate(
        stream,
        keys=["k"],
        accept=lambda row, st: row["cost"] <= 5,
        output_schema="k int, offset long, cost long",
        order_by="offset",
        punctuate_interval_ms=500,
        max_buffer_age_ms=2000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("gate_deadline")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    with pytest.raises(Exception) as exc_info:
        q.awaitTermination(90)
        if q.exception() is not None:
            raise q.exception()
    assert "ProcessingTimeoutError" in str(exc_info.value) or "buffered for" in str(
        exc_info.value
    ), str(exc_info.value)[:500]


def _handler(**kw):
    defaults = dict(
        df_columns=["k", "offset", "cost"],
        keys=["k"],
        accept=lambda row, st: st.get("open", False),
        order_by="offset",
        on_release=None,
        on_punctuate=lambda st: {**st, "open": True},
        punctuate_interval_ms=1000,
        max_buffer_age_ms=None,
        max_buffer_rows=None,
        max_buffer_bytes=None,
    )
    defaults.update(kw)
    return _gate_handler(**defaults)


def test_gate_large_stalled_buffer_releases_in_order_fast():
    """10k rows stall behind a closed gate across many batches, then one
    punctuate opens it: the whole backlog releases in one linear pass, in
    offset order, exactly once (the r03 O(n^2) re-sort + pop(0) shape is
    gone: sorted-insert on ingest, single-slice release)."""
    handle = _handler()
    state = FakeGroupState()
    t0 = time.perf_counter()
    n = 0
    for batch in range(10):
        rows = [{"k": 0, "offset": batch * 1000 + j, "cost": 1} for j in range(1000)]
        assert _drive(handle, state, rows) == []
        n += len(rows)
    assert len(json.loads(state.get[0])["buf"]) == n
    state.hasTimedOut = True
    released = _drive(handle, state, [])
    elapsed = time.perf_counter() - t0
    assert [r["offset"] for r in released] == list(range(n))
    assert elapsed < 10.0, f"gate buffer handling took {elapsed:.1f}s for {n} rows"


def test_gate_insort_keeps_out_of_order_arrivals_ordered():
    """Arrivals out of offset order (late batch) still release in order."""
    handle = _handler()
    state = FakeGroupState()
    _drive(handle, state, [{"k": 0, "offset": o, "cost": 1} for o in (5, 3, 9)])
    _drive(handle, state, [{"k": 0, "offset": o, "cost": 1} for o in (1, 7)])
    state.hasTimedOut = True
    released = _drive(handle, state, [])
    assert [r["offset"] for r in released] == [1, 3, 5, 7, 9]


def test_gate_rows_cap_raises():
    handle = _handler(max_buffer_rows=50)
    state = FakeGroupState()
    _drive(handle, state, [{"k": 0, "offset": o, "cost": 1} for o in range(50)])
    with pytest.raises(GateBufferLimitExceeded, match="51 rows buffered"):
        _drive(handle, state, [{"k": 0, "offset": 50, "cost": 1}])


def test_gate_bytes_cap_raises():
    handle = _handler(max_buffer_bytes=400)
    state = FakeGroupState()
    with pytest.raises(GateBufferLimitExceeded, match="bytes"):
        _drive(
            handle,
            state,
            [{"k": 0, "offset": o, "cost": 1} for o in range(50)],
        )


def test_gate_deadline_uses_state_clock_not_wall_clock():
    """The record deadline is driven by getCurrentProcessingTimeMs — fully
    mockable, consistent with the stateful operator's timers."""
    handle = _handler(max_buffer_age_ms=5000)
    state = FakeGroupState(now_ms=1_000)
    _drive(handle, state, [{"k": 0, "offset": 0, "cost": 1}])  # buffers at t=1000
    state.now_ms = 5_000  # within deadline
    _drive(handle, state, [{"k": 0, "offset": 1, "cost": 1}])
    state.now_ms = 6_001  # 5001ms after first buffered row
    with pytest.raises(ProcessingTimeoutError, match="buffered for 5001 ms"):
        _drive(handle, state, [{"k": 0, "offset": 2, "cost": 1}])


def test_gate_legacy_unversioned_state_migrates():
    """State written before the sorted-buffer invariant (no 'v' marker,
    arbitrary buffer order) is sorted once on load instead of breaking
    head-of-queue order after a checkpoint restart (ADVICE r03)."""
    handle = _handler()
    state = FakeGroupState()
    legacy = {
        "buf": [
            {"r": {"offset": 9, "cost": 1}, "t": 0},
            {"r": {"offset": 2, "cost": 1}, "t": 0},
            {"r": {"offset": 5, "cost": 1}, "t": 0},
        ],
        "user": {},
    }
    state.update((json.dumps(legacy),))
    state.hasTimedOut = True
    # punctuate opens the gate; legacy buffer must come out sorted
    released = _drive(handle, state, [])
    assert [r["offset"] for r in released] == [2, 5, 9]


def test_gate_random_arrivals_match_reference_model():
    """Property (hypothesis): for ANY arrival order, batching, and
    punctuate bump schedule, the gate's cumulative output equals a
    reference model's — the longest order-prefix of everything ingested
    whose offsets are under the current limit — with no drops,
    duplicates, or reorders. Ports the spirit of the reference's
    randomized OffsetsStateTest processing orders to the A3 gate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        offsets=st.permutations(list(range(12))),
        batch_sizes=st.lists(st.integers(1, 5), min_size=1, max_size=12),
        bumps=st.lists(st.integers(0, 6), min_size=1, max_size=8),
    )
    def run(offsets, batch_sizes, bumps):
        padded = list(bumps) + [100] * 40  # eventually opens fully

        def limit_after(ticks: int) -> int:
            return -1 + sum(padded[:ticks])

        def on_punctuate(s):
            t = s.get("ticks", 0) + 1
            return {"ticks": t, "limit": limit_after(t)}

        handle = _handler(
            accept=lambda row, s: row["offset"] <= s.get("limit", -1),
            on_punctuate=on_punctuate,
        )
        state = FakeGroupState()

        import itertools

        batches, it = [], iter(offsets)
        for size in batch_sizes:
            batch = list(itertools.islice(it, size))
            if batch:
                batches.append(batch)
        rest = list(it)
        if rest:
            batches.append(rest)

        released: list[int] = []
        model: list[int] = []
        ingested: list[int] = []
        ticks = 0

        def model_release():
            pending = sorted(set(ingested) - set(model))
            lim = limit_after(ticks)
            for o in pending:
                if o > lim:
                    break
                model.append(o)

        for batch in batches:
            ingested.extend(batch)
            got = _drive(handle, state, [{"k": 0, "offset": o, "cost": 1} for o in batch])
            released.extend(r["offset"] for r in got)
            model_release()
            state.hasTimedOut = True
            got = _drive(handle, state, [])
            state.hasTimedOut = False
            ticks += 1
            released.extend(r["offset"] for r in got)
            model_release()
        for _ in range(40):  # drain
            if len(released) == len(offsets):
                break
            state.hasTimedOut = True
            got = _drive(handle, state, [])
            state.hasTimedOut = False
            ticks += 1
            released.extend(r["offset"] for r in got)
            model_release()
        assert released == model, (released, model)
        assert sorted(released) == sorted(offsets)  # no drops, no dupes
        # head-of-queue order holds among co-buffered rows: a released
        # offset is never followed by a smaller one that was ALREADY
        # buffered when it went out (a late-arriving smaller offset
        # legitimately releases later — same as the reference, where a
        # record can only be processed after it arrives)
        seen_batches = {o: bi for bi, b in enumerate(batches) for o in b}
        for i, a in enumerate(released):
            for b in released[i + 1 :]:
                if b < a:
                    assert seen_batches[b] > seen_batches[a], (a, b, released)

    run()


@pytest.mark.slow
def test_gate_tasks_batch_equals_live_gate(spark, tmp_path):
    """The batch replay entry (gate_tasks_batch — the stream_gate_release
    registry row's engine) emits exactly the rows the LIVE gate releases
    for the same byte-budget policy: the released prefix, in order, with
    the over-budget head pausing everything behind it."""
    from kafka_workers_spark.streaming.gate import accept_gate, gate_tasks_batch

    budget = 10
    rows = [
        (0, 0, 4), (0, 1, 4), (0, 2, 5), (0, 3, 1),   # release 4+4, 5 blocks, 1 waits
        (1, 0, 11), (1, 1, 1),                          # head over budget: nothing out
        (2, 0, 10),                                     # exactly at budget: released
    ]
    schema = "k int, offset long, w long"

    def acc(row, st):
        return st.get("b", 0) + row["w"] <= budget

    def rel(row, st):
        return {"b": st.get("b", 0) + row["w"]}

    df = spark.createDataFrame(rows, schema)
    got_batch = sorted(
        (r.k, r.offset, r.w)
        for r in gate_tasks_batch(df, ["k"], acc, schema, "offset", rel).collect()
    )

    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = accept_gate(
        stream, keys=["k"], accept=acc, output_schema=schema,
        order_by="offset", on_release=rel,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("gate_batch_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_live = sorted(
        (r.k, r.offset, r.w)
        for r in spark.sql("SELECT * FROM gate_batch_twin").collect()
    )
    assert got_batch == got_live == [(0, 0, 4), (0, 1, 4), (2, 0, 10)]


def test_gate_release_query_null_event_type_weight_is_null_safe(spark):
    """ADVICE r10: a NULL event_type must weigh coalesce(octet_length,0)
    + 16 = 16 bytes on BOTH engines — before the fix the live fold's
    ``st['bytes'] + row['w']`` raised TypeError on the NULL weight while
    the oracle's window SUM silently skipped it (crash-vs-wrong-answer
    divergence). Replays the registry row's exact weighing + gating
    chain over a frame WITH a NULL event_type and checks it against the
    windowed running-sum semantics computed in Python."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.streaming.gate import gate_tasks_batch

    budget = 40
    rows = [
        (0, 1, "click"),   # 5 + 16 = 21
        (0, 2, None),      # NULL -> 0 + 16 = 16 (cum 37: released)
        (0, 3, "view"),    # 4 + 16 = 20 (cum 57: pauses the partition)
        (0, 4, None),      # waits behind the paused head even at 16
        (5, 5, None),      # partition 1: 16 (cum 16: released)
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    q = ev.select(
        (F.col("user_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("off"),
        (F.coalesce(F.octet_length("event_type"), F.lit(0)) + F.lit(16))
        .cast("long")
        .alias("w"),
    )

    def acc(row, st):
        return st.get("bytes", 0) + row["w"] <= budget

    def rel(row, st):
        return {"bytes": st.get("bytes", 0) + row["w"]}

    released = gate_tasks_batch(
        q, ["partition"], acc, "partition int, off long, w long",
        order_by="off", on_release=rel,
    )
    got = sorted((r.partition, r.off, r.w) for r in released.collect())
    assert got == [(0, 1, 21), (0, 2, 16), (1, 5, 16)]
