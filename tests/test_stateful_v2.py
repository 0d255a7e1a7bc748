"""WorkerTaskProcessor (transformWithStateInPandas adapter) driven
against fake handles — the same harness style as the v1 fake-GroupState
tests. The TWS Python runner needs google.protobuf at query runtime
(absent in this container), so the LIVE-query contract test
self-activates on availability, exactly like the Kafka broker tests;
the adapter's semantics (envelope, punctuate epoch, idle close, legacy
migration, timer re-arming) are fully covered here without a query.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from kafka_workers_spark.streaming.stateful import WorkerTask
from kafka_workers_spark.streaming.stateful_v2 import (
    WorkerTaskProcessor,
    apply_worker_task_v2,
    stateful_v2_available,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return list(self.timers)


class FakeTimerValues:
    def __init__(self, now_ms):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now

    def getCurrentWatermarkInMs(self):
        return -1


class FakeExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


def _counting_task():
    return WorkerTask(
        init=lambda key: {"n": 0},
        process=lambda key, pdf, st: (
            pd.DataFrame({"k": [key[0]], "kind": ["data"], "n": [st["n"] + len(pdf)]}),
            {"n": st["n"] + len(pdf)},
        ),
        punctuate=lambda key, st, now: (
            pd.DataFrame({"k": [key[0]], "kind": ["punct"], "n": [st["n"]]}),
            st,
        ),
        close=lambda key, st: pd.DataFrame(
            {"k": [key[0]], "kind": ["close"], "n": [st["n"]]}
        ),
    )


def _proc(**kw):
    p = WorkerTaskProcessor(_counting_task(), **kw)
    h = FakeHandle()
    p.init(h)
    return p, h


def _rows(p, key, pdfs, now):
    return list(p.handleInputRows(key, iter(pdfs), FakeTimerValues(now)))


def test_init_process_and_state_envelope():
    p, h = _proc(punctuate_interval_ms=1000)
    out = _rows(p, (7,), [pd.DataFrame({"v": [1, 2]}), pd.DataFrame({"v": [3]})], now=5000)
    # chunks concatenated into ONE process call; init ran first
    assert len(out) == 1 and out[0].iloc[0].to_dict() == {"k": 7, "kind": "data", "n": 3}
    env = json.loads(h.states["env"].get()[0])
    assert env["u"] == {"n": 3} and env["p"] == 5000 and env["d"] == 5000
    # a one-shot timer armed for the next tick
    assert h.timers == [6000]


def test_punctuate_epoch_fires_one_interval_after_creation():
    p, h = _proc(punctuate_interval_ms=1000)
    # creation at t=5000: no epoch-zero punctuate
    out = _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=5000)
    assert [o.iloc[0]["kind"] for o in out] == ["data"]
    # t=5999: interval not yet elapsed
    out = _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=5999)
    assert [o.iloc[0]["kind"] for o in out] == ["data"]
    # t=6000: one full interval after creation -> fires on the data path
    out = _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=6000)
    assert [o.iloc[0]["kind"] for o in out] == ["data", "punct"]


def test_expired_timer_forces_punctuate_and_rearms():
    p, h = _proc(punctuate_interval_ms=1000)
    _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=5000)
    out = list(
        p.handleExpiredTimer((1,), FakeTimerValues(6050), FakeExpiredTimerInfo(6000))
    )
    assert [o.iloc[0]["kind"] for o in out] == ["punct"]
    assert h.timers[-1] == 7050  # re-armed from the expiry handling time


def test_timers_roll_instead_of_accumulating():
    """registerTimer is additive one-shot; the adapter must ROLL the
    pending timer per batch (v1's setTimeoutDuration semantics) — data
    every 5 s under a 60 s interval must leave exactly ONE pending
    timer, not one per batch piling up to fire punctuate at batch
    frequency (code-review r06 finding)."""
    p, h = _proc(punctuate_interval_ms=60_000)
    for i in range(5):
        _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=5_000 * i)
    assert h.timers == [20_000 + 60_000], h.timers  # last batch's tick only


def test_idle_timeout_closes_key_and_clears_state():
    p, h = _proc(punctuate_interval_ms=1000, idle_timeout_ms=3000)
    _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=5000)
    # not yet idle at 6000 (d=5000): punctuate only
    out = list(
        p.handleExpiredTimer((1,), FakeTimerValues(6000), FakeExpiredTimerInfo(6000))
    )
    assert [o.iloc[0]["kind"] for o in out] == ["punct"]
    # idle at 9000: close emits final rows, state + timers gone
    out = list(
        p.handleExpiredTimer((1,), FakeTimerValues(9000), FakeExpiredTimerInfo(8000))
    )
    assert [o.iloc[0]["kind"] for o in out] == ["close"]
    assert not h.states["env"].exists() and h.timers == []


def test_legacy_state_migrates_instead_of_crashing():
    p, h = _proc(punctuate_interval_ms=1000)
    # a pre-envelope checkpoint: the raw value IS the user dict
    h.states["env"] = FakeValueState()
    h.states["env"].update((json.dumps({"n": 41}),))
    p._env = h.getValueState("env", "state STRING")
    out = _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=7000)
    assert out[0].iloc[0].to_dict() == {"k": 1, "kind": "data", "n": 42}
    env = json.loads(h.states["env"].get()[0])
    assert env["u"] == {"n": 42} and env["p"] == 7000


def test_order_by_sorts_across_chunks():
    seen = {}

    def process(key, pdf, st):
        seen["order"] = list(pdf["v"])
        return pd.DataFrame({"k": [key[0]]}), st

    p = WorkerTaskProcessor(WorkerTask(process=process), order_by=["v"])
    p.init(FakeHandle())
    _rows(p, (1,), [pd.DataFrame({"v": [5, 3]}), pd.DataFrame({"v": [4, 1]})], now=0)
    assert seen["order"] == [1, 3, 4, 5]


def test_apply_worker_task_v2_env_gate(spark):
    """Without google.protobuf the entry point must refuse loudly (the
    live runner would crash mid-query otherwise); WITH it, the live
    contract below takes over."""
    df = spark.createDataFrame([(1, 2)], "k int, v long")
    if stateful_v2_available():
        pytest.skip("environment has protobuf — live contract test runs instead")
    with pytest.raises(RuntimeError, match="google.protobuf"):
        apply_worker_task_v2(df, ["k"], _counting_task(), "k long, kind string, n long")


@pytest.mark.skipif(
    not stateful_v2_available(),
    reason="transformWithStateInPandas runner needs google.protobuf "
    "(self-activates when the environment gains it)",
)
def test_worker_task_v2_live_counts(spark, tmp_path):
    """Live TWS contract — the v1 counting scenario on the v2 adapter."""
    src = str(tmp_path / "src")
    spark.createDataFrame([(0, 1), (0, 2), (1, 3)], "k int, v long").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("k int, v long").parquet(src)
    out = apply_worker_task_v2(
        stream, ["k"], _counting_task(), "k long, kind string, n long"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_v2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.kind): r.n
        for r in spark.sql("SELECT * FROM tws_v2_out").collect()
    }
    assert got[(0, "data")] == 2 and got[(1, "data")] == 1


class V1FakeState:
    """applyInPandasWithState GroupState double (same surface as
    test_tasks' _FakeState) for the differential drive below."""

    def __init__(self, now_ms=0):
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


def test_v1_v2_differential_random_scenarios():
    """The v2 adapter must be OBSERVATIONALLY IDENTICAL to v1
    (apply_worker_task's handler) on random interleavings of data
    batches and timer fires, across punctuate/idle configurations:
    same emitted rows, same state envelope (or both gone after idle
    close). This is the parity claim that lets v2 replace v1 when the
    environment gains protobuf — pinned without a live query."""
    import random

    from kafka_workers_spark.streaming.stateful import _task_handler

    for seed in range(10):
        r = random.Random(seed)
        punct = r.choice([None, 1000])
        idle = r.choice([None, 3000])
        timer_ms = idle if (idle and not punct) else punct

        task = _counting_task()
        h1 = _task_handler(task, punct, ["v"], idle, timer_ms)
        st1 = V1FakeState()
        p2 = WorkerTaskProcessor(
            task, punctuate_interval_ms=punct, order_by=["v"], idle_timeout_ms=idle
        )
        fh = FakeHandle()
        p2.init(fh)

        def drive_v1(rows, now, timed_out):
            st1.now_ms = now
            st1.hasTimedOut = timed_out
            it = iter([pd.DataFrame(rows)]) if rows else iter([])
            out = []
            for pdf in h1((1,), it, st1):
                out.extend(pdf.to_dict("records"))
            return out

        def drive_v2(rows, now, timed_out):
            out_pdfs = (
                p2.handleExpiredTimer((1,), FakeTimerValues(now), FakeExpiredTimerInfo(now))
                if timed_out
                else p2.handleInputRows((1,), iter([pd.DataFrame(rows)]), FakeTimerValues(now))
            )
            out = []
            for pdf in out_pdfs:
                out.extend(pdf.to_dict("records"))
            return out

        now = 1_000
        for step in range(14):
            now += r.randint(0, 1_500)
            timer_fire = timer_ms is not None and r.random() < 0.4
            rows = (
                []
                if timer_fire
                else [{"v": r.randint(0, 9)} for _ in range(r.randint(1, 3))]
            )
            o1 = drive_v1(rows, now, timer_fire)
            o2 = drive_v2(rows, now, timer_fire)
            assert o1 == o2, (seed, step, timer_fire, o1, o2)
            s1 = st1.get
            s2 = fh.states["env"].get()
            assert (s1 is None) == (s2 is None), (seed, step, s1, s2)
            if s1 is not None:
                assert json.loads(s1[0]) == json.loads(s2[0]), (seed, step)


def test_empty_chunk_invocation_does_not_reset_idle_clock():
    """ADVICE r06: an invocation whose row chunks are ALL empty carries
    no data, so it must not refresh the idle clock — otherwise periodic
    empty batches postpone idle_timeout_ms key closure forever."""
    p, h = _proc(punctuate_interval_ms=1000, idle_timeout_ms=3000)
    _rows(p, (1,), [pd.DataFrame({"v": [1]})], now=5000)
    # an all-empty-chunk invocation at 7000: d stays 5000
    _rows(p, (1,), [pd.DataFrame({"v": []})], now=7000)
    env = json.loads(h.states["env"].get()[0])
    assert env["d"] == 5000
    # so the key is idle-closable at 8000 (5000 + 3000)
    out = list(
        p.handleExpiredTimer((1,), FakeTimerValues(8000), FakeExpiredTimerInfo(8000))
    )
    assert [o.iloc[0]["kind"] for o in out] == ["close"]
    # a REAL row does reset it
    p2, h2 = _proc(punctuate_interval_ms=1000, idle_timeout_ms=3000)
    _rows(p2, (1,), [pd.DataFrame({"v": [1]})], now=5000)
    _rows(p2, (1,), [pd.DataFrame({"v": [2]})], now=7000)
    assert json.loads(h2.states["env"].get()[0])["d"] == 7000
