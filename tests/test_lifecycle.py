"""Lifecycle state machine (A14), Kafka option mapping (A1/A7/A8/A10),
and the batch deadline listener (A9).

Reference behaviors pinned: LifecycleTest.java:53-135 (legal/illegal
transitions), ShutdownTest.java:79-143 (graceful close), WorkersConfig
option semantics (README.md:105-283)."""

from __future__ import annotations

import pytest

from kafka_workers_spark.session import WorkersConfig
from kafka_workers_spark.sources.kafka import kafka_options, kafka_sink_options
from kafka_workers_spark.streaming.lifecycle import (
    BadStatusError,
    BatchDeadlineListener,
    Status,
    WorkersQuery,
)


class _FakeQuery:
    def __init__(self):
        self.stopped = False

    def stop(self):
        self.stopped = True

    def awaitTermination(self, timeout=None):  # noqa: N802
        return True


def test_lifecycle_happy_path():
    wq = WorkersQuery(lambda: _FakeQuery())
    assert wq.status == Status.CREATED
    wq.start()
    assert wq.status == Status.STARTED
    wq.shutdown()
    assert wq.status == Status.CLOSED_GRACEFULLY
    assert wq.query.stopped


def test_lifecycle_rejects_double_start():
    wq = WorkersQuery(lambda: _FakeQuery())
    wq.start()
    with pytest.raises(BadStatusError):
        wq.start()


def test_lifecycle_rejects_shutdown_before_start():
    wq = WorkersQuery(lambda: _FakeQuery())
    with pytest.raises(BadStatusError):
        wq.shutdown()


def test_lifecycle_failed_start_is_not_graceful():
    def boom():
        raise RuntimeError("no cluster")

    wq = WorkersQuery(boom)
    with pytest.raises(RuntimeError):
        wq.start()
    assert wq.status == Status.CLOSED_NOT_GRACEFULLY
    with pytest.raises(BadStatusError):
        wq.start()  # terminal state


# --- Kafka option mapping --------------------------------------------------


def test_kafka_options_mapping():
    cfg = WorkersConfig(
        topics=["events", "clicks"],
        max_offsets_per_trigger=50_000,
        guarantee="at_least_once",
    )
    opts = kafka_options(cfg, {"consumer.kafka.fetch.min.bytes": "1048576"})
    assert opts["subscribe"] == "events,clicks"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["failOnDataLoss"] == "true"
    assert opts["kafka.fetch.min.bytes"] == "1048576"


def test_kafka_options_guarantee_none_tolerates_loss():
    cfg = WorkersConfig(topics=["t"], guarantee="none")
    assert kafka_options(cfg)["failOnDataLoss"] == "false"


def test_kafka_options_require_topics():
    with pytest.raises(ValueError):
        kafka_options(WorkersConfig())


def test_kafka_sink_options():
    assert kafka_sink_options("out") == {"topic": "out"}


# --- Deadline listener (A9, batch granularity) -----------------------------


class _Progress:
    def __init__(self, batch_id, duration):
        self.batchId = batch_id
        self.batchDuration = duration
        self.id = "q-1"


class _Event:
    def __init__(self, progress):
        self.progress = progress


def test_deadline_listener_records_violation():
    listener = BatchDeadlineListener(spark=None, deadline_ms=1000)
    listener.onQueryProgress(_Event(_Progress(1, 500)))
    listener.onQueryProgress(_Event(_Progress(2, 1500)))
    assert len(listener.violations) == 1
    v = listener.violations[0]
    assert v.batch_id == 2 and v.duration_ms == 1500 and v.deadline_ms == 1000
