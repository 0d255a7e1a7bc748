"""Lifecycle state machine, processing deadline, and metrics surface.

Reference:

- Status machine CREATED→STARTING→STARTED→SHUTDOWN→CLOSING→CLOSED_*
  with illegal transitions raising BadStatusException
  (/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/
  KafkaWorkers.java:55-78,146-173; impl/KafkaWorkersImpl.java:101-146).
- Processing deadline: a record unacknowledged for
  ``consumer.processing.timeout.ms`` kills the pipeline
  (impl/offsets/DefaultOffsetsState.java:223-256). Spark has batch-, not
  record-, granularity (SURVEY.md §7): the listener raises the same
  condition when a micro-batch exceeds the deadline.
- Metrics (impl/metrics/WorkersMetrics.java:32-258) → Structured
  Streaming's StreamingQueryProgress already carries the equivalents
  (numInputRows, sources' start/endOffset, stateOperators); snapshot()
  maps them to reference-style names.
"""

from __future__ import annotations

import enum
import threading
from dataclasses import dataclass
from typing import Any

from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener


class Status(enum.Enum):
    CREATED = "CREATED"
    STARTING = "STARTING"
    STARTED = "STARTED"
    SHUTDOWN = "SHUTDOWN"
    CLOSING = "CLOSING"
    CLOSED_GRACEFULLY = "CLOSED_GRACEFULLY"
    CLOSED_NOT_GRACEFULLY = "CLOSED_NOT_GRACEFULLY"


class BadStatusError(RuntimeError):
    """Parity with api/KafkaWorkers.java BadStatusException."""


_LEGAL = {
    Status.CREATED: {Status.STARTING},
    Status.STARTING: {Status.STARTED, Status.CLOSED_NOT_GRACEFULLY},
    Status.STARTED: {Status.SHUTDOWN},
    Status.SHUTDOWN: {Status.CLOSING},
    Status.CLOSING: {Status.CLOSED_GRACEFULLY, Status.CLOSED_NOT_GRACEFULLY},
    Status.CLOSED_GRACEFULLY: set(),
    Status.CLOSED_NOT_GRACEFULLY: set(),
}


class WorkersQuery:
    """A StreamingQuery wrapped in the reference's lifecycle contract.

    ``start_fn`` is a zero-arg callable returning a started
    ``StreamingQuery`` (i.e. ``lambda: df.writeStream...start()``), so the
    CREATED state genuinely precedes query startup.
    """

    def __init__(self, start_fn) -> None:
        self._start_fn = start_fn
        self._query: StreamingQuery | None = None
        self._status = Status.CREATED
        self._lock = threading.Lock()
        self._failure: BaseException | None = None

    @property
    def status(self) -> Status:
        return self._status

    @property
    def query(self) -> StreamingQuery | None:
        return self._query

    def _transition(self, to: Status) -> None:
        with self._lock:
            if to not in _LEGAL[self._status]:
                raise BadStatusError(f"illegal transition {self._status.value} -> {to.value}")
            self._status = to

    def start(self) -> "WorkersQuery":
        self._transition(Status.STARTING)
        try:
            self._query = self._start_fn()
        except BaseException as exc:
            self._failure = exc
            self._transition(Status.CLOSED_NOT_GRACEFULLY)
            raise
        self._transition(Status.STARTED)
        return self

    def shutdown(self) -> None:
        self._transition(Status.SHUTDOWN)
        self._transition(Status.CLOSING)
        try:
            if self._query is not None:
                self._query.stop()
                self._query.awaitTermination()
            self._transition(Status.CLOSED_GRACEFULLY)
        except BaseException as exc:  # noqa: BLE001
            self._failure = exc
            self._transition(Status.CLOSED_NOT_GRACEFULLY)

    def wait_for_shutdown(self, timeout_sec: float | None = None) -> bool:
        if self._query is None:
            raise BadStatusError("not started")
        try:
            if timeout_sec is None:
                self._query.awaitTermination()
                return True
            return self._query.awaitTermination(timeout_sec)
        except Exception as exc:  # query failed -> not graceful
            self._failure = exc
            with self._lock:
                self._status = Status.CLOSED_NOT_GRACEFULLY
            raise

    @property
    def failure(self) -> BaseException | None:
        return self._failure


def snapshot(query: StreamingQuery) -> dict[str, Any]:
    """Reference-metric-style snapshot from the last progress
    (WorkersMetrics sensor names -> StreamingQueryProgress fields)."""
    p = query.lastProgress
    if p is None:
        return {}
    return {
        "consumed.offsets": [s.get("endOffset") for s in p.get("sources", [])],
        "committed.offsets": [s.get("latestOffset") for s in p.get("sources", [])],
        "input.records": p.get("numInputRows"),
        "processing.rate": p.get("processedRowsPerSecond"),
        "batch.duration.ms": p.get("batchDuration"),
        "state.rows": [so.get("numRowsTotal") for so in p.get("stateOperators", [])],
    }


@dataclass
class DeadlineEvent:
    batch_id: int
    duration_ms: float
    deadline_ms: int


class BatchDeadlineListener(StreamingQueryListener):
    """A9 parity at batch granularity: record violations of the processing
    deadline; with ``stop_on_timeout`` the offending query is stopped (the
    reference shuts the whole instance down)."""

    def __init__(self, spark, deadline_ms: int = 300_000, stop_on_timeout: bool = False) -> None:
        self._spark = spark
        self.deadline_ms = deadline_ms
        self.stop_on_timeout = stop_on_timeout
        self.violations: list[DeadlineEvent] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = event.progress
        duration = progress.batchDuration
        if duration is not None and duration > self.deadline_ms:
            self.violations.append(
                DeadlineEvent(progress.batchId, duration, self.deadline_ms)
            )
            if self.stop_on_timeout:
                for q in self._spark.streams.active:
                    if str(q.id) == str(progress.id):
                        q.stop()

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
