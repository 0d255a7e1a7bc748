"""Lifecycle state machine, processing deadline, and metrics surface.

Reference:

- Status machine CREATED→STARTING→STARTED→SHUTDOWN→CLOSING→{CLOSED_GRACEFULLY,
  CLOSED_NOT_GRACEFULLY, CANNOT_STOP_THREADS, CLOSING_INTERRUPTED} with
  illegal transitions raising BadStatusException
  (/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/
  KafkaWorkers.java:55-78; impl/KafkaWorkersImpl.java:101-215).
- Graceful-vs-forced close matrix (impl/KafkaWorkersImpl.java:164-186):
  executor stops within shutdown timeout → CLOSED_GRACEFULLY; needs
  shutdownNow() but stops within a second timeout → CLOSED_NOT_GRACEFULLY;
  still alive after both → CANNOT_STOP_THREADS; the closing thread itself is
  interrupted → CLOSING_INTERRUPTED. Pinned by ShutdownTest.java:79-143.
- Processing deadline: a record unacknowledged for
  ``consumer.processing.timeout.ms`` kills the pipeline
  (impl/offsets/DefaultOffsetsState.java:223-256). Spark has batch-, not
  record-, granularity (SURVEY.md §7): the listener raises the same
  condition when a micro-batch exceeds the deadline.
- Metrics (impl/metrics/WorkersMetrics.java:36-64) → snapshot() maps the
  reference sensor names onto StreamingQueryProgress fields; sensors with
  no Spark equivalent are listed in UNMAPPED_SENSORS with the reason.

Documented divergences from the reference transition matrix:

- STARTING→CLOSED_NOT_GRACEFULLY and STARTED→CLOSED_NOT_GRACEFULLY are
  legal here: Spark queries can fail asynchronously (start() raising, or
  awaitTermination() surfacing a StreamingQueryException) without passing
  through SHUTDOWN/CLOSING; the reference instead routes every failure
  through its shutdown thread.
"""

from __future__ import annotations

import enum
import json
import threading
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener


class Status(enum.Enum):
    CREATED = "CREATED"
    STARTING = "STARTING"
    STARTED = "STARTED"
    SHUTDOWN = "SHUTDOWN"
    CLOSING = "CLOSING"
    CLOSED_GRACEFULLY = "CLOSED_GRACEFULLY"
    CLOSED_NOT_GRACEFULLY = "CLOSED_NOT_GRACEFULLY"
    CANNOT_STOP_THREADS = "CANNOT_STOP_THREADS"
    CLOSING_INTERRUPTED = "CLOSING_INTERRUPTED"

    @property
    def is_terminal(self) -> bool:
        """api/KafkaWorkers.java:67 — terminal = not a key of the
        allowed-transitions map."""
        return self not in _LEGAL or not _LEGAL[self]


class BadStatusError(RuntimeError):
    """Parity with api/KafkaWorkers.java BadStatusException."""


# api/KafkaWorkers.java:58-64 plus the two documented failure edges (see
# module docstring).
_LEGAL = {
    Status.CREATED: {Status.STARTING},
    Status.STARTING: {Status.STARTED, Status.CLOSED_NOT_GRACEFULLY},
    Status.STARTED: {Status.SHUTDOWN, Status.CLOSED_NOT_GRACEFULLY},
    Status.SHUTDOWN: {Status.CLOSING},
    Status.CLOSING: {
        Status.CLOSED_GRACEFULLY,
        Status.CLOSED_NOT_GRACEFULLY,
        Status.CANNOT_STOP_THREADS,
        Status.CLOSING_INTERRUPTED,
    },
    Status.CLOSED_GRACEFULLY: set(),
    Status.CLOSED_NOT_GRACEFULLY: set(),
    Status.CANNOT_STOP_THREADS: set(),
    Status.CLOSING_INTERRUPTED: set(),
}


class WorkersQuery:
    """A StreamingQuery wrapped in the reference's lifecycle contract.

    ``start_fn`` is a zero-arg callable returning a started
    ``StreamingQuery`` (i.e. ``lambda: df.writeStream...start()``), so the
    CREATED state genuinely precedes query startup.

    ``shutdown_timeout_sec`` mirrors ``shutdown.timeout.ms``
    (impl/KafkaWorkersImpl.java:164): ``shutdown()`` first waits that long
    for a graceful stop, then retries a forced stop for the same period,
    and only then declares CANNOT_STOP_THREADS. ``on_shutdown`` mirrors
    ``ShutdownCallback.onShutdown(exception)``
    (impl/KafkaWorkersImpl.java:214): called once with the failure cause
    (or None) when a terminal state is reached via shutdown().
    """

    def __init__(
        self,
        start_fn,
        shutdown_timeout_sec: float | None = None,
        on_shutdown: Callable[[BaseException | None], None] | None = None,
    ) -> None:
        self._start_fn = start_fn
        self._query: StreamingQuery | None = None
        self._status = Status.CREATED
        self._lock = threading.Lock()
        self._failure: BaseException | None = None
        self._shutdown_timeout_sec = shutdown_timeout_sec
        self._on_shutdown = on_shutdown

    @property
    def status(self) -> Status:
        return self._status

    @property
    def query(self) -> StreamingQuery | None:
        return self._query

    def _transition(self, to: Status) -> None:
        with self._lock:
            if to not in _LEGAL.get(self._status, set()):
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

    def shutdown(self) -> Status:
        """Reference close() matrix (impl/KafkaWorkersImpl.java:149-215).

        With no ``shutdown_timeout_sec`` the stop is assumed to complete
        (Spark's ``stop()`` + unbounded ``awaitTermination()``) →
        CLOSED_GRACEFULLY. With a timeout: graceful wait → forced re-stop +
        second wait → CANNOT_STOP_THREADS, exactly the reference's
        shutdown()/shutdownNow() ladder. KeyboardInterrupt while closing →
        CLOSING_INTERRUPTED (the reference's InterruptedException arm).
        """
        self._transition(Status.SHUTDOWN)
        self._transition(Status.CLOSING)
        terminal = Status.CLOSED_GRACEFULLY
        interrupted: KeyboardInterrupt | None = None
        try:
            if self._query is not None:
                self._query.stop()
                if self._shutdown_timeout_sec is None:
                    self._query.awaitTermination()
                elif not self._query.awaitTermination(self._shutdown_timeout_sec):
                    # forced phase: shutdownNow() analog — re-issue stop and
                    # grant one more timeout window.
                    self._query.stop()
                    if self._query.awaitTermination(self._shutdown_timeout_sec):
                        terminal = Status.CLOSED_NOT_GRACEFULLY
                    else:
                        terminal = Status.CANNOT_STOP_THREADS
        except KeyboardInterrupt as exc:
            # the reference's InterruptedException arm records the terminal
            # state; unlike Java, a Python Ctrl-C must also propagate or the
            # process keeps running — re-raised below after the callback
            terminal = Status.CLOSING_INTERRUPTED
            interrupted = exc
        except BaseException as exc:  # noqa: BLE001 — query failed while closing
            self._failure = exc
            terminal = Status.CLOSED_NOT_GRACEFULLY
        self._transition(terminal)
        if self._on_shutdown is not None:
            self._on_shutdown(self._failure)
        if interrupted is not None:
            raise interrupted
        return self._status

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
            # awaitTermination re-raises on every call: a repeat wait after a
            # recorded failure (or one racing shutdown()) must not let a
            # BadStatusError replace the real query exception — move to the
            # failure state only where that edge is legal, silently otherwise
            with self._lock:
                if Status.CLOSED_NOT_GRACEFULLY in _LEGAL.get(self._status, set()):
                    self._status = Status.CLOSED_NOT_GRACEFULLY
            raise

    @property
    def failure(self) -> BaseException | None:
        return self._failure


#: WorkersMetrics sensors with no StreamingQueryProgress equivalent, and why
#: (impl/metrics/WorkersMetrics.java:36-64). Kept importable so the parity
#: gap is inspectable instead of silent.
UNMAPPED_SENSORS: dict[str, str] = {
    "consumer-thread.input-records.serialized-size": (
        "progress reports row counts, not serialized bytes"
    ),
    "consumer-thread.poll.records.serialized-size": (
        "progress reports row counts, not serialized bytes"
    ),
    "worker-thread.accepting-offset": (
        "accept gate is re-expressed as a release rule (streaming/gate.py, "
        "streaming/merge.py); progress exposes no per-record accepting "
        "position — backlog size is visible via state.rows instead"
    ),
    "worker-thread.accepted-offset": "see worker-thread.accepting-offset",
    "offset-ranges.consumed.count": (
        "contiguous-range bookkeeping is Spark's checkpoint; the semantic "
        "model lives in streaming/offsets.py for tests"
    ),
    "offset-ranges.processed.count": "see offset-ranges.consumed.count",
}


def snapshot(query: StreamingQuery, admission: dict | None = None) -> dict[str, Any]:
    """Reference-sensor-named snapshot from the last StreamingQueryProgress.

    Keys follow impl/metrics/WorkersMetrics.java:36-64 sensor names. Offset
    semantics (per ADVICE r01): after a completed micro-batch the position
    durably committed to the checkpoint is the batch's ``endOffset`` —
    ``latestOffset`` is merely what the source has available, exposed here
    under the non-reference name ``consumer-thread.available-offset``.

    ``admission`` is an optional :func:`streaming.weigher.admission_plan`
    result; when given, the two limit gauges the reference computes from
    its heap-ratio config at startup (QueuesManager.java:59-64, exposed
    via WorkersMetrics as queues-total-size-limit / queue-size-limit) are
    reported from the same arithmetic here.
    """
    p = query.lastProgress
    if p is None:
        return {}
    sources = p.get("sources", []) or []
    state_ops = p.get("stateOperators", []) or []
    durations = p.get("durationMs", {}) or {}
    sink = p.get("sink", {}) or {}

    def _sum(vals):
        vals = [v for v in vals if v is not None]
        return sum(vals) if vals else None

    def _behind(src) -> int:
        """Positions where the source holds data beyond the batch end —
        the paused-partition analog: under admission control
        (maxOffsetsPerTrigger/maxBytesPerTrigger) these are exactly the
        partitions whose consumption the engine deferred, the condition
        the reference reports as paused (QueuesManager.java:117-143).
        Offsets come as per-partition dicts (Kafka: {topic: {part: off}}),
        flat dicts (file source: {logOffset: n}) or scalars (rate)."""
        end, latest = src.get("endOffset"), src.get("latestOffset")
        for parse in (json.loads,):
            if isinstance(end, str):
                try:
                    end = parse(end)
                except ValueError:
                    return 0
            if isinstance(latest, str):
                try:
                    latest = parse(latest)
                except ValueError:
                    return 0
        if end is None or latest is None:
            return 0
        if isinstance(end, (int, float)) and isinstance(latest, (int, float)):
            return int(latest > end)
        if isinstance(end, dict) and isinstance(latest, dict):
            n = 0
            for topic, parts in latest.items():
                if isinstance(parts, dict):
                    for part, off in parts.items():
                        e = (end.get(topic) or {}).get(part)
                        if isinstance(off, (int, float)) and (
                            not isinstance(e, (int, float)) or off > e
                        ):
                            n += 1
                elif isinstance(parts, (int, float)):
                    e = end.get(topic)
                    if not isinstance(e, (int, float)) or parts > e:
                        n += 1
            return n
        return 0

    limits: dict[str, Any] = {}
    if admission is not None:
        # the reference's startup-computed limit gauges, from the same
        # budget arithmetic (streaming/weigher.admission_plan)
        limits = {
            "queues-manager.queues-total-size-limit.bytes": admission.get(
                "queues_total_size_bytes"
            ),
            "queues-manager.queue-size-limit.bytes": admission.get(
                "queue_size_bytes_to_pause"
            ),
        }
    return limits | {
        # consumer thread (WorkersMetrics.java:37-43)
        "consumer-thread.consumed-offset": [s.get("endOffset") for s in sources],
        "consumer-thread.committed-offset": [s.get("endOffset") for s in sources],
        "consumer-thread.available-offset": [s.get("latestOffset") for s in sources],
        "consumer-thread.poll.records.count": p.get("numInputRows"),
        "consumer-thread.poll.records.count-per-sec": p.get("inputRowsPerSecond"),
        # paused-partition analog: partitions with available-but-deferred
        # data (admission control), 0 when the batch drained the source
        "consumer-thread.paused-partitions": _sum(_behind(s) for s in sources),
        # worker thread (WorkersMetrics.java:45-51)
        "worker-thread.processing-offset": [s.get("startOffset") for s in sources],
        "worker-thread.processed-offset": [s.get("endOffset") for s in sources],
        "worker-thread.processing-timestamp": p.get("timestamp"),
        "worker-thread.processed-records-per-sec": p.get("processedRowsPerSecond"),
        # queues manager (WorkersMetrics.java:53-55) — state store is the
        # buffered-work analog
        "queues-manager.queues-total-size.bytes": _sum(
            so.get("memoryUsedBytes") for so in state_ops
        ),
        # worker-threads group (WorkersMetrics.java:57-59)
        "worker-threads.task-count": len(state_ops),
        # offsets state (WorkersMetrics.java:61-64)
        "offsets.consumed.count": p.get("numInputRows"),
        "offsets.processed.count": sink.get("numOutputRows"),
        "offsets-state.topic-partition-metric-info.compute-time": durations.get(
            "triggerExecution"
        ),
        # batch granularity extras (used by BatchDeadlineListener)
        "batch.id": p.get("batchId"),
        "batch.duration.ms": p.get("batchDuration"),
        "state.rows": [so.get("numRowsTotal") for so in state_ops],
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
