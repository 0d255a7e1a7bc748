"""Generic accept gate: the reference's pause predicate (A3) as a
stateful operator.

Reference: ``WorkerTask.accept(record)`` peeks the sub-partition queue
head; false PAUSES the sub-partition — the head record stays queued and
every record behind it waits, preserving order
(/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/task/
WorkerTask.java:34-36; call site impl/task/WorkerThread.java:70-85).
This is flow control, not filtering: records are never dropped.

``streaming/merge.py`` is the canonical *time-based* instance (SURVEY.md
§7). This module is the general form for per-key predicates: rows buffer
per key in ``order_by`` order, and each batch (and each processing-time
punctuate) releases the longest PREFIX whose rows all pass
``accept(row, state)`` — the first rejected row blocks everything behind
it, exactly the reference's head-of-queue semantics. ``on_release``
folds released rows into the gate state (the reference pattern:
MergerTest's task updates shared timestamps as it processes); scope is
per-key state only — cross-task shared mutable state is documented out
of scope (SURVEY.md §7 risk list).

At scale: state per key is the buffered backlog — bounded by how long
the predicate stalls, the same bound as the reference's in-heap queues;
use ``on_punctuate`` to implement timeout-release policies.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafka_workers_spark.streaming.offsets import ProcessingTimeoutError


def accept_gate(
    df: DataFrame,
    keys: list[str],
    accept: Callable[[dict, dict], bool],
    output_schema: str,
    order_by: str,
    on_release: Callable[[dict, dict], dict] | None = None,
    on_punctuate: Callable[[dict], dict] | None = None,
    punctuate_interval_ms: int | None = None,
    max_buffer_age_ms: int | None = None,
) -> DataFrame:
    """Head-blocking release gate over a (streaming or batch-grouped)
    DataFrame.

    ``accept(row, state) -> bool`` decides the current head;
    ``on_release(row, state) -> state`` folds a released row into state;
    ``on_punctuate(state) -> state`` runs on processing-time timeouts
    (e.g. advance a deadline so stalled rows eventually release).
    ``output_schema`` must list the key columns first, then the remaining
    input columns in input order. Rows are JSON-buffered: values must be
    JSON-serializable primitives.

    ``max_buffer_age_ms`` is the A9 record-granular processing deadline
    for gated records: a row buffered (consumed but never released)
    longer than this raises ``ProcessingTimeoutError`` and fails the
    query with that cause — the reference's
    ``consumer.processing.timeout.ms`` watchdog semantics
    (impl/offsets/DefaultOffsetsState.java:223-256: oldest
    consumed-but-unprocessed record past the deadline kills the
    pipeline), at record granularity for exactly the rows the engine is
    holding. Pair with ``punctuate_interval_ms`` so the deadline fires
    even when no new data arrives. Batch-granular coverage for
    non-buffered paths stays with ``lifecycle.BatchDeadlineListener``.
    """
    cols = [c for c in df.columns if c not in keys]

    def _release(st: dict) -> list[dict]:
        # buffer entries are {"r": row, "t": first-seen ms} — the t drives
        # the record-granular deadline
        buf = sorted(st["buf"], key=lambda e: e["r"][order_by])
        released = []
        while buf:
            head = buf[0]["r"]
            if not accept(head, st["user"]):
                break  # head blocks: everything behind it waits
            released.append(head)
            buf.pop(0)
            if on_release is not None:
                st["user"] = on_release(head, st["user"])
        st["buf"] = buf
        return released

    def _check_deadline(st: dict) -> None:
        if max_buffer_age_ms is None or not st["buf"]:
            return
        now_ms = int(time.time() * 1000)
        oldest = min(e["t"] for e in st["buf"])
        if now_ms - oldest > max_buffer_age_ms:
            raise ProcessingTimeoutError(
                f"record buffered for {now_ms - oldest} ms "
                f"(> {max_buffer_age_ms} ms) without being released"
            )

    def _emit(key: tuple, recs: list[dict]) -> pd.DataFrame:
        data = {k: [key[i]] * len(recs) for i, k in enumerate(keys)}
        data.update({c: [r[c] for r in recs] for c in cols})
        return pd.DataFrame(data)

    def _save(st: dict, state: GroupState) -> None:
        # Drop state (and its re-armed timer) once a key is fully drained:
        # without this every key ever seen keeps a state-store row forever
        # and, with punctuate_interval_ms, fires a timeout callback every
        # interval — micro-batch duration would grow with historical key
        # count. A non-empty user state keeps the row (gates like the
        # ordered merge need their high-water marks across gaps in data).
        if not st["buf"] and not st["user"]:
            if state.exists:
                state.remove()
            return
        state.update((json.dumps(st),))
        if punctuate_interval_ms:
            state.setTimeoutDuration(punctuate_interval_ms)

    def handle(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        st = json.loads(state.get[0]) if state.exists else {"buf": [], "user": {}}
        if state.hasTimedOut:
            if on_punctuate is not None:
                st["user"] = on_punctuate(st["user"])
            released = _release(st)
            if released:
                yield _emit(key, released)
            _check_deadline(st)
            _save(st, state)
            return
        now_ms = int(time.time() * 1000)
        for pdf in pdfs:
            # to_dict keeps arbitrary column names (itertuples mangles
            # non-identifier names like "user-agent" into _N positions)
            for raw in pdf[cols].to_dict("records"):
                rec = {
                    c: (v.item() if hasattr(v, "item") else v) for c, v in raw.items()
                }
                st["buf"].append({"r": rec, "t": now_ms})
        released = _release(st)
        if released:
            yield _emit(key, released)
        _check_deadline(st)
        _save(st, state)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if punctuate_interval_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=output_schema,
        stateStructType="state STRING",
        outputMode="append",
        timeoutConf=timeout,
    )
