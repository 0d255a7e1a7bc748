"""Stateful per-key tasks with punctuation: the full ``WorkerTask`` model.

Reference: a ``WorkerTask`` instance per sub-partition with single-threaded
access to private state, ``init``/``close`` lifecycle, and processing-time
``punctuate`` callbacks
(/root/reference/src/main/java/com/rtbhouse/kafka/workers/api/task/
WorkerTask.java:11-70; punctuation impl/task/WorkerThread.java:87-102,
impl/punctuator/PunctuatorThread.java:14-47; README.md:64 mutual-exclusion
guarantee).

Spark mapping: ``applyInPandasWithState`` keyed by the sub-partition id.
(Spark 4's ``transformWithStateInPandas`` would add typed state + explicit
init/close hooks, but its dedicated Python driver worker crashes in this
container — "TransformWithStateInPySpark driver worker exited unexpectedly"
even for a trivial processor on RocksDB — so the engine stays on the
stable API, which covers the same semantics below.)
Spark gives the same per-key mutual exclusion (state callbacks for one key
are serialized) and *more* than the reference: state survives restarts via
the checkpointed state store, where the reference's task state is volatile
(README.md:64; SURVEY.md §7 risk list — tests must not assume loss).

Punctuate parity: a processing-time timeout per key. When no data arrives
for a key within ``punctuate_interval``, Spark fires the group callback
with an empty iterator and ``state.hasTimedOut`` — the engine then invokes
``WorkerTask.punctuate``. With data flowing, punctuate fires on every
batch containing the key (the reference fires every interval regardless;
batch-granularity divergence documented in SURVEY.md §7).

At 100 TB: state is partitioned by key across executors (RocksDB-backed
state store in production configs); no driver-side state, no collect.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


@dataclass
class WorkerTask:
    """Per-key task: override any of the hooks.

    - ``init(key)``: called when the key's state is first created
      (WorkerTask.java:22 init-on-assignment).
    - ``process(key, pdf, state)``: batch of this key's records (ordered by
      the caller's sort columns); returns output rows (pandas DataFrame)
      and the new state dict.
    - ``punctuate(key, state, now_ms)``: processing-time callback when the
      key timed out with no data (WorkerTask.java:59-60).
    """

    init: Callable[[tuple], dict] | None = None
    process: Callable[[tuple, pd.DataFrame, dict], tuple[pd.DataFrame, dict]] | None = None
    punctuate: Callable[[tuple, dict, int], tuple[pd.DataFrame, dict]] | None = None


def apply_worker_task(
    df: DataFrame,
    keys: list[str],
    task: WorkerTask,
    output_schema: StructType | str,
    punctuate_interval_ms: int | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Run a :class:`WorkerTask` per key group over a (streaming or batch-
    grouped) DataFrame.

    State is a plain dict serialized into a single JSON string column —
    schema-free like the reference's arbitrary task fields.
    """
    import json

    state_schema = "state STRING"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if punctuate_interval_ms
        else GroupStateTimeout.NoTimeout
    )

    def handle(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            task_state = json.loads(state.get[0])
        else:
            task_state = task.init(key) if task.init else {}

        if state.hasTimedOut:
            if task.punctuate:
                out, task_state = task.punctuate(key, task_state, state.getCurrentProcessingTimeMs())
                if out is not None and len(out):
                    yield out
            state.update((json.dumps(task_state),))
            if punctuate_interval_ms:
                state.setTimeoutDuration(punctuate_interval_ms)
            return

        for pdf in pdfs:
            if order_by:
                pdf = pdf.sort_values(order_by)
            if task.process:
                out, task_state = task.process(key, pdf, task_state)
                if out is not None and len(out):
                    yield out
        state.update((json.dumps(task_state),))
        if punctuate_interval_ms:
            state.setTimeoutDuration(punctuate_interval_ms)

    return df.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
