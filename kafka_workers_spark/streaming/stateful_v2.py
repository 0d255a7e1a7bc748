"""WorkerTask on Spark 4's ``transformWithStateInPandas`` (env-gated).

The same per-key task contract as :mod:`streaming.stateful`
(reference: /root/reference/src/main/java/com/rtbhouse/kafka/workers/api/
task/WorkerTask.java:11-70 — init/process/punctuate/close with
single-threaded per-key state), mapped onto the Spark 4 stateful API
instead of ``applyInPandasWithState``. What the new API buys:

- explicit ``init``/``close`` hooks on the processor itself (A11's shape
  without the first-state-creation proxy);
- REAL one-shot timers (``registerTimer``) instead of the single rolling
  ``setTimeoutDuration`` — punctuate and idle-expiry get independent
  timers rather than one shared clock envelope;
- typed state handles (value/list/map) with optional TTL.

ENVIRONMENT GATE: the TWS Python runner needs ``google.protobuf``, which
this container lacks — a live query crashes with
"TransformWithStateInPySpark driver worker exited unexpectedly" (the
runner's import of ``google.protobuf.descriptor`` fails). Everything
driver-side here is plain Python, so the ADAPTER semantics are fully
unit-tested against fake handles (tests/test_stateful_v2.py — the same
fake-GroupState harness style as streaming/stateful's tests), and the
live-query contract test self-activates the moment the environment gains
protobuf (``stateful_v2_available``), exactly like the Kafka broker
contract tests. Until then :func:`streaming.stateful.apply_worker_task`
remains the production surface.

Semantics parity with :mod:`streaming.stateful` (same divergences doc):

- punctuate epoch starts at key creation; first fire one interval LATER
  (PunctuatorThread.java:34-41 — no epoch-zero firing);
- with data flowing, the data path fires punctuate when the interval has
  elapsed (micro-batch-quantized, documented divergence);
- ``idle_timeout_ms`` closes the key: ``task.close`` emits final rows,
  state is cleared, no further timers — state tracks the ACTIVE key set;
- user state is a schema-free JSON dict in a ``state STRING`` envelope
  with the engine's clocks, and a pre-envelope legacy value migrates
  instead of crashing on restart.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from kafka_workers_spark.streaming.stateful import WorkerTask

try:  # the processor base class imports fine without protobuf
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    _BASE = StatefulProcessor
except Exception:  # pragma: no cover - pyspark<4 fallback
    _BASE = object


def stateful_v2_available() -> bool:
    """True when the TWS Python runner can actually start: the runner's
    state-server protocol needs ``google.protobuf`` at query runtime
    (import of the processor API alone succeeds without it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return _BASE is not object
    except Exception:
        return False


class WorkerTaskProcessor(_BASE):
    """``StatefulProcessor`` adapter for a :class:`WorkerTask`.

    One instance serves many keys (Spark serializes per-key access, the
    reference's mutual-exclusion guarantee README.md:64); all per-key
    data lives in the ``env`` value state, never on ``self`` beyond the
    handles ``init`` creates.
    """

    def __init__(
        self,
        task: WorkerTask,
        punctuate_interval_ms: int | None = None,
        order_by: list[str] | None = None,
        idle_timeout_ms: int | None = None,
    ):
        self._task = task
        self._punct_ms = punctuate_interval_ms
        self._order_by = list(order_by) if order_by else None
        self._idle_ms = idle_timeout_ms
        # same timer rule as apply_worker_task (v1 parity): punctuate's
        # interval drives the tick; idle expiry only needs its own timer
        # when no punctuation is configured
        if idle_timeout_ms and not punctuate_interval_ms:
            self._timer_ms = idle_timeout_ms
        else:
            self._timer_ms = punctuate_interval_ms

    # -- StatefulProcessor hooks ------------------------------------------

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._env = handle.getValueState("env", "state STRING")
        self._handle = handle

    def close(self) -> None:  # processor-level close; per-key close is _close_key
        pass

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        now = timerValues.getCurrentProcessingTimeInMs()
        env = self._load_env(key, now)
        parts = [p for p in rows if len(p)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            if self._order_by:
                pdf = pdf.sort_values(self._order_by)
            if self._task.process:
                out, env["u"] = self._task.process(key, pdf, env["u"])
                if out is not None and len(out):
                    yield out
            # only batches that actually carry rows reset the idle clock —
            # an all-empty-chunk invocation must not postpone
            # idle_timeout_ms key closure (it saw no data)
            env["d"] = now
        out = self._punctuate_if_due(key, env, now)
        if out is not None and len(out):
            yield out
        self._save_env(env, now)

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: "TimerValues",
        expiredTimerInfo: "ExpiredTimerInfo",
    ) -> Iterator[pd.DataFrame]:
        now = timerValues.getCurrentProcessingTimeInMs()
        env = self._load_env(key, now)
        if (
            self._idle_ms
            and env["d"] is not None
            and now - env["d"] >= self._idle_ms
        ):
            out = self._close_key(key, env)
            if out is not None and len(out):
                yield out
            return
        out = self._punctuate_if_due(key, env, now, force=True)
        if out is not None and len(out):
            yield out
        self._save_env(env, now)

    # -- envelope / policy ------------------------------------------------

    def _load_env(self, key: tuple, now: int) -> dict:
        stored = self._env.get() if self._env.exists() else None
        if stored is not None:
            env = json.loads(stored[0])
            if not (isinstance(env, dict) and {"u", "p", "d"} <= env.keys()):
                # legacy pre-envelope checkpoint: the raw value IS the
                # user dict — migrate instead of crashing; clocks restart
                env = {"u": env if isinstance(env, dict) else {}, "p": now, "d": now}
            return env
        # first sight of the key: init now, punctuate epoch starts NOW so
        # the first interval-flush fires one interval later
        return {
            "u": self._task.init(key) if self._task.init else {},
            "p": now,
            "d": None,
        }

    def _save_env(self, env: dict, now: int) -> None:
        self._env.update((json.dumps(env),))
        if self._timer_ms:
            # ROLL the timer, don't add one: registerTimer is additive
            # (one-shot absolute expiries), so arming a fresh tick per
            # batch without clearing the old ones would accumulate a
            # pending timer per batch — and every stale expiry would
            # force-fire punctuate at batch frequency instead of the
            # configured interval. Clearing first reproduces v1's rolling
            # setTimeoutDuration: the single pending timer only expires
            # after timer_ms with NO data.
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(now + self._timer_ms)

    def _punctuate_if_due(self, key, env, now, force: bool = False):
        if not self._task.punctuate or not self._punct_ms:
            return None
        last = env["p"]
        if last is None:  # very old state predating the p clock
            env["p"] = now
            return None
        if force or now - last >= self._punct_ms:
            out, env["u"] = self._task.punctuate(key, env["u"], now)
            env["p"] = now
            return out
        return None

    def _close_key(self, key, env):
        out = self._task.close(key, env["u"]) if self._task.close else None
        self._env.clear()
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        return out


def apply_worker_task_v2(
    df: DataFrame,
    keys: list[str],
    task: WorkerTask,
    output_schema: StructType | str,
    punctuate_interval_ms: int | None = None,
    order_by: list[str] | None = None,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` form of
    :func:`streaming.stateful.apply_worker_task` — same arguments, same
    output contract. Raises ``RuntimeError`` when the environment cannot
    run the TWS Python runner (see :func:`stateful_v2_available`); fall
    back to ``apply_worker_task`` there.
    """
    if not stateful_v2_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf at query "
            "runtime (its Python runner crashes without it) — use "
            "streaming.stateful.apply_worker_task in this environment"
        )
    proc = WorkerTaskProcessor(
        task,
        punctuate_interval_ms=punctuate_interval_ms,
        order_by=order_by,
        idle_timeout_ms=idle_timeout_ms,
    )
    time_mode = "ProcessingTime" if proc._timer_ms else "None"
    return df.groupBy(*keys).transformWithStateInPandas(
        proc,
        outputStructType=output_schema,
        outputMode="Append",
        timeMode=time_mode,
    )
