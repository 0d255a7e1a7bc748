"""Streaming volume-spike screen: the rolling z² anomaly test
(operators/drift.py anomaly_zscore) as a per-key WorkerTask state
machine — the fourth member of the live==batch cross-plan family
(funnel, attribution, markov), applied to the drift screens so the
"per ingest batch" diagnostic the drift module's docstring promises
actually runs ON the ingest stream.

State per key is tiny and bounded: the current OPEN bucket (index +
count) plus the trailing ``window`` CLOSED bucket counts (a ring of
ints). A bucket emits when it CLOSES — the first event of any LATER
bucket arrives (possibly in a later micro-batch: the carried state
supplies the continuation) — and the machine back-fills the silent
buckets in between with zero counts, replaying
:func:`~kafka_workers_spark.operators.relational.gap_fill`'s per-key
grid exactly. All flag arithmetic is the same pure-integer z²
predicate as the batch operator, evaluated on Python ints (arbitrary
precision — the int64 in-plan guard of the batch arm bounds the same
counts upstream).

Documented divergence, shared with the batch plan by construction:
each key's FINAL bucket never closes (there is no later event), so the
stream never emits it — and the batch entry point replays the same
rule, so live == batch holds bit-for-bit; against the relational
``anomaly_zscore`` the stream equals "all rows except each key's max
bucket" (the registered oracle composes the flat-arm SQL with exactly
that filter). Per-user ordering contract: nondecreasing (ts, tiebreak)
across micro-batches (the per-partition offset-order guarantee, as for
markov/funnel). The seasonal arm stays batch-only (a phase-sliced ring
is straightforward but nothing streams it yet).

At 100 TB: state is ``window + 2`` longs per ACTIVE key; output volume
is one row per closed grid bucket, independent of event count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_workers_spark.streaming.stateful import WorkerTask, apply_worker_task


def anomaly_worker_task(
    key_cols: list[str],
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    window: int = 24,
    min_n: int = 8,
    z_num: int = 3,
    z_den: int = 1,
) -> WorkerTask:
    """The state machine. Emits ``(key_cols..., bucket_idx, n_events,
    n_window, dev_num, var_num, is_anomaly)`` — ``bucket_idx`` is the
    floor-division epoch bucket index (a long; the query layer converts
    to a timestamp JVM-side so timezone handling stays engine-side,
    never in pandas)."""
    if window < 1:
        raise ValueError(f"window ({window}) must be >= 1")
    if min_n < 2:
        raise ValueError(f"min_n ({min_n}) must be >= 2 (variance needs 2 points)")
    if z_num < 1:
        raise ValueError(f"z_num ({z_num}) must be >= 1")
    if z_den < 1:
        raise ValueError(f"z_den ({z_den}) must be >= 1")
    step_us = bucket_seconds * 1_000_000

    def process(key, pdf, st):
        if len(pdf) == 0:
            return None, st
        cur_b = st.get("cur_b")
        cur_n = st.get("cur_n", 0)
        buf = st.get("buf", [])
        rows = []

        def close(b: int, n: int) -> None:
            nw = len(buf)
            s = sum(buf)
            q = sum(v * v for v in buf)
            dev = nw * n - s
            var = nw * q - s * s
            flag = (
                nw >= min_n
                and dev > 0
                and (var == 0 or dev * dev * z_den * z_den > z_num * z_num * var)
            )
            rows.append((*key, b, n, nw, dev, var, flag))
            buf.append(n)
            if len(buf) > window:
                del buf[: len(buf) - window]

        # epoch micros // step is a floor division in both engines (the
        # gap_fill pmod rule); pandas datetime64[ns] -> int64 ns
        for b in (pdf[ts_col].astype("int64") // 1000 // step_us).tolist():
            if cur_b is None:
                cur_b, cur_n = b, 1
            elif b == cur_b:
                cur_n += 1
            else:
                close(cur_b, cur_n)
                for g in range(cur_b + 1, b):
                    close(g, 0)  # silent buckets: absence is evidence
                cur_b, cur_n = b, 1
        out = None
        if rows:
            cols = [*key_cols, "bucket_idx", "n_events", "n_window",
                    "dev_num", "var_num", "is_anomaly"]
            out = pd.DataFrame(dict(zip(cols, map(list, zip(*rows)))))
        return out, {"cur_b": cur_b, "cur_n": cur_n, "buf": buf}

    return WorkerTask(process=process)


def _out_schema(events: DataFrame, key_cols: list[str]) -> str:
    keys = ", ".join(
        f"{c} {events.schema[c].dataType.simpleString()}" for c in key_cols
    )
    return (
        f"{keys}, bucket_idx bigint, n_events bigint, n_window bigint, "
        "dev_num bigint, var_num bigint, is_anomaly boolean"
    )


def _with_bucket_start(df: DataFrame, bucket_seconds: int) -> DataFrame:
    cols = [c for c in df.columns if c != "bucket_idx"]
    head = [c for c in cols if c not in
            ("n_events", "n_window", "dev_num", "var_num", "is_anomaly")]
    return df.select(
        *head,
        F.timestamp_seconds(F.col("bucket_idx") * bucket_seconds).alias("bucket_start"),
        "n_events", "n_window", "dev_num", "var_num", "is_anomaly",
    )


def streaming_anomaly_zscore(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    bucket_seconds: int = 3600,
    window: int = 24,
    min_n: int = 8,
    z_num: int = 3,
    z_den: int = 1,
) -> DataFrame:
    """The live screen via ``apply_worker_task``: one row per CLOSED
    grid bucket, flags computed against the carried trailing window."""
    task = anomaly_worker_task(
        key_cols, ts_col, bucket_seconds, window, min_n, z_num, z_den
    )
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    out = apply_worker_task(
        events.select(*key_cols, ts_col, *([tiebreak_col] if tiebreak_col else [])),
        key_cols,
        task,
        _out_schema(events, key_cols),
        order_by=order,
    )
    return _with_bucket_start(out, bucket_seconds)


def anomaly_tasks_batch(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    bucket_seconds: int = 3600,
    window: int = 24,
    min_n: int = 8,
    z_num: int = 3,
    z_den: int = 1,
) -> DataFrame:
    """The same task replayed over full history in one grouped-map pass
    (``applyInPandas``) — the batch entry the cross-plan oracle drives:
    equals the relational :func:`anomaly_zscore` minus each key's final
    (never-closed) bucket, bit for bit. ONE key-keyed shuffle; per-group
    work is a sort and a linear fold."""
    task = anomaly_worker_task(
        key_cols, ts_col, bucket_seconds, window, min_n, z_num, z_den
    )
    schema = _out_schema(events, key_cols)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    key_dtypes = dict(zip(key_cols, ["object"] * len(key_cols)))

    def fn(key, pdf):
        out, _ = task.process(key, pdf.sort_values(order), {})
        if out is None:
            out = pd.DataFrame(
                {
                    **{c: pd.Series(dtype=key_dtypes[c]) for c in key_cols},
                    **{c: pd.Series(dtype="int64")
                       for c in ("bucket_idx", "n_events", "n_window",
                                 "dev_num", "var_num")},
                    "is_anomaly": pd.Series(dtype=bool),
                }
            )
        return out

    grouped = (
        events.select(*key_cols, ts_col, *([tiebreak_col] if tiebreak_col else []))
        .groupBy(*key_cols)
        .applyInPandas(fn, schema)
    )
    return _with_bucket_start(grouped, bucket_seconds)
